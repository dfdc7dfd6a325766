"""Reconstruction / animation evaluation protocols."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eamm_tpu.infer.animate import reconstruction, animate
from eamm_tpu.data import PairedDataset
from tests.test_train_steps import small_models

KEY = jax.random.PRNGKey(0)


class _SyntheticDataset:
    """Minimal dataset yielding fixed random windows."""

    def __init__(self, n=3, t=4, hw=256):
        rng = np.random.RandomState(0)
        self.samples = [{
            "example_image": rng.rand(hw, hw, 3).astype(np.float32),
            "driving": rng.rand(t, hw, hw, 3).astype(np.float32),
        } for _ in range(n)]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


@pytest.fixture(scope="module")
def setup():
    models = small_models()
    src = jnp.zeros((1, 256, 256, 3))
    kp0 = {"value": jnp.zeros((1, 10, 2)),
           "jacobian": jnp.broadcast_to(jnp.eye(2), (1, 10, 2, 2))}
    variables = {
        "kp_detector": models["kp_detector"].init(KEY, src),
        "generator": models["generator"].init(KEY, src, kp0, kp0),
    }
    return models, variables


def test_reconstruction(setup):
    models, variables = setup
    out = reconstruction(models, variables, _SyntheticDataset(n=2), 2)
    assert out["videos"] == 2
    assert np.isfinite(out["reconstruction_l1"])


def test_animate(setup):
    models, variables = setup
    pairs = PairedDataset(_SyntheticDataset(n=2), number_of_pairs=2)
    clips = animate(models, variables, pairs, relative=True)
    assert len(clips) == 2
    assert clips[0].shape == (4, 256, 256, 3)
    assert np.isfinite(clips[0]).all()
