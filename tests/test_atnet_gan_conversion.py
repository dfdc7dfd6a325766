"""convert_atnet with StyleGAN2 generator keys (jaco_net='gan' checkpoints):
the converted tree must apply through ATNet(jaco_net='gan')."""
import numpy as np
import torch
import jax.numpy as jnp
import pytest

from eamm_tpu.models import ATNet
from eamm_tpu.compat import convert_atnet
from tests.test_compat_parity import TATNet, _randomize_bn_stats
from tests.test_compat_stylegan2 import TSynthesis, _oracle_state_dict


@pytest.mark.slow
def test_atnet_gan_checkpoint_roundtrip():
    torch.manual_seed(6)
    at = TATNet().eval()
    _randomize_bn_stats(at)
    sd = {k: v.numpy() for k, v in at.state_dict().items()}
    # graft a stylegan synthesis state dict under the 'generator.' prefix
    # (the vendored AT_net always constructs one, ref:modules/util.py:266)
    synth = TSynthesis(size=64).eval()
    for k, v in _oracle_state_dict(synth).items():
        sd[f"generator.{k}"] = v

    variables = convert_atnet(sd)
    assert "generator" in variables["params"]

    model = ATNet(jaco_net="gan")
    img = jnp.zeros((1, 256, 256, 3))
    audio = jnp.zeros((1, 2, 28, 12))
    pose = jnp.zeros((1, 2, 6))
    out = model.apply(variables, img, audio, pose)
    assert out.shape == (1, 2, 64, 64, 35)
    assert bool(jnp.all(jnp.isfinite(out)))
