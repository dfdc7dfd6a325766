"""Golden tests for coordinate-grid / heatmap ops against torch references.

The torch snippets here are written from the documented semantics
(SURVEY.md §2.1) — they are the *oracle*, not the implementation.
"""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from eamm_tpu.ops import (make_coordinate_grid, kp2gaussian, gaussian2kp,
                          heatmap_softmax)


pytestmark = pytest.mark.smoke

def torch_coordinate_grid(h, w):
    x = torch.arange(w).float()
    y = torch.arange(h).float()
    x = 2 * (x / (w - 1)) - 1
    y = 2 * (y / (h - 1)) - 1
    yy = y.view(-1, 1).repeat(1, w)
    xx = x.view(1, -1).repeat(h, 1)
    return torch.cat([xx.unsqueeze(2), yy.unsqueeze(2)], 2)


@pytest.mark.parametrize("h,w", [(58, 58), (64, 64), (5, 9)])
def test_coordinate_grid(h, w):
    ours = np.asarray(make_coordinate_grid(h, w))
    ref = torch_coordinate_grid(h, w).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_kp2gaussian():
    rng = np.random.RandomState(0)
    kp = rng.uniform(-1, 1, size=(4, 10, 2)).astype(np.float32)
    ours = np.asarray(kp2gaussian(jnp.asarray(kp), (64, 64), 0.01))

    grid = torch_coordinate_grid(64, 64).view(1, 1, 64, 64, 2)
    mean = torch.from_numpy(kp).view(4, 10, 1, 1, 2)
    ref = torch.exp(-0.5 * ((grid - mean) ** 2).sum(-1) / 0.01).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gaussian2kp_softargmax():
    rng = np.random.RandomState(1)
    pred = rng.randn(4, 10, 58, 58).astype(np.float32)

    hm = heatmap_softmax(jnp.asarray(pred), 0.1)
    ours = np.asarray(gaussian2kp(hm))

    t = torch.from_numpy(pred)
    thm = torch.softmax(t.view(4, 10, -1) / 0.1, dim=2).view(4, 10, 58, 58)
    grid = torch_coordinate_grid(58, 58).view(1, 1, 58, 58, 2)
    ref = (thm.unsqueeze(-1) * grid).sum(dim=(2, 3)).numpy()

    np.testing.assert_allclose(np.asarray(hm), thm.numpy(), atol=1e-5)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gaussian2kp_of_gaussian_recovers_kp():
    # A sharp Gaussian heatmap's soft-argmax should be close to the keypoint.
    kp = jnp.asarray([[[0.25, -0.5]]])
    hm = kp2gaussian(kp, (64, 64), 0.01)
    hm = hm / jnp.sum(hm, axis=(-2, -1), keepdims=True)
    rec = gaussian2kp(hm)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(kp), atol=2e-2)
