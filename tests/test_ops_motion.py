"""Sparse-motion math vs a torch oracle of the FOMM equations
(ref:modules/dense_motion.py:47-67) and keypoint normalization
(ref:demo.py:112-132)."""
import numpy as np
import torch
import jax.numpy as jnp

from eamm_tpu.ops import sparse_motions, normalize_kp
from tests.test_ops_grid import torch_coordinate_grid
import pytest


pytestmark = pytest.mark.smoke

def _rand_kp(b, k, seed):
    rng = np.random.RandomState(seed)
    value = rng.uniform(-0.8, 0.8, size=(b, k, 2)).astype(np.float32)
    jac = (np.eye(2)[None, None] +
           0.2 * rng.randn(b, k, 2, 2)).astype(np.float32)
    return value, jac


def torch_sparse_motions(h, w, kp_d_v, kp_s_v, kp_d_j, kp_s_j):
    bs, num_kp, _ = kp_d_v.shape
    identity_grid = torch_coordinate_grid(h, w).view(1, 1, h, w, 2)
    coordinate_grid = identity_grid - torch.from_numpy(kp_d_v).view(bs, num_kp, 1, 1, 2)
    jacobian = torch.matmul(torch.from_numpy(kp_s_j),
                            torch.inverse(torch.from_numpy(kp_d_j)))
    jacobian = jacobian.unsqueeze(-3).unsqueeze(-3)
    jacobian = jacobian.repeat(1, 1, h, w, 1, 1)
    coordinate_grid = torch.matmul(jacobian, coordinate_grid.unsqueeze(-1)).squeeze(-1)
    driving_to_source = coordinate_grid + torch.from_numpy(kp_s_v).view(bs, num_kp, 1, 1, 2)
    identity_grid = identity_grid.repeat(bs, 1, 1, 1, 1)
    return torch.cat([identity_grid, driving_to_source], dim=1)


def test_sparse_motions_matches_torch():
    kp_d_v, kp_d_j = _rand_kp(2, 10, 0)
    kp_s_v, kp_s_j = _rand_kp(2, 10, 1)
    ours = np.asarray(sparse_motions((16, 16), jnp.asarray(kp_d_v),
                                     jnp.asarray(kp_s_v), jnp.asarray(kp_d_j),
                                     jnp.asarray(kp_s_j)))
    ref = torch_sparse_motions(16, 16, kp_d_v, kp_s_v, kp_d_j, kp_s_j).numpy()
    assert ours.shape == (2, 11, 16, 16, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_normalize_kp_relative():
    kp_d_v, kp_d_j = _rand_kp(1, 10, 2)
    kp_i_v, kp_i_j = _rand_kp(1, 10, 3)
    kp_s_v, kp_s_j = _rand_kp(1, 10, 4)
    scale = 1.3

    out = normalize_kp(
        {"value": jnp.asarray(kp_s_v), "jacobian": jnp.asarray(kp_s_j)},
        {"value": jnp.asarray(kp_d_v), "jacobian": jnp.asarray(kp_d_j)},
        {"value": jnp.asarray(kp_i_v), "jacobian": jnp.asarray(kp_i_j)},
        use_relative_movement=True, use_relative_jacobian=True,
        adapt_movement_scale=scale)

    ref_value = (kp_d_v - kp_i_v) * scale + kp_s_v
    ref_jac = torch.matmul(
        torch.matmul(torch.from_numpy(kp_d_j), torch.inverse(torch.from_numpy(kp_i_j))),
        torch.from_numpy(kp_s_j)).numpy()
    np.testing.assert_allclose(np.asarray(out["value"]), ref_value, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["jacobian"]), ref_jac, atol=1e-4)


def test_normalize_kp_absolute_passthrough():
    kp_d_v, kp_d_j = _rand_kp(1, 10, 5)
    out = normalize_kp({"value": None}, {"value": jnp.asarray(kp_d_v)},
                       {"value": None})
    np.testing.assert_allclose(np.asarray(out["value"]), kp_d_v)
