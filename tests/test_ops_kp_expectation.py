"""Fused kp-expectation kernel == the unfused softmax/soft-argmax chain."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import eamm_tpu.ops.kp_expectation as kpx
from eamm_tpu.ops.grid import heatmap_softmax, gaussian2kp


def _reference(pred, jmap, temperature):
    heat = heatmap_softmax(pred, temperature)
    value = gaussian2kp(heat)
    jac = jnp.sum(heat[:, :, None] * jmap, axis=(-2, -1))
    return value, jac.reshape(*pred.shape[:2], 2, 2)


@pytest.mark.parametrize("shape", [(2, 3, 5, 7), (1, 10, 58, 58)])
def test_pallas_kernel_matches_reference(shape, monkeypatch):
    monkeypatch.setattr(kpx, "_INTERPRET", True)
    rng = np.random.RandomState(0)
    B, K, h, w = shape
    pred = jnp.asarray(rng.randn(B, K, h, w).astype(np.float32))
    jmap = jnp.asarray(rng.randn(B, K, 4, h, w).astype(np.float32))
    value, jac = kpx.kp_expectation(pred, jmap, 0.1)
    ref_v, ref_j = _reference(pred, jmap, 0.1)
    np.testing.assert_allclose(np.asarray(value), np.asarray(ref_v),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(ref_j),
                               atol=1e-5, rtol=1e-5)


def test_gradient_matches_reference():
    """custom_vjp backward (used by part1 training) equals differentiating
    the unfused chain."""
    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.randn(1, 4, 6, 6).astype(np.float32))
    jmap = jnp.asarray(rng.randn(1, 4, 4, 6, 6).astype(np.float32))

    def loss_fused(p, j):
        v, ja = kpx.kp_expectation(p, j, 0.1)
        return jnp.sum(v ** 2) + jnp.sum(jnp.sin(ja))

    def loss_ref(p, j):
        v, ja = _reference(p, j, 0.1)
        return jnp.sum(v ** 2) + jnp.sum(jnp.sin(ja))

    gp, gj = jax.grad(loss_fused, argnums=(0, 1))(pred, jmap)
    rp, rj = jax.grad(loss_ref, argnums=(0, 1))(pred, jmap)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(rp), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gj), np.asarray(rj), atol=1e-5)
