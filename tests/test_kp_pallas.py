"""Correctness of the fused kp-expectation Pallas kernel vs the XLA chain.

The kernel (`ops/kp_pallas.py`) is a measured-slower reference — NOT wired
into the models (see its module docstring for the round-4 timing) — but it
must stay numerically correct so the negative result remains reproducible.
Runs in Pallas interpret mode on the CPU test platform.
"""
import numpy as np
import jax.numpy as jnp

from eamm_tpu.ops.grid import heatmap_softmax, gaussian2kp, \
    make_coordinate_grid
from eamm_tpu.ops.kp_pallas import kp_expectation_fused

TEMP = 0.1


def _xla_chain(pred, jmap):
    """The composition the models actually run (models/kp_detector.py)."""
    hm = heatmap_softmax(pred, TEMP)
    value = gaussian2kp(hm)
    weighted = hm[:, :, None] * jmap                    # [B,K,4,h,w]
    jac = jnp.sum(weighted, axis=(-2, -1))
    return value, jac.reshape(pred.shape[0], pred.shape[1], 2, 2), hm


def test_fused_matches_xla_chain():
    rng = np.random.RandomState(0)
    B, K, h, w = 3, 10, 58, 58
    pred = jnp.asarray(rng.randn(B, K, h, w).astype(np.float32))
    jmap = jnp.asarray(rng.randn(B, K, 4, h, w).astype(np.float32))

    v_ref, j_ref, hm_ref = _xla_chain(pred, jmap)
    v, j, hm = kp_expectation_fused(pred, jmap, TEMP, want_heatmap=True,
                                    interpret=True)

    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hm), np.asarray(hm_ref),
                               rtol=0, atol=1e-6)


def test_fused_row_padding_ignored():
    # B*K = 6 rows, not a multiple of the 32-row tile: padded rows must not
    # leak into real outputs, and padded COLUMNS (58*58=3364 -> 3456 lanes)
    # must contribute zero probability mass.
    rng = np.random.RandomState(1)
    B, K, h, w = 3, 2, 58, 58
    pred = jnp.asarray(rng.randn(B, K, h, w).astype(np.float32))
    jmap = jnp.asarray(rng.randn(B, K, 4, h, w).astype(np.float32))
    v_ref, j_ref, _ = _xla_chain(pred, jmap)
    v, j, _ = kp_expectation_fused(pred, jmap, TEMP, interpret=True)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_ref), atol=1e-5)
    # expectations stay inside the grid's [-1, 1] range
    assert np.all(np.abs(np.asarray(v)) <= 1.0 + 1e-6)
