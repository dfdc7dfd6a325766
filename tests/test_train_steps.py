"""Training-step tests on a virtual CPU mesh.

Covers what the reference never had (SURVEY.md §4): the train step runs
sharded over multiple devices, loss decreases, and the sharded result
matches the single-device result (i.e. batch-stat/grad reductions are
global — the SyncBN-equivalence property).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eamm_tpu.models import (KPDetector, KPDetectorA, OcclusionAwareGenerator,
                             ATNet, EmotionK)
from eamm_tpu.parallel import make_mesh, host_cpu_mesh, shard_batch, replicated
from eamm_tpu.train import (make_optimizer, make_part1_step, init_part1_state,
                            make_part2_step, init_part2_state)

B, T = 2, 2


def small_models():
    return {
        "kp_detector": KPDetector(num_kp=10, block_expansion=32,
                                  max_features=128, num_blocks=5),
        "kp_detector_a": KPDetectorA(num_kp=10),
        "audio_feature": ATNet(),
        "generator": OcclusionAwareGenerator(
            num_down_blocks=2, num_bottleneck_blocks=1, max_features=128,
            dense_motion_params=dict(block_expansion=32, max_features=128,
                                     num_blocks=5, scale_factor=0.25)),
        "emo_detector": EmotionK(block_expansion=32, max_features=128,
                                 num_blocks=5),
    }


def part1_batch(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "example_image": rng.rand(B, 256, 256, 3).astype(np.float32),
        "driving": rng.rand(B, T, 256, 256, 3).astype(np.float32),
        "driving_audio": rng.randn(B, T, 28, 12).astype(np.float32),
        "driving_pose": rng.randn(B, T, 6).astype(np.float32),
    }


TRAIN_PARAMS = {
    "loss_weights": {"audio": 10, "emo": 10, "perceptual": [0, 0, 0, 0, 0],
                     "generator_gan": 0},
    "generator": "not",
    "scales": [1],
    "type": "linear_4",
    "classify": True,
}


@pytest.mark.smoke
def test_part1_step_smoke():
    """Smoke-tier part1 step: narrow widths, 3 optimizer steps, finite
    losses + step accounting (the learning trend and sharded equivalence
    live in the full tier below)."""
    models = {
        "kp_detector": KPDetector(num_kp=10, block_expansion=8,
                                  max_features=32, num_blocks=3),
        "kp_detector_a": KPDetectorA(num_kp=10),
        "audio_feature": ATNet(),
        "generator": OcclusionAwareGenerator(
            num_down_blocks=2, num_bottleneck_blocks=1, max_features=32,
            block_expansion=8,
            dense_motion_params=dict(block_expansion=8, max_features=32,
                                     num_blocks=3, scale_factor=0.25)),
        "emo_detector": EmotionK(block_expansion=8, max_features=32,
                                 num_blocks=3),
    }
    opt = make_optimizer(lr=1e-3)
    batch = jax.tree.map(jnp.asarray, part1_batch())
    state = init_part1_state(jax.random.PRNGKey(0), models, batch, opt)
    step = jax.jit(make_part1_step(models, TRAIN_PARAMS, opt))
    for _ in range(3):
        state, m = step(state, batch)
    assert np.isfinite(float(m["total"]))
    assert np.isfinite(float(m["loss_value"]))
    assert int(state.step) == 3


def test_part1_step_runs_and_learns():
    models = small_models()
    opt = make_optimizer(lr=1e-3)
    batch = jax.tree.map(jnp.asarray, part1_batch())
    state = init_part1_state(jax.random.PRNGKey(0), models, batch, opt)
    step = jax.jit(make_part1_step(models, TRAIN_PARAMS, opt))

    values = []
    for _ in range(14):
        state, m = step(state, batch)
        values.append(float(m["loss_value"]))
    assert np.isfinite(float(m["total"]))
    # same batch re-fed: the kp value-mimic loss must trend down
    # (mean of the last quarter below mean of the first quarter; single-step
    # comparisons are noisy through the adam warm-up transient)
    assert np.mean(values[-4:]) < np.mean(values[:4])
    assert int(state.step) == 14


def test_part1_step_sharded_matches_single_device():
    models = small_models()
    opt = make_optimizer(lr=1e-3)
    batch_host = part1_batch(1)
    batch1 = jax.tree.map(jnp.asarray, batch_host)
    state = init_part1_state(jax.random.PRNGKey(0), models, batch1, opt)
    step = make_part1_step(models, TRAIN_PARAMS, opt)

    _, m_single = jax.jit(step)(state, batch1)

    mesh = host_cpu_mesh(2)
    with mesh:
        batch2 = shard_batch(batch_host, mesh)
        state_r = jax.device_put(state, replicated(mesh))
        _, m_sharded = jax.jit(step)(state_r, batch2)

    for k in m_single:
        np.testing.assert_allclose(float(m_sharded[k]), float(m_single[k]),
                                   rtol=2e-3, atol=1e-5, err_msg=k)


def test_part2_step_runs_and_learns():
    models = small_models()
    opt = make_optimizer(lr=1e-3)
    rng = np.random.RandomState(2)
    batch = jax.tree.map(jnp.asarray, {
        **part1_batch(2),
        "transformed_driving": rng.rand(B, T, 256, 256, 3).astype(np.float32),
        "emotion": rng.randint(0, 8, size=(B,)).astype(np.int32),
    })
    state = init_part2_state(jax.random.PRNGKey(1), models, batch, opt)
    step = jax.jit(make_part2_step(models, TRAIN_PARAMS, opt))
    values = []
    for _ in range(10):
        state, m = step(state, batch)
        values.append(float(m["total"]))
    assert np.isfinite(float(m["total"]))
    assert np.mean(values[-3:]) < values[0]


def test_multi_step_matches_sequential():
    """K steps scanned in one program == K sequential single-step calls.

    The scanned body and the straight-line program fuse differently
    (~1e-5 reassociation), and adam amplifies that where gradients are
    near zero (the update magnitude is ~lr regardless), so the state
    comparison is bounded by a few lr; the first scanned step's metrics
    come from identical inputs and must match tightly — this pins the
    batch order and state threading of the scan."""
    from eamm_tpu.train.steps import (make_multi_step, stack_host_batches,
                                      split_stacked_metrics)
    models = small_models()
    opt = make_optimizer(lr=1e-3)
    b0, b1 = part1_batch(7), part1_batch(8)
    state0 = init_part1_state(
        jax.random.PRNGKey(2), models, jax.tree.map(jnp.asarray, b0), opt)
    step = jax.jit(make_part1_step(models, TRAIN_PARAMS, opt))

    s_seq, m0 = step(state0, jax.tree.map(jnp.asarray, b0))
    s_seq, m1 = step(s_seq, jax.tree.map(jnp.asarray, b1))

    multi = jax.jit(make_multi_step(make_part1_step(models, TRAIN_PARAMS, opt)))
    stacked = jax.tree.map(jnp.asarray, stack_host_batches([b0, b1]))
    s_multi, sm = multi(state0, stacked)

    assert int(s_multi.step) == int(s_seq.step) == 2
    ms = split_stacked_metrics(jax.device_get(sm), 2)
    m0h, m1h = jax.device_get([m0, m1])
    for k in m0h:       # identical inputs: fusion tolerance only
        np.testing.assert_allclose(ms[0][k], m0h[k], rtol=2e-3, atol=1e-5)
    for k in m1h:       # second step sees ~1e-5-divergent params
        np.testing.assert_allclose(ms[1][k], m1h[k], rtol=2e-2, atol=1e-3)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=0, atol=5e-3),
        s_seq.trainable, s_multi.trainable)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=0, atol=5e-3),
        s_seq.batch_stats, s_multi.batch_stats)


def test_grad_accum_matches_mean_gradient():
    """grad_accum=2: one accumulated step == one optimizer update from the
    MEAN of the two micro-batch gradients with BN stats carried through
    (the exact semantics _accum_grads documents)."""
    import optax
    from eamm_tpu.train.steps import (_make_part1_loss, stack_host_batches,
                                      Part1State)
    models = small_models()
    opt = make_optimizer(lr=1e-3)
    b1, b2 = part1_batch(0), part1_batch(1)
    init_b = jax.tree.map(jnp.asarray, b1)
    state = init_part1_state(jax.random.PRNGKey(0), models, init_b, opt)

    params = dict(TRAIN_PARAMS, grad_accum=2)
    astep = jax.jit(make_part1_step(models, params, opt))
    stacked = jax.tree.map(jnp.asarray, stack_host_batches([b1, b2]))
    new_state, metrics = astep(state, stacked)
    assert np.isfinite(float(metrics["total"]))
    assert int(new_state.step) == 1          # ONE optimizer step

    # manual composition: grads of each micro-batch (stats carried), mean,
    # one optax update
    loss_fn = _make_part1_loss(models, TRAIN_PARAMS)
    g1, (_, stats1, _) = jax.grad(loss_fn, has_aux=True)(
        state.trainable, state.frozen, state.batch_stats,
        jax.tree.map(jnp.asarray, b1))
    g2, (_, stats2, _) = jax.grad(loss_fn, has_aux=True)(
        state.trainable, state.frozen, stats1,
        jax.tree.map(jnp.asarray, b2))
    mean_g = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    updates, _ = opt.update(mean_g, state.opt_state, state.trainable)
    want = optax.apply_updates(state.trainable, updates)

    flat_a = jax.tree.leaves(new_state.trainable)
    flat_w = jax.tree.leaves(want)
    for a, w in zip(flat_a, flat_w):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   atol=5e-3, rtol=1e-3)
    # carried BN stats equal the sequential composition
    sa = jax.tree.leaves(new_state.batch_stats)
    sw = jax.tree.leaves(stats2)
    for a, w in zip(sa, sw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   atol=1e-5, rtol=1e-5)
