"""Fine-tune stage (generator trained with VGG perceptual pyramid on every
4th frame, ref:train.py:133-270 semantics) end-to-end on CPU."""
import numpy as np
import jax
import jax.numpy as jnp

from eamm_tpu.models.vgg import Vgg19
from eamm_tpu.train import (make_optimizer, make_part1_step, init_part1_state)
from tests.test_train_steps import small_models, part1_batch

FT_PARAMS = {
    "loss_weights": {"audio": 10, "perceptual": [0.1] * 5,
                     "generator_gan": 0},
    "generator": "audio",
    "scales": [0.25],
}


def test_finetune_step_trains_generator():
    models = small_models()
    models["vgg"] = Vgg19()
    opt = make_optimizer(lr=1e-4)
    batch = jax.tree.map(jnp.asarray, part1_batch(7))
    rng = jax.random.PRNGKey(0)
    vgg_params = models["vgg"].init(rng, jnp.zeros((1, 64, 64, 3)))["params"]
    state = init_part1_state(rng, models, batch, opt, train_generator=True,
                             vgg_params=vgg_params)
    assert "generator" in state.trainable
    step = jax.jit(make_part1_step(models, FT_PARAMS, opt))

    gen_kernel_before = np.asarray(
        state.trainable["generator"]["final"]["kernel"])
    state, m = step(state, batch)
    assert np.isfinite(float(m["total"]))
    assert float(m["perceptual"]) > 0
    gen_kernel_after = np.asarray(
        state.trainable["generator"]["final"]["kernel"])
    # the generator actually received gradients through the perceptual loss
    assert np.abs(gen_kernel_after - gen_kernel_before).max() > 0
    # generator BN stats were updated during the perceptual passes
    assert int(state.step) == 1


def test_finetune_step_bfloat16_compute():
    """Mixed-precision: compute_dtype=bfloat16 keeps master params, opt
    state and BN stats f32, produces finite f32 metrics, and the loss
    lands near the f32 step's value."""
    models = small_models()
    models["vgg"] = Vgg19()
    opt = make_optimizer(lr=1e-4)
    batch = jax.tree.map(jnp.asarray, part1_batch(7))
    rng = jax.random.PRNGKey(0)
    vgg_params = models["vgg"].init(rng, jnp.zeros((1, 64, 64, 3)))["params"]
    state = init_part1_state(rng, models, batch, opt, train_generator=True,
                             vgg_params=vgg_params)
    step32 = jax.jit(make_part1_step(models, FT_PARAMS, opt))
    step16 = jax.jit(make_part1_step(
        models, {**FT_PARAMS, "compute_dtype": "bfloat16"}, opt))

    _, m32 = step32(state, batch)
    new_state, m16 = step16(state, batch)
    assert m16["total"].dtype == jnp.float32
    assert np.isfinite(float(m16["total"]))
    # bf16 compute tracks the f32 loss to a few percent
    assert abs(float(m16["total"]) - float(m32["total"])) \
        <= 0.05 * abs(float(m32["total"])) + 1e-3
    # master state stays f32
    leaves = jax.tree.leaves(new_state.trainable) \
        + jax.tree.leaves(new_state.batch_stats) \
        + [l for l in jax.tree.leaves(new_state.opt_state)
           if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    assert all(l.dtype == jnp.float32 for l in leaves
               if jnp.issubdtype(l.dtype, jnp.floating))
    # and parameters moved
    before = np.asarray(state.trainable["generator"]["final"]["kernel"])
    after = np.asarray(new_state.trainable["generator"]["final"]["kernel"])
    assert np.abs(after - before).max() > 0
