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
