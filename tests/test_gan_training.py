"""Adversarial fine-tuning: generator step with LSGAN + feature matching
against a frozen discriminator, alternated with the discriminator step —
the reference's GeneratorFullModel/DiscriminatorFullModel contract
(ref:modules/model.py:505-524,557-591) with non-zero GAN weights."""
import numpy as np
import jax
import jax.numpy as jnp

from eamm_tpu.models import MultiScaleDiscriminator
from eamm_tpu.models.vgg import Vgg19
from eamm_tpu.train import (make_optimizer, make_part1_step, init_part1_state,
                            make_discriminator_step)
from tests.test_train_steps import small_models, part1_batch

GAN_PARAMS = {
    "loss_weights": {"audio": 10, "perceptual": [0.1] * 5,
                     "generator_gan": 1.0, "discriminator_gan": 1.0,
                     "feature_matching": [10, 10, 10, 10]},
    "generator": "audio",
    "scales": [0.25],
}


def test_gan_alternation():
    models = small_models()
    models["vgg"] = Vgg19()
    models["discriminator"] = MultiScaleDiscriminator(
        scales=(0.25,), block_expansion=16, max_features=64, num_blocks=4,
        sn=True)
    rng = jax.random.PRNGKey(0)
    batch = jax.tree.map(jnp.asarray, part1_batch(9))

    disc_pyr = {"prediction_0.25": jnp.zeros((2, 64, 64, 3))}
    disc_vars = models["discriminator"].init(rng, disc_pyr)
    vgg_params = models["vgg"].init(rng, jnp.zeros((1, 64, 64, 3)))["params"]

    g_opt = make_optimizer(lr=1e-4)
    d_opt = make_optimizer(lr=1e-4)
    state = init_part1_state(rng, models, batch, g_opt, train_generator=True,
                             vgg_params=vgg_params,
                             discriminator_vars=disc_vars)
    g_step = jax.jit(make_part1_step(models, GAN_PARAMS, g_opt))
    d_step = jax.jit(make_discriminator_step(models, GAN_PARAMS, d_opt))

    d_params = disc_vars["params"]
    d_stats = disc_vars["batch_stats"]
    d_opt_state = d_opt.init(d_params)

    # forward for the discriminator's 'generated' input
    @jax.jit
    def gen_forward(state, batch):
        params = {**state.frozen, **state.trainable}
        kp_s = models["kp_detector"].apply(
            {"params": params["kp_detector"],
             "batch_stats": state.batch_stats["kp_detector"]},
            batch["example_image"], train=True)
        out = models["generator"].apply(
            {"params": params["generator"],
             "batch_stats": state.batch_stats["generator"]},
            batch["example_image"],
            {k: v for k, v in kp_s.items() if k != "heatmap"},
            {k: v for k, v in kp_s.items() if k != "heatmap"}, train=True)
        return {"prediction": out["prediction"],
                "kp_driving": {k: v for k, v in kp_s.items()
                               if k != "heatmap"}}

    for _ in range(2):
        state, g_metrics = g_step(state, batch)
        generated = gen_forward(state, batch)
        d_params, d_stats, d_opt_state, d_metrics = d_step(
            d_params, d_stats, d_opt_state, batch, generated)
        # generator's view of the discriminator refreshes each round
        state = state._replace(
            frozen={**state.frozen, "discriminator": d_params},
            batch_stats={**state.batch_stats, "discriminator": d_stats})

    assert np.isfinite(float(g_metrics["total"]))
    assert float(g_metrics["gen_gan"]) > 0
    assert float(g_metrics["feature_matching"]) > 0
    assert np.isfinite(float(d_metrics["disc_gan"]))
