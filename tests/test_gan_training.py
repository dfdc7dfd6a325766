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


def test_gan_finetune_loop(lrw_root, tmp_path, one_dev_mesh):
    """VERDICT r1 item 2: GAN fine-tune wired end-to-end through train() —
    discriminator state + optimizer alternate each iteration, disc scalars
    logged, disc state checkpointed and restorable
    (ref:train.py:136-152,175-185)."""
    import json as _json
    import os
    from eamm_tpu.train.loop import train
    from eamm_tpu.train.checkpoint import CheckpointManager
    from eamm_tpu.train.logging import read_scalars
    from eamm_tpu.train.steps import Part1GanState
    from tests.test_train_loop import SMALL_CONFIG

    cfg = _json.loads(_json.dumps(SMALL_CONFIG))
    cfg["dataset_params"]["root_dir"] = lrw_root
    tp = cfg["train_params"]
    tp["generator"] = "audio"
    tp["scales"] = [0.25]             # perceptual/GAN pyramid at 64^2
    cfg["model_params"]["discriminator_params"]["scales"] = [0.25]
    tp["loss_weights"].update({"generator_gan": 1.0,
                               "discriminator_gan": 1.0,
                               "perceptual": [1, 0, 0, 0, 0],
                               "feature_matching": [10, 10, 10, 10]})
    log_dir = str(tmp_path / "gan_log")
    state = train(cfg, "train_part1_fine_tune", log_dir, max_steps=3,
                  mesh=one_dev_mesh)
    assert isinstance(state, Part1GanState)
    assert int(state.step) == 3
    assert "generator" in state.trainable

    scalars = read_scalars(os.path.join(log_dir, "scalars.jsonl"))
    gan_keys = [k for k in scalars if k.endswith("gen_gan")]
    disc_keys = [k for k in scalars if k.endswith("disc_gan")]
    assert gan_keys and disc_keys
    for k in gan_keys + disc_keys:
        assert np.all(np.isfinite(scalars[k][1]))

    # resume roundtrip: disc params + disc opt state survive the checkpoint
    mgr = CheckpointManager(os.path.join(log_dir, "checkpoints"))
    restored = mgr.restore(like=state)
    assert restored is not None
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state.disc_params)[0]),
        np.asarray(jax.tree.leaves(restored["disc_params"])[0]))
    roundtrip = Part1GanState(**restored)
    assert int(roundtrip.step) == int(state.step)
