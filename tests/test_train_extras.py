"""Discriminator LSGAN step, equivariance losses, TPS transform math, and
profiling utilities."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from eamm_tpu.models import MultiScaleDiscriminator, KPDetector
from eamm_tpu.train.steps import make_discriminator_step, equivariance_losses
from eamm_tpu.train import make_optimizer
from eamm_tpu.ops import tps as T
from eamm_tpu.utils import StepTimer, device_memory_stats

KEY = jax.random.PRNGKey(0)


def test_tps_warp_matches_torch_formula():
    rng = np.random.RandomState(0)
    params = T.sample_tps(KEY, 2, 0.05, 0.005, 5)
    coords = jnp.asarray(rng.uniform(-1, 1, (2, 7, 2)), jnp.float32)
    ours = np.asarray(T.warp_coordinates(params, coords))

    theta = torch.from_numpy(np.asarray(params.theta)).unsqueeze(1)
    tc = torch.from_numpy(np.asarray(coords))
    transformed = (torch.matmul(theta[:, :, :, :2], tc.unsqueeze(-1))
                   + theta[:, :, :, 2:]).squeeze(-1)
    cp = torch.from_numpy(np.asarray(params.control_points)).view(1, 1, -1, 2)
    cparams = torch.from_numpy(np.asarray(params.control_params))
    dist = torch.abs(tc.view(2, -1, 1, 2) - cp).sum(-1)
    result = dist ** 2 * torch.log(dist + 1e-6) * cparams
    transformed = transformed + result.sum(2).view(2, -1, 1)
    np.testing.assert_allclose(ours, transformed.numpy(), atol=1e-5)


def test_tps_jacobian_is_dwarp_dz():
    params = T.sample_tps(KEY, 1, 0.05, 0.005, 5)
    pt = jnp.asarray([[[0.1, -0.2]]], jnp.float32)
    jac = np.asarray(T.warp_jacobian(params, pt))[0, 0]
    # finite differences
    eps = 1e-3
    for axis in range(2):
        d = jnp.zeros((1, 1, 2)).at[0, 0, axis].set(eps)
        fd = (np.asarray(T.warp_coordinates(params, pt + d))
              - np.asarray(T.warp_coordinates(params, pt - d)))[0, 0] / (2 * eps)
        np.testing.assert_allclose(jac[:, axis], fd, atol=1e-3)


def test_transform_frame_runs():
    params = T.sample_tps(KEY, 2, 0.05, 0.005, 5)
    frames = jax.random.uniform(KEY, (2, 64, 64, 3))
    out = T.transform_frame(params, frames)
    assert out.shape == frames.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_discriminator_step():
    disc = MultiScaleDiscriminator(scales=(1,), block_expansion=16,
                                   max_features=64, num_blocks=4, sn=True)
    models = {"discriminator": disc}
    tp = {"loss_weights": {"discriminator_gan": 1.0}}
    opt = make_optimizer(lr=1e-4)
    pyr = {"prediction_1": jax.random.uniform(KEY, (2, 256, 256, 3))}
    variables = disc.init(KEY, pyr)
    opt_state = opt.init(variables["params"])
    step = jax.jit(make_discriminator_step(models, tp, opt))
    batch = {"driving": jax.random.uniform(KEY, (2, 2, 256, 256, 3))}
    generated = {"prediction": jax.random.uniform(KEY, (2, 256, 256, 3)),
                 "kp_driving": {"value": jnp.zeros((2, 10, 2))}}
    p, s, o, metrics = step(variables["params"], variables["batch_stats"],
                            opt_state, batch, generated)
    assert np.isfinite(float(metrics["disc_gan"]))


def test_equivariance_losses():
    kp = KPDetector(num_kp=10, block_expansion=16, max_features=64,
                    num_blocks=5)
    frames = jax.random.uniform(KEY, (2, 256, 256, 3))
    variables = kp.init(KEY, frames, train=True)
    kp_driving = kp.apply(variables, frames, train=True)
    out = equivariance_losses(
        {"kp_detector": kp}, variables["params"], variables["batch_stats"],
        frames, kp_driving, KEY,
        {"sigma_affine": 0.05, "sigma_tps": 0.005, "points_tps": 5},
        value_weight=10.0, jacobian_weight=10.0)
    assert np.isfinite(float(out["equivariance_value"]))
    assert np.isfinite(float(out["equivariance_jacobian"]))


def test_step_timer():
    t = StepTimer(warmup=0)
    for _ in range(3):
        t.tick()
    s = t.summary()
    assert s["steps"] == 2 and s["mean_ms"] >= 0


def test_device_memory_stats():
    stats = device_memory_stats()
    assert len(stats) >= 1 and "device" in stats[0]


def test_module_optimizer_routing():
    """Per-module lrs route independently (ref:train.py:136-163 keeps
    separate generator/audio optimizers in fine-tune)."""
    import jax.numpy as jnp
    import optax
    from eamm_tpu.train.optim import make_module_optimizer

    params = {"generator": {"w": jnp.ones(3)},
              "audio_feature": {"w": jnp.ones(3)},
              "kp_detector_a": {"w": jnp.ones(3)}}
    opt = make_module_optimizer({"generator": 0.0, "audio_feature": 1e-1},
                                default_lr=1e-3)
    st = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    up, st = opt.update(grads, st, params)
    new = optax.apply_updates(params, up)
    assert float(jnp.abs(new["generator"]["w"] - 1).max()) == 0.0
    assert abs(float(new["audio_feature"]["w"][0]) - 0.9) < 1e-4
    assert abs(float(new["kp_detector_a"]["w"][0]) - 0.999) < 1e-4


def test_finetune_zero_generator_lr_freezes_generator():
    from tests.test_train_steps import small_models, part1_batch
    from eamm_tpu.models.vgg import Vgg19
    from eamm_tpu.train import make_part1_step, init_part1_state
    from eamm_tpu.train.optim import make_module_optimizer
    import jax.numpy as jnp

    models = small_models()
    models["vgg"] = Vgg19()
    rng = jax.random.PRNGKey(0)
    batch = jax.tree.map(jnp.asarray, part1_batch(3))
    vgg_params = models["vgg"].init(rng, jnp.zeros((1, 64, 64, 3)))["params"]
    opt = make_module_optimizer({"generator": 0.0, "audio_feature": 2e-4,
                                 "kp_detector_a": 2e-4})
    tp = {"loss_weights": {"audio": 10, "perceptual": [1, 0, 0, 0, 0],
                           "generator_gan": 0},
          "generator": "audio", "scales": [0.25]}
    state = init_part1_state(rng, models, batch, opt, train_generator=True,
                             vgg_params=vgg_params)
    gen_before = jax.tree.leaves(state.trainable["generator"])[0].copy()
    audio_before = jax.tree.leaves(state.trainable["audio_feature"])[0].copy()
    step = jax.jit(make_part1_step(models, tp, opt))
    state, m = step(state, batch)
    assert np.allclose(jax.tree.leaves(state.trainable["generator"])[0],
                       gen_before)
    assert not np.allclose(
        jax.tree.leaves(state.trainable["audio_feature"])[0], audio_before)


def test_tb_event_writer_roundtrip(tmp_path):
    """Native TensorBoard event files: known-answer CRC32C, TFRecord
    framing, and scalar round-trip through the independent parser."""
    from eamm_tpu.train.tbevents import EventWriter, read_events, crc32c

    # RFC 3720 check value for the Castagnoli polynomial
    assert crc32c(b"123456789") == 0xE3069283

    w = EventWriter(str(tmp_path))
    w.add_scalars(1, {"loss": 2.5, "audio": 0.125}, prefix="train")
    w.add_scalars(2, {"loss": 1.75}, prefix="train")
    w.close()

    events = read_events(w.path)
    assert events[0] == (1, {"train/loss": 2.5, "train/audio": 0.125})
    assert events[1] == (2, {"train/loss": 1.75})


def test_metrics_logger_writes_events(tmp_path):
    from eamm_tpu.train.logging import MetricsLogger
    from eamm_tpu.train.tbevents import read_events
    import glob
    ml = MetricsLogger(str(tmp_path))
    ml.write_scalars(7, {"total": 3.0})
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    assert read_events(files[0]) == [(7, {"train/total": 3.0})]
