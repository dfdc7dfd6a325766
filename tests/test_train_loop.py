"""End-to-end training orchestration test: synthetic LRW-layout dataset on
disk -> CLI-style train() for two optimizer steps -> log + scalars +
checkpoint artifacts; checkpoint restore roundtrip; visualizer grid."""
import json
import os

import numpy as np
import pytest

from eamm_tpu.train.loop import train
from eamm_tpu.train.checkpoint import CheckpointManager, state_to_tree
from eamm_tpu.train.logging import MetricsLogger, read_scalars
from eamm_tpu.train.visualizer import Visualizer, draw_kp

SMALL_CONFIG = {
    "dataset_params": {
        "name": "LRW", "root_dir": None, "frame_shape": [256, 256, 3],
        "id_sampling": False, "augmentation_params": {},
    },
    "model_params": {
        "common_params": {"num_kp": 10, "num_channels": 3,
                          "estimate_jacobian": True},
        "audio_params": {"num_kp": 10, "num_channels": 3, "num_channels_a": 3,
                         "estimate_jacobian": True},
        "kp_detector_params": {"temperature": 0.1, "block_expansion": 16,
                               "max_features": 64, "scale_factor": 0.25,
                               "num_blocks": 5},
        "generator_params": {"block_expansion": 16, "max_features": 64,
                             "num_down_blocks": 2, "num_bottleneck_blocks": 1,
                             "estimate_occlusion_map": True,
                             "dense_motion_params": {
                                 "block_expansion": 16, "max_features": 64,
                                 "num_blocks": 5, "scale_factor": 0.25}},
        "discriminator_params": {"scales": [1], "block_expansion": 16,
                                 "max_features": 64, "num_blocks": 4,
                                 "sn": True},
    },
    "train_params": {
        "jaco_net": "cnn", "generator": "not", "num_epochs": 1,
        "num_repeats": 4, "epoch_milestones": [60, 90],
        "lr_audio_feature": 2.0e-4, "batch_size": 2, "scales": [1],
        "checkpoint_freq": 1,
        "loss_weights": {"generator_gan": 0, "discriminator_gan": 0,
                         "feature_matching": [10, 10, 10, 10],
                         "perceptual": [0, 0, 0, 0, 0],
                         "equivariance_value": 0, "equivariance_jacobian": 0,
                         "audio": 10},
    },
    "visualizer_params": {"kp_size": 5, "draw_border": True,
                          "colormap": "gist_rainbow"},
}


# lrw_root fixture lives in conftest.py (shared with GAN loop test)


def test_train_loop_part1(lrw_root, tmp_path):
    cfg = json.loads(json.dumps(SMALL_CONFIG))
    cfg["dataset_params"]["root_dir"] = lrw_root
    log_dir = str(tmp_path / "log")
    state = train(cfg, "train_part1", log_dir, max_steps=2)
    assert int(state.step) == 2
    # artifacts: averaged log line + scalars + checkpoint
    assert os.path.exists(os.path.join(log_dir, "log.txt"))
    scalars = read_scalars(os.path.join(log_dir, "scalars.jsonl"))
    assert any(k.endswith("loss_value") for k in scalars)
    mgr = CheckpointManager(os.path.join(log_dir, "checkpoints"))
    assert mgr.latest_step() == 2
    restored = mgr.restore(like=state)
    assert restored is not None
    r = restored["trainable"]["kp_detector_a"]
    np.testing.assert_allclose(
        np.asarray(state.trainable["kp_detector_a"]["head"]["kp"]["bias"]),
        np.asarray(r["head"]["kp"]["bias"]))


def test_visualizer_grid():
    rng = np.random.RandomState(0)
    out = {
        "kp_source": {"value": rng.uniform(-1, 1, (1, 10, 2))},
        "kp_driving": {"value": rng.uniform(-1, 1, (1, 10, 2))},
        "prediction": rng.rand(1, 64, 64, 3),
        "deformed": rng.rand(1, 64, 64, 3),
        "occlusion_map": rng.rand(1, 16, 16, 1),
        "sparse_deformed": rng.rand(1, 11, 16, 16, 3),
        "mask": rng.rand(1, 16, 16, 11),
    }
    viz = Visualizer()
    grid = viz.visualize(rng.rand(1, 64, 64, 3), rng.rand(1, 64, 64, 3), out)
    assert grid.ndim == 3 and grid.shape[-1] == 3
    assert grid.min() >= 0 and grid.max() <= 1


def test_draw_kp_marks_pixels():
    img = np.zeros((64, 64, 3))
    out = draw_kp(img, np.array([[0.0, 0.0]]), kp_size=3)
    assert out[31, 31].max() > 0   # center dot drawn


def test_metrics_logger(tmp_path):
    lg = MetricsLogger(str(tmp_path))
    lg.log_iter({"a": 1.0, "b": 2.0})
    lg.log_iter({"a": 3.0, "b": 4.0})
    lg.write_scalars(1, {"a": 1.0})
    lg.log_epoch(0)
    text = open(lg.log_path).read()
    assert "a - 2.0" in text
    scalars = read_scalars(lg.scalar_path)
    assert "train/a" in scalars


def test_preemption_emergency_checkpoint(lrw_root, tmp_path, monkeypatch,
                                          one_dev_mesh):
    """SIGTERM/SIGINT requests an emergency checkpoint at the next step
    boundary (the reference's never-called `emergent` save path,
    ref:logger.py:44-50).  Simulated deterministically: the fake
    signal.signal invokes the train() handler at install time, as if the
    preemption signal arrived during startup — train must run exactly one
    step, checkpoint, and return."""
    import signal

    fired = []

    def fake_signal(sig, handler):
        if sig == signal.SIGTERM and callable(handler) and not fired:
            fired.append(sig)
            handler(sig, None)
        return signal.SIG_DFL

    monkeypatch.setattr(signal, "signal", fake_signal)
    cfg = json.loads(json.dumps(SMALL_CONFIG))
    cfg["dataset_params"]["root_dir"] = lrw_root
    cfg["train_params"]["num_epochs"] = 5
    log_dir = str(tmp_path / "log_preempt")
    state = train(cfg, "train_part1", log_dir, max_steps=None,
                  mesh=one_dev_mesh)
    assert fired, "train() never installed a SIGTERM handler"
    assert int(state.step) == 1
    mgr = CheckpointManager(os.path.join(log_dir, "checkpoints"))
    assert mgr.latest_step() == 1
    # buffered metrics were flushed before the emergency save
    scalars = read_scalars(os.path.join(log_dir, "scalars.jsonl"))
    assert any(k.startswith("train/") for k in scalars)


def test_train_loop_multi_step_dispatch(lrw_root, tmp_path, one_dev_mesh):
    """steps_per_dispatch=2: two optimizer steps per device program; step
    accounting, per-step scalars and the final checkpoint all line up.

    Pinned to a ONE-device mesh: this is an orchestration test (sharded
    numerics are covered by test_part1_step_sharded_matches_single_device),
    and on this single-core host a 2-device mesh makes every in-program
    all-reduce stall 20 s+ in the XLA CPU rendezvous (the two device
    threads contend for the one core); the scanned double-length program
    multiplies those stalls past XLA's hard rendezvous deadline, which
    aborts the whole pytest process mid-suite (round-3 'Fatal Python
    error: Aborted' in jax.device_get)."""
    cfg = json.loads(json.dumps(SMALL_CONFIG))
    cfg["dataset_params"]["root_dir"] = lrw_root
    cfg["train_params"]["steps_per_dispatch"] = 2
    cfg["train_params"]["log_every"] = 2
    log_dir = str(tmp_path / "log")
    state = train(cfg, "train_part1", log_dir, max_steps=4,
                  mesh=one_dev_mesh)
    assert int(state.step) == 4
    scalars = read_scalars(os.path.join(log_dir, "scalars.jsonl"))
    steps_arr, _vals = scalars["train/loss_value"]
    assert sorted(steps_arr.tolist()) == [1, 2, 3, 4]
    mgr = CheckpointManager(os.path.join(log_dir, "checkpoints"))
    assert mgr.latest_step() == 4


def test_train_loop_device_augmentation(lrw_root, tmp_path, one_dev_mesh):
    """uint8 upload + on-device flip/jitter through the full loop."""
    cfg = json.loads(json.dumps(SMALL_CONFIG))
    cfg["dataset_params"]["root_dir"] = lrw_root
    cfg["dataset_params"]["device_augmentation"] = True
    cfg["dataset_params"]["augmentation_params"] = {
        "flip_param": {"horizontal_flip": True, "time_flip": False},
        "jitter_param": {"brightness": 0.1, "contrast": 0.1,
                         "saturation": 0.1, "hue": 0.1}}
    log_dir = str(tmp_path / "log")
    state = train(cfg, "train_part1", log_dir, max_steps=2,
                  mesh=one_dev_mesh)
    assert int(state.step) == 2
    scalars = read_scalars(os.path.join(log_dir, "scalars.jsonl"))
    _, vals = scalars["train/total"]
    assert np.all(np.isfinite(vals))


def test_async_checkpoint_roundtrip(tmp_path):
    """Non-blocking saves (orbax background write) fence correctly:
    consecutive async saves + a blocking final save all restore intact."""
    mgr = CheckpointManager(str(tmp_path / "ck"))
    rng = np.random.RandomState(0)
    trees = {s: {"trainable": {"w": rng.randn(64, 64).astype(np.float32)},
                 "step": np.int64(s)} for s in (1, 2, 3)}
    mgr.save(1, trees[1], blocking=False)
    mgr.save(2, trees[2], blocking=False)     # fences save 1 at entry
    mgr.save(3, trees[3])                     # blocking final
    assert mgr.latest_step() == 3
    for s in (2, 3):
        got = mgr.restore(s, like=trees[s])
        np.testing.assert_array_equal(got["trainable"]["w"],
                                      trees[s]["trainable"]["w"])
        assert int(got["step"]) == s


def test_train_loop_grad_accum(lrw_root, tmp_path, one_dev_mesh):
    """train() with grad_accum=2: each optimizer step consumes two loader
    micro-batches; artifacts and resume stay intact."""
    cfg = json.loads(json.dumps(SMALL_CONFIG))
    cfg["dataset_params"]["root_dir"] = lrw_root
    cfg["train_params"]["grad_accum"] = 2
    log_dir = str(tmp_path / "log")
    state = train(cfg, "train_part1", log_dir, max_steps=2,
                  mesh=one_dev_mesh)
    assert int(state.step) == 2
    scalars = read_scalars(os.path.join(log_dir, "scalars.jsonl"))
    assert any(k.endswith("loss_value") for k in scalars)


def test_grad_accum_rejects_gan_and_spd(lrw_root, tmp_path):
    cfg = json.loads(json.dumps(SMALL_CONFIG))
    cfg["dataset_params"]["root_dir"] = lrw_root
    cfg["train_params"].update({"grad_accum": 2, "steps_per_dispatch": 2})
    import pytest
    with pytest.raises(ValueError, match="grad_accum"):
        train(cfg, "train_part1", str(tmp_path / "log"), max_steps=1)
