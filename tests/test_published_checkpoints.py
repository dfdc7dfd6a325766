"""Published-weight parity gate (VERDICT r3 item 6).

Every oracle-parity test in this tree runs on random-initialized shared
weights; this module is the gate that runs the same video-level assertion
on the AUTHORS' released checkpoints when they are available.  Point
``EAMM_CHECKPOINT_DIR`` at a directory holding the reference's three
``.pth.tar`` files (the ref:demo.py:82-95 / 530-533 contract — any file
names; they are classified by their module keys):

  * the FOMM checkpoint    (keys ``generator``, ``kp_detector``)
  * the audio checkpoint   (keys ``audio_feature``, ``kp_detector_a``)
  * the emotion checkpoint (key ``emo_detector``)

then::

    EAMM_CHECKPOINT_DIR=/path/to/ckpts python -m pytest \
        tests/test_published_checkpoints.py -v

Without the env var the module skips cleanly (nothing in this image can
supply the weights).  Wiring is documented in docs/MIGRATION.md.

The torch oracles are constructed at the published training configuration
(ref:config/train_part1.yaml / train_part2.yaml sizes); a size mismatch on
``load_state_dict`` means the provided checkpoint was trained at a
different configuration — adjust the sizes below to match.
"""
import os

import numpy as np
import pytest

CKPT_DIR = os.environ.get("EAMM_CHECKPOINT_DIR")

pytestmark = pytest.mark.skipif(
    not CKPT_DIR,
    reason="EAMM_CHECKPOINT_DIR not set: published-weight parity needs the "
           "reference's three .pth.tar files (ref:demo.py:82-95); see "
           "docs/MIGRATION.md")


def _classify_checkpoints():
    """Map the directory's .pth.tar files to (fomm, audio, emo) paths by
    their top-level module keys."""
    from eamm_tpu.compat import load_torch_checkpoint
    paths = {"fomm": None, "audio": None, "emo": None}
    for name in sorted(os.listdir(CKPT_DIR)):
        if not (name.endswith(".pth.tar") or name.endswith(".pth")):
            continue
        p = os.path.join(CKPT_DIR, name)
        ckpt = load_torch_checkpoint(p)
        keys = set(ckpt)
        if {"generator", "kp_detector"} <= keys:
            paths["fomm"] = p
        elif {"audio_feature", "kp_detector_a"} <= keys:
            paths["audio"] = p
        elif "emo_detector" in keys:
            paths["emo"] = p
    missing = [k for k, v in paths.items() if v is None]
    if missing:
        pytest.fail(f"EAMM_CHECKPOINT_DIR={CKPT_DIR} is missing the "
                    f"{missing} checkpoint(s) of the ref:demo.py:82-95 "
                    f"three-file contract")
    return paths["fomm"], paths["audio"], paths["emo"]


@pytest.fixture(scope="module")
def ckpt_paths():
    return _classify_checkpoints()


def test_preflight_inventories(ckpt_paths):
    """Every module in all three files passes the key-inventory preflight."""
    from eamm_tpu.compat.preflight import check_state_dict
    for p in ckpt_paths:
        report = check_state_dict(p)
        assert report.ok, f"{p}:\n{report}"


def test_video_level_parity(ckpt_paths):
    """The north star on real weights: per-frame L1 < 1e-2 between the
    reference demo loop (torch oracles loaded with the published state
    dicts) and EammPipeline.from_torch_checkpoints, over a >=32-frame
    neutral clip."""
    import torch
    from eamm_tpu.compat import load_torch_checkpoint
    from eamm_tpu.infer import EammPipeline, PipelineOptions
    from tests.test_compat_parity import TKPDetector, TKPDetectorA, TATNet
    from tests.test_compat_generator import TGenerator, TDenseMotion
    from tests.test_e2e_parity import torch_reference_render
    from tests.test_infer_pipeline import SMALL_CONFIG

    fomm_p, audio_p, emo_p = ckpt_paths
    fomm = load_torch_checkpoint(fomm_p)
    audio = load_torch_checkpoint(audio_p)

    # published training configuration (ref:config/train_part1.yaml:22-56)
    kp = TKPDetector(be=32, max_f=1024, num_blocks=5)
    kpa = TKPDetectorA()
    at = TATNet()
    gen = TGenerator(be=64, max_f=512, bottleneck=6)
    gen.dense_motion_network = TDenseMotion(num_kp=10, be=64, max_f=1024,
                                            blocks=5)
    kp.load_state_dict({k: torch.as_tensor(v)
                        for k, v in fomm["kp_detector"].items()})
    gen.load_state_dict({k: torch.as_tensor(v)
                         for k, v in fomm["generator"].items()})
    kpa.load_state_dict({k: torch.as_tensor(v)
                         for k, v in audio["kp_detector_a"].items()})
    at.load_state_dict({k: torch.as_tensor(v)
                        for k, v in audio["audio_feature"].items()})
    oracles = tuple(m.eval() for m in (kp, kpa, at, gen))

    cfg = {
        "model_params": {
            **SMALL_CONFIG["model_params"],
            "kp_detector_params": {"temperature": 0.1, "block_expansion": 32,
                                   "max_features": 1024, "scale_factor": 0.25,
                                   "num_blocks": 5},
            "generator_params": {"block_expansion": 64, "max_features": 512,
                                 "num_down_blocks": 2,
                                 "num_bottleneck_blocks": 6,
                                 "estimate_occlusion_map": True,
                                 "dense_motion_params": {
                                     "block_expansion": 64,
                                     "max_features": 1024, "num_blocks": 5,
                                     "scale_factor": 0.25}},
        },
        "train_params": {"jaco_net": "cnn"},
    }
    pipeline = EammPipeline.from_torch_checkpoints(
        cfg, fomm_p, audio_p, emo_p,
        options=PipelineOptions(frame_chunk=8, time_bucket=32,
                                add_emo=False, smooth_pose=False))

    rng = np.random.RandomState(1)
    source = rng.rand(256, 256, 3).astype(np.float32)
    wav = (0.1 * rng.randn(int(16000 * 1.6))).astype(np.float32)
    windows = pipeline.audio_to_windows(wav)
    T = windows.shape[0]
    assert T >= 32
    pose = rng.randn(T, 6).astype(np.float32)

    ref = torch_reference_render(oracles, source, windows, pose)
    ours = pipeline.render(source, wav, np.concatenate(
        [pose[:, :6], np.zeros((T, 1), np.float32)], 1), add_emo=False)

    assert ours.shape == ref.shape
    l1 = np.abs(ours - ref).mean(axis=(1, 2, 3))
    assert l1.max() < 1e-2, l1
    assert l1.mean() < 3e-3, l1.mean()


def test_emotional_render_runs(ckpt_paths):
    """The emotion checkpoint converts and drives a finite emotional render
    (module-level oracle parity for every constructable emotion head is in
    tests/test_compat_emotion*.py; this gate proves the published weights
    compose through the fused pipeline)."""
    from eamm_tpu.infer import EammPipeline, PipelineOptions
    from tests.test_infer_pipeline import SMALL_CONFIG

    fomm_p, audio_p, emo_p = ckpt_paths
    cfg = {
        "model_params": {
            **SMALL_CONFIG["model_params"],
            "kp_detector_params": {"temperature": 0.1, "block_expansion": 32,
                                   "max_features": 1024, "scale_factor": 0.25,
                                   "num_blocks": 5},
            "generator_params": {"block_expansion": 64, "max_features": 512,
                                 "num_down_blocks": 2,
                                 "num_bottleneck_blocks": 6,
                                 "estimate_occlusion_map": True,
                                 "dense_motion_params": {
                                     "block_expansion": 64,
                                     "max_features": 1024, "num_blocks": 5,
                                     "scale_factor": 0.25}},
        },
        "train_params": {"jaco_net": "cnn"},
    }
    pipe = EammPipeline.from_torch_checkpoints(
        cfg, fomm_p, audio_p, emo_p,
        options=PipelineOptions(frame_chunk=8, time_bucket=32, add_emo=True))
    rng = np.random.RandomState(2)
    source = rng.rand(256, 256, 3).astype(np.float32)
    wav = (0.1 * rng.randn(16000)).astype(np.float32)
    T = pipe.audio_to_windows(wav).shape[0]
    pose = np.concatenate([rng.randn(T, 6), np.zeros((T, 1))],
                          1).astype(np.float32)
    emo_frames = rng.rand(8, 256, 256, 3).astype(np.float32)
    out = pipe.render(source, wav, pose, transformed_frames=emo_frames,
                      add_emo=True)
    assert out.shape[0] == T and np.isfinite(out).all()
