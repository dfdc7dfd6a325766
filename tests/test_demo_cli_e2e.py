"""Demo CLI end-to-end (the product surface): oracle torch checkpoints ->
converted pipeline -> neutral + emotional renders + file outputs, driven
through eamm_tpu.cli.demo.main with real argv."""
import os

import numpy as np
import pytest
import torch
import yaml

from tests.test_compat_parity import (TKPDetector, TKPDetectorA, TATNet,
                                      _randomize_bn_stats)
from tests.test_compat_generator import TGenerator, TDenseMotion
from tests.test_compat_emotion import TEmotionK

SMALL_MODEL_PARAMS = {
    "common_params": {"num_kp": 10, "num_channels": 3,
                      "estimate_jacobian": True},
    "audio_params": {"num_kp": 10, "num_channels": 3, "num_channels_a": 3,
                     "estimate_jacobian": True},
    "kp_detector_params": {"temperature": 0.1, "block_expansion": 32,
                           "max_features": 128, "scale_factor": 0.25,
                           "num_blocks": 5},
    "generator_params": {"block_expansion": 64, "max_features": 128,
                         "num_down_blocks": 2, "num_bottleneck_blocks": 1,
                         "estimate_occlusion_map": True,
                         "dense_motion_params": {
                             "block_expansion": 64, "max_features": 256,
                             "num_blocks": 5, "scale_factor": 0.25}},
    "discriminator_params": {"scales": [1], "block_expansion": 32,
                             "max_features": 128, "num_blocks": 4,
                             "sn": True},
    "emotion_params": {"block_expansion": 32, "max_features": 128,
                       "num_blocks": 5},
}


@pytest.fixture(scope="module")
def demo_env(tmp_path_factory):
    import imageio.v2 as imageio
    from scipy.io import wavfile
    d = tmp_path_factory.mktemp("demo")
    torch.manual_seed(11)
    kp = TKPDetector(be=32, max_f=128, num_blocks=5)
    gen = TGenerator(be=64, max_f=128, bottleneck=1)
    at = TATNet()
    kpa = TKPDetectorA()
    emo = TEmotionK(be=32, max_f=128, blocks=5)
    for m in (kp, gen, at, kpa, emo):
        _randomize_bn_stats(m)
    torch.save({"kp_detector": kp.state_dict(),
                "generator": gen.state_dict()}, str(d / "fomm.pth.tar"))
    torch.save({"audio_feature": at.state_dict(),
                "kp_detector_a": kpa.state_dict()}, str(d / "audio.pth.tar"))
    torch.save({"emo_detector": emo.state_dict()}, str(d / "emo.pth.tar"))

    rng = np.random.RandomState(0)
    imageio.imwrite(str(d / "source.png"),
                    (rng.rand(256, 256, 3) * 255).astype(np.uint8))
    wavfile.write(str(d / "speech.wav"), 16000,
                  (0.2 * np.sin(np.arange(16000) / 16) * 32767).astype(np.int16))
    np.save(str(d / "pose.npy"), rng.randn(1, 7).astype(np.float32))
    np.save(str(d / "emoclip.npy"),
            (rng.rand(6, 256, 256, 3) * 255).astype(np.uint8))
    # config: small models + mouth-mask augmentation for the emotion stream
    cfg = {"dataset_params": {"name": "MEAD", "root_dir": ".",
                              "frame_shape": [256, 256, 3],
                              "id_sampling": False,
                              "augmentation_params": {
                                  "crop_mouth_param": {
                                      "center_x": 135, "center_y": 190,
                                      "mask_width": 100, "mask_height": 60}}},
           "model_params": SMALL_MODEL_PARAMS,
           "train_params": {"jaco_net": "cnn"}}
    with open(str(d / "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    return str(d)


def test_demo_cli_full_emotional_run(demo_env):
    from eamm_tpu.cli.demo import main
    d = demo_env
    out = main([
        "--config", f"{d}/config.yaml",
        "--checkpoint", f"{d}/fomm.pth.tar",
        "--audio_checkpoint", f"{d}/audio.pth.tar",
        "--emo_checkpoint", f"{d}/emo.pth.tar",
        "--source_image", f"{d}/source.png",
        "--driving_video", f"{d}/emoclip.npy",
        "--in_file", f"{d}/speech.wav",
        "--pose_file", f"{d}/pose.npy",
        "--result_path", f"{d}/result",
        "--add_emo", "true", "--type", "linear_3", "--emotion", "happy",
        "--no_crop", "--no_align"])
    assert set(out) == {"neutral", "emotion"}
    assert out["neutral"].shape == out["emotion"].shape
    assert out["neutral"].shape[1:] == (256, 256, 3)
    # the emotion branch reaches the renderer (pixel-level magnitude with
    # random weights is small — kp composition itself is parity-tested)
    assert np.any(out["neutral"] != out["emotion"])
    produced = set(os.listdir(f"{d}/result"))
    # no mp4 backend in this image -> the native AVI muxer writes playable
    # uncompressed .avi files (PNG-dir/.npy is the last-resort fallback)
    assert {"neutral.avi", "emotion.avi", "all.avi"} <= produced \
        or {"neutral.npy", "emotion.npy", "all.npy"} <= produced \
        or {"neutral", "emotion", "all"} <= produced
    if "neutral.avi" in produced:
        head = open(f"{d}/result/neutral.avi", "rb").read(12)
        assert head[:4] == b"RIFF" and head[8:12] == b"AVI "
    if "emotion.avi" in produced:
        # the delivered emotional video carries the driving audio as a PCM
        # 'auds' stream with every input sample (ref:demo.py:427-431 — the
        # reference's ffmpeg remux; here the muxer does it natively)
        from tests.test_native import _parse_avi
        hdr, frames = _parse_avi(f"{d}/result/emotion.avi")
        assert hdr["streams"] == 2
        aud = hdr["strl"][1]
        assert aud["fcc_type"] == b"auds"
        assert aud["samples_per_sec"] == 16000
        assert aud["length"] == 16000          # the 1 s speech.wav, whole
        assert len(frames) == len(out["emotion"])
        pcm = np.frombuffer(b"".join(hdr["audio_chunks"]), np.int16)
        assert pcm.shape[0] == 16000 and np.abs(pcm).max() > 1000


def test_demo_cli_smoke(tmp_path):
    """`eamm-demo --smoke`: ONE command, zero user inputs — the checked-in
    kit (assets/demo/) + random small weights produce all three videos
    (the reference's bundled-sample-data smoke flow, ref:test/ +
    ref:demo.py:536-541)."""
    from eamm_tpu.cli.demo import main
    out = main(["--smoke", "--result_path", str(tmp_path / "result")])
    assert set(out) == {"neutral", "emotion"}
    assert out["neutral"].shape[1:] == (256, 256, 3)
    produced = set(os.listdir(str(tmp_path / "result")))
    assert any(name.startswith("neutral") for name in produced)
    assert any(name.startswith("emotion") for name in produced)
    assert any(name.startswith("all") for name in produced)
    if "emotion.avi" in produced:
        from tests.test_native import _parse_avi
        hdr, _ = _parse_avi(str(tmp_path / "result" / "emotion.avi"))
        assert hdr["streams"] == 2          # sound included
        assert hdr["strl"][1]["length"] == 32000   # the kit's 2 s wav


def test_demo_cli_fps_propagation_and_cpu(demo_env, monkeypatch):
    """neutral/emotion play at the driving video's fps, all.mp4 at 25
    (ref:demo.py:480,507,514,425); --cpu runs the pipeline on the cpu
    platform (a no-op warning if backends are already up, as in tests)."""
    import eamm_tpu.cli.demo as demo_mod
    d = demo_env

    written = {}

    real_write = demo_mod.write_video

    def spy_write(path, frames, fps=25.0, audio=None):
        written[os.path.basename(path)] = fps
        return real_write(path, frames, fps=fps, audio=audio)

    monkeypatch.setattr(demo_mod, "write_video", spy_write)
    monkeypatch.setattr(demo_mod, "video_fps",
                        lambda path, default=25.0: 30.0)

    demo_mod.main([
        "--config", f"{d}/config.yaml",
        "--checkpoint", f"{d}/fomm.pth.tar",
        "--audio_checkpoint", f"{d}/audio.pth.tar",
        "--emo_checkpoint", f"{d}/emo.pth.tar",
        "--source_image", f"{d}/source.png",
        "--driving_video", f"{d}/emoclip.npy",
        "--in_file", f"{d}/speech.wav",
        "--pose_file", f"{d}/pose.npy",
        "--result_path", f"{d}/result_fps",
        "--add_emo", "true", "--type", "linear_3", "--emotion", "happy",
        "--no_crop", "--no_align", "--cpu"])

    assert written["neutral.mp4"] == 30.0
    assert written["emotion.mp4"] == 30.0
    assert written["all.mp4"] == 25.0


def test_video_fps_fallbacks(tmp_path):
    from eamm_tpu.cli.demo import video_fps
    assert video_fps(None) == 25.0
    assert video_fps("clip.npy") == 25.0
    assert video_fps(str(tmp_path / "missing.mp4")) == 25.0


def test_serve_cli(demo_env):
    """eamm-serve end-to-end: torch checkpoints -> RenderServer -> HTTP
    /render with warm-up, driven through eamm_tpu.cli.serve.main."""
    import threading
    import urllib.request
    from eamm_tpu.cli.serve import main as serve_main
    from eamm_tpu.serve_http import encode_request, decode_response

    d = demo_env
    stop = threading.Event()
    fronts = []
    t = threading.Thread(target=serve_main, kwargs=dict(
        argv=["--config", f"{d}/config.yaml",
              "--checkpoint", f"{d}/fomm.pth.tar",
              "--audio_checkpoint", f"{d}/audio.pth.tar",
              "--emo_checkpoint", f"{d}/emo.pth.tar",
              "--host", "127.0.0.1", "--port", "0",
              "--transfer_format", "rgb", "--overlap_segments", "1",
              "--frame_chunk", "8", "--time_bucket", "16",
              "--f32", "--max_batch", "1", "--warmup_seconds", "0.2"],
        stop_event=stop, ready=fronts.append), daemon=True)
    t.start()
    try:
        deadline = 900
        while not fronts and deadline > 0:
            threading.Event().wait(0.5)
            deadline -= 0.5
            assert t.is_alive(), "serve CLI died during startup"
        front = fronts[0]
        rng = np.random.RandomState(4)
        body = encode_request(rng.rand(256, 256, 3),
                              0.1 * rng.randn(8000), rng.randn(1, 7))
        req = urllib.request.Request(front.url + "/render", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=600) as resp:
            out = decode_response(resp.read())
        frames = out["frames"]
        assert frames.dtype == np.uint8
        assert frames.ndim == 4 and frames.shape[1:] == (256, 256, 3)
        # warm-up stats were reset; this request is counted
        with urllib.request.urlopen(front.url + "/stats", timeout=60) as r:
            import json
            assert json.loads(r.read())["requests"] == 1
    finally:
        stop.set()
        t.join(timeout=120)
