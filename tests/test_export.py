"""Serialized render artifacts (jax.export): roundtrip, bucketing, errors.

The artifact freezes the batched render program + weights into one file;
loading needs no model code.  The frozen program must reproduce the live
pipeline bit-for-bit (same XLA program, same platform).
"""
import dataclasses

import numpy as np
import pytest

from eamm_tpu.infer import (EammPipeline, PipelineOptions,
                            RenderArtifact, export_render_artifact)

TINY_CONFIG = {
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
    "train_params": {"jaco_net": "cnn"},
}


@pytest.fixture(scope="module")
def pipeline():
    return EammPipeline.from_random(
        TINY_CONFIG, options=PipelineOptions(frame_chunk=8, time_bucket=8,
                                             add_emo=False))


@pytest.fixture(scope="module")
def artifact_path(pipeline, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("export") / "model.eammx")
    meta = export_render_artifact(pipeline, path, batch=1,
                                  frame_buckets=(8, 16))
    assert meta["frame_buckets"] == [8, 16]
    return path


def test_artifact_roundtrip_bitexact(pipeline, artifact_path):
    art = RenderArtifact.load(artifact_path)
    rng = np.random.RandomState(0)
    src = rng.rand(1, 256, 256, 3).astype(np.float32)
    win = rng.randn(1, 8, 28, 12).astype(np.float32)
    pos = rng.randn(1, 8, 6).astype(np.float32)
    out, t = art.render(src, win, pos)
    assert t == 8
    live = np.asarray(pipeline._batch_render(pipeline.vars, src, win, pos))
    np.testing.assert_array_equal(np.asarray(out), live)


def test_artifact_bucket_padding(artifact_path):
    """A 12-frame clip rides the 16 bucket; caller trims with t."""
    art = RenderArtifact.load(artifact_path)
    rng = np.random.RandomState(1)
    src = rng.rand(1, 256, 256, 3).astype(np.float32)
    win = rng.randn(1, 12, 28, 12).astype(np.float32)
    pos = rng.randn(1, 12, 6).astype(np.float32)
    out, t = art.render(src, win, pos)
    assert t == 12 and np.asarray(out).shape[1] == 16
    assert art.bucket_for(3) == 8
    with pytest.raises(ValueError, match="largest exported bucket"):
        art.bucket_for(17)


def test_artifact_render_uint8_matches_pipeline(pipeline, artifact_path):
    """Full convenience path (waveform in, delivered frames out) matches
    the live pipeline: causal kp scan + per-frame decode make delivered
    frames independent of padding length."""
    art = RenderArtifact.load(artifact_path)
    rng = np.random.RandomState(2)
    src = rng.rand(1, 256, 256, 3).astype(np.float32)
    wav = [(0.1 * rng.randn(4000)).astype(np.float32)]
    pose = [rng.randn(1, 7).astype(np.float32)]
    got = art.render_uint8(src, wav, pose)
    want = pipeline.render_batch_uint8(src, wav, pose)
    np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def emo_artifact_path(pipeline, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("export") / "emo.eammx")
    meta = export_render_artifact(pipeline, path, batch=1,
                                  frame_buckets=(8,), emotional=True,
                                  emo_frame_buckets=(4,))
    assert meta["emotional"]["emo_frame_buckets"] == [4]
    return path


def test_emotional_export_bitexact(pipeline, emo_artifact_path):
    """U_real == U bucket: the frozen emotional program is bitwise equal to
    the live add_emo render (identical shapes, identical XLA math)."""
    art = RenderArtifact.load(emo_artifact_path)
    rng = np.random.RandomState(4)
    src = rng.rand(256, 256, 3).astype(np.float32)
    wav = (0.1 * rng.randn(4000)).astype(np.float32)
    pose = rng.randn(1, 7).astype(np.float32)
    emo = rng.rand(4, 256, 256, 3).astype(np.float32)
    got = art.render_emotional_uint8(src, wav, pose, emo)
    want = pipeline.render_uint8(src, wav, pose, transformed_video=emo,
                                 add_emo=True)
    np.testing.assert_array_equal(got, want)


def test_emotional_export_padded_emo_bucket(pipeline, emo_artifact_path):
    """U_real < U bucket: padding rows are never gathered, so the result
    matches the live render (trunk batch padding may wobble conv numerics
    by <= 1 uint8 step on a handful of pixels)."""
    art = RenderArtifact.load(emo_artifact_path)
    rng = np.random.RandomState(5)
    src = rng.rand(256, 256, 3).astype(np.float32)
    wav = (0.1 * rng.randn(4000)).astype(np.float32)
    pose = rng.randn(1, 7).astype(np.float32)
    emo = rng.rand(3, 256, 256, 3).astype(np.float32)
    got = art.render_emotional_uint8(src, wav, pose, emo)
    want = pipeline.render_uint8(src, wav, pose, transformed_video=emo,
                                 add_emo=True)
    assert got.shape == want.shape
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1 and (diff != 0).mean() < 1e-3


def test_yuv420_emotional_artifact_matches_live(pipeline, tmp_path):
    """yuv420 artifacts trace the emotional program with the live lossy
    path's PACKED yuv420 emotion-frame upload (12 bpp — half the uint8-RGB
    host->device bytes): the frozen render is bitwise equal to the live
    render_yuv420(add_emo)."""
    yuv_pipe = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=8,
                                transfer_format="yuv420"))
    path = str(tmp_path / "yuv.eammx")
    meta = export_render_artifact(yuv_pipe, path, batch=1,
                                  frame_buckets=(8,), emotional=True,
                                  emo_frame_buckets=(4,))
    assert meta["emotional"]["frames_dtype"] == "yuv420"
    art = RenderArtifact.load(path)
    rng = np.random.RandomState(9)
    src = rng.rand(256, 256, 3).astype(np.float32)
    wav = (0.1 * rng.randn(4000)).astype(np.float32)
    pose = rng.randn(1, 7).astype(np.float32)
    emo = rng.rand(4, 256, 256, 3).astype(np.float32)
    gy, gu, gv = art.render_emotional_yuv420(src, wav, pose, emo)
    wy, wu, wv = yuv_pipe.render_yuv420(src, wav, pose,
                                        transformed_video=emo, add_emo=True)
    np.testing.assert_array_equal(gy, wy)
    np.testing.assert_array_equal(gu, wu)
    np.testing.assert_array_equal(gv, wv)


@pytest.fixture(scope="module")
def stream_artifact_path(pipeline, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("export") / "stream.eammx")
    meta = export_render_artifact(pipeline, path, batch=1,
                                  frame_buckets=(16,), emotional=True,
                                  emo_frame_buckets=(4,), stream_segments=2)
    assert meta["streaming"]["segments"] == 2
    return path


def test_stream_artifact_matches_whole_clip(pipeline, stream_artifact_path):
    """Frozen streaming: in-order segments whose concatenation is bitwise
    equal to the live whole-clip render (the segment program runs the
    identical chunk decodes in the identical order)."""
    art = RenderArtifact.load(stream_artifact_path)
    rng = np.random.RandomState(10)
    src = rng.rand(256, 256, 3).astype(np.float32)
    wav = (0.1 * rng.randn(7000)).astype(np.float32)   # ~11 frames
    pose = rng.randn(1, 7).astype(np.float32)
    segs = list(art.render_stream(src, wav, pose))
    assert len(segs) == 2 and segs[0][0] == 0 and segs[1][0] == 8
    got = np.concatenate([p for _, p in segs], axis=0)
    want = pipeline.render_uint8(src, wav, pose, add_emo=False)
    np.testing.assert_array_equal(got, want)


def test_stream_artifact_emotional(pipeline, stream_artifact_path):
    """Emotional streaming from the frozen kp_emo + segment programs."""
    art = RenderArtifact.load(stream_artifact_path)
    rng = np.random.RandomState(11)
    src = rng.rand(256, 256, 3).astype(np.float32)
    wav = (0.1 * rng.randn(7000)).astype(np.float32)
    pose = rng.randn(1, 7).astype(np.float32)
    emo = rng.rand(4, 256, 256, 3).astype(np.float32)
    segs = list(art.render_stream(src, wav, pose, emotion_frames=emo))
    assert len(segs) == 2
    got = np.concatenate([p for _, p in segs], axis=0)
    want = pipeline.render_uint8(src, wav, pose, transformed_video=emo,
                                 add_emo=True)
    np.testing.assert_array_equal(got, want)


def test_stream_artifact_short_clip_single_segment(stream_artifact_path):
    """A clip shorter than one segment yields exactly one payload."""
    art = RenderArtifact.load(stream_artifact_path)
    rng = np.random.RandomState(12)
    src = rng.rand(256, 256, 3).astype(np.float32)
    wav = (0.1 * rng.randn(3000)).astype(np.float32)   # ~5 frames
    pose = rng.randn(1, 7).astype(np.float32)
    segs = list(art.render_stream(src, wav, pose))
    assert len(segs) == 1 and segs[0][0] == 0
    assert segs[0][1].shape[0] <= 8


def test_artifact_server_streaming(stream_artifact_path):
    """RenderServer.submit_stream over a streaming artifact delivers
    real in-order segments (not the single whole-clip fallback)."""
    from eamm_tpu.infer import ArtifactPipeline
    from eamm_tpu.serve import RenderServer

    art = RenderArtifact.load(stream_artifact_path)
    server = RenderServer(ArtifactPipeline(art), max_batch=art.batch,
                          max_delay_ms=5.0)
    try:
        rng = np.random.RandomState(13)
        src = rng.rand(256, 256, 3).astype(np.float32)
        wav = (0.1 * rng.randn(7000)).astype(np.float32)
        pose = rng.randn(1, 7).astype(np.float32)
        segs = list(server.submit_stream(src, wav, pose))
        assert [s for s, _ in segs] == [0, 8]
        got = np.concatenate([p for _, p in segs], axis=0)
        whole = server.render(src, wav, pose, timeout=600)
        np.testing.assert_array_equal(got, whole)
    finally:
        server.stop()


def test_stream_export_requires_flag(artifact_path):
    art = RenderArtifact.load(artifact_path)
    rng = np.random.RandomState(14)
    with pytest.raises(ValueError, match="streaming"):
        list(art.render_stream(rng.rand(256, 256, 3).astype(np.float32),
                               rng.randn(3000).astype(np.float32),
                               rng.randn(1, 7).astype(np.float32)))


def test_stream_export_segment_alignment(pipeline, tmp_path):
    with pytest.raises(ValueError, match="segments"):
        export_render_artifact(pipeline, str(tmp_path / "bad.eammx"),
                               batch=1, frame_buckets=(8,),
                               stream_segments=2)   # 8 / 2 < frame_chunk


def test_failed_export_leaves_no_artifact(pipeline, tmp_path, monkeypatch):
    """A lowering failure in a later bucket must not leave a valid-looking
    but incomplete artifact at the destination (it would only fail at load
    time on the serving host)."""
    import jax.export as jex_mod
    real_export = jex_mod.export
    calls = {"n": 0}

    def export_then_boom(*a, **k):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("simulated lowering failure")
        return real_export(*a, **k)

    monkeypatch.setattr(jex_mod, "export", export_then_boom)
    path = str(tmp_path / "broken.eammx")
    with pytest.raises(RuntimeError, match="simulated"):
        export_render_artifact(pipeline, path, batch=1, frame_buckets=(8, 16))
    import os
    assert not os.path.exists(path)
    assert not os.path.exists(path + ".tmp")


def test_emotional_export_requires_flag(artifact_path):
    art = RenderArtifact.load(artifact_path)
    rng = np.random.RandomState(6)
    with pytest.raises(ValueError, match="emotional"):
        art.render_emotional(rng.rand(256, 256, 3).astype(np.float32),
                             rng.randn(8, 28, 12).astype(np.float32),
                             rng.randn(8, 6).astype(np.float32),
                             rng.rand(4, 256, 256, 3).astype(np.float32))


def test_artifact_server(pipeline, emo_artifact_path):
    """RenderServer over an ArtifactPipeline: neutral requests coalesce
    onto the frozen batch program, emotional requests run the frozen
    emotional program, streams deliver one whole-clip segment."""
    from eamm_tpu.infer import ArtifactPipeline
    from eamm_tpu.serve import RenderServer

    art = RenderArtifact.load(emo_artifact_path)
    server = RenderServer(ArtifactPipeline(art), max_batch=art.batch,
                          max_delay_ms=5.0)
    try:
        rng = np.random.RandomState(7)
        src = rng.rand(256, 256, 3).astype(np.float32)
        wav = (0.1 * rng.randn(4000)).astype(np.float32)
        pose = rng.randn(1, 7).astype(np.float32)
        emo = rng.rand(4, 256, 256, 3).astype(np.float32)

        neutral = server.render(src, wav, pose, timeout=600)
        want_n = art.render_uint8([src], [wav], [pose])[0]
        np.testing.assert_array_equal(neutral, want_n)

        emotional = server.render(src, wav, pose, transformed_video=emo,
                                  timeout=600)
        want_e = art.render_emotional_uint8(src, wav, pose, emo)
        np.testing.assert_array_equal(emotional, want_e)

        segs = list(server.submit_stream(src, wav, pose))
        assert len(segs) == 1 and segs[0][0] == 0
        np.testing.assert_array_equal(segs[0][1], want_n)
    finally:
        server.stop()


def test_serve_cli_artifact(emo_artifact_path):
    """eamm-serve --artifact end-to-end: frozen artifact -> RenderServer ->
    HTTP /render, neutral and emotional, no checkpoints or config."""
    import threading
    import urllib.request
    from eamm_tpu.cli.serve import main as serve_main
    from eamm_tpu.serve_http import encode_request, decode_response

    stop = threading.Event()
    fronts = []
    t = threading.Thread(target=serve_main, kwargs=dict(
        argv=["--artifact", emo_artifact_path,
              "--host", "127.0.0.1", "--port", "0"],
        stop_event=stop, ready=fronts.append), daemon=True)
    t.start()
    try:
        deadline = 900
        while not fronts and deadline > 0:
            threading.Event().wait(0.5)
            deadline -= 0.5
            assert t.is_alive(), "serve CLI died during startup"
        front = fronts[0]
        rng = np.random.RandomState(8)
        src, wav, pose = (rng.rand(256, 256, 3), 0.1 * rng.randn(4000),
                          rng.randn(1, 7))
        for transformed in (None, rng.rand(3, 256, 256, 3)):
            body = encode_request(src, wav, pose, transformed=transformed)
            req = urllib.request.Request(front.url + "/render", data=body,
                                         method="POST")
            with urllib.request.urlopen(req, timeout=600) as resp:
                out = decode_response(resp.read())
            frames = out["frames"]
            assert frames.dtype == np.uint8
            assert frames.ndim == 4 and frames.shape[1:] == (256, 256, 3)
    finally:
        stop.set()
        t.join(timeout=60)


def test_artifact_errors(pipeline, artifact_path, tmp_path):
    art = RenderArtifact.load(artifact_path)
    rng = np.random.RandomState(3)
    with pytest.raises(ValueError, match="batch"):
        art.render(rng.rand(2, 256, 256, 3).astype(np.float32),
                   rng.randn(2, 8, 28, 12).astype(np.float32),
                   rng.randn(2, 8, 6).astype(np.float32))
    # bucket must be a multiple of the render chunk
    with pytest.raises(ValueError, match="multiple"):
        export_render_artifact(pipeline, str(tmp_path / "bad.eammx"),
                               batch=1, frame_buckets=(12,))
    # pallas kernels cannot lower for cpu
    ppipe = EammPipeline(pipeline.config, pipeline.vars,
                         options=dataclasses.replace(pipeline.options,
                                                     pallas_warp=True))
    with pytest.raises(ValueError, match="pallas"):
        export_render_artifact(ppipe, str(tmp_path / "p.eammx"),
                               batch=1, frame_buckets=(8,),
                               platforms=("tpu", "cpu"))
