"""End-to-end inference pipeline test (random weights, CPU).

Drives the full flow: waveform -> MFCC windows -> A2FD -> audio keypoints ->
(emotion displacements) -> normalized kp -> chunked batched rendering.
"""
import numpy as np
import pytest

from eamm_tpu.infer import EammPipeline, PipelineOptions

SMALL_CONFIG = {
    "model_params": {
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
                                 "block_expansion": 32, "max_features": 128,
                                 "num_blocks": 5, "scale_factor": 0.25}},
        "discriminator_params": {"scales": [1], "block_expansion": 32,
                                 "max_features": 128, "num_blocks": 4,
                                 "sn": True},
    },
    "train_params": {"jaco_net": "cnn"},
}


@pytest.fixture(scope="module")
def pipeline():
    return EammPipeline.from_random(
        SMALL_CONFIG,
        options=PipelineOptions(frame_chunk=8, time_bucket=32))


def _inputs(seconds=1.0, seed=0):
    rng = np.random.RandomState(seed)
    src = rng.rand(256, 256, 3).astype(np.float32)
    wav = (0.1 * rng.randn(int(16000 * seconds))).astype(np.float32)
    pose = rng.randn(1, 7).astype(np.float32)
    emo_frames = rng.rand(5, 256, 256, 3).astype(np.float32)
    return src, wav, pose, emo_frames


def test_neutral_render(pipeline):
    src, wav, pose, _ = _inputs()
    frames = pipeline.render(src, wav, pose, add_emo=False)
    assert frames.ndim == 4 and frames.shape[1:] == (256, 256, 3)
    assert 20 <= frames.shape[0] <= 30          # ~25 fps for 1 s
    assert np.all(np.isfinite(frames))
    assert frames.min() >= 0.0 and frames.max() <= 1.0


@pytest.mark.smoke
def test_neutral_render_smoke(tiny_pipeline):
    """Smoke-tier twin of test_neutral_render on the narrow-width shared
    pipeline (conftest.TINY_CONFIG): full waveform -> MFCC -> audio kp ->
    chunked render flow, ~8x cheaper cold compile."""
    src, wav, pose, _ = _inputs()
    frames = tiny_pipeline.render(src, wav, pose, add_emo=False)
    assert frames.ndim == 4 and frames.shape[1:] == (256, 256, 3)
    assert 20 <= frames.shape[0] <= 30          # ~25 fps for 1 s
    assert np.all(np.isfinite(frames))
    assert frames.min() >= 0.0 and frames.max() <= 1.0


def test_emotional_render(pipeline):
    src, wav, pose, emo_frames = _inputs(seed=1)
    frames = pipeline.render(src, wav, pose, transformed_video=emo_frames,
                             add_emo=True)
    assert frames.shape[1:] == (256, 256, 3)
    assert np.all(np.isfinite(frames))


def test_emotion_requires_frames(pipeline):
    src, wav, pose, _ = _inputs(seed=2)
    with pytest.raises(ValueError):
        pipeline.render(src, wav, pose, add_emo=True)


def test_batched_identities(pipeline):
    rng = np.random.RandomState(4)
    sources = rng.rand(2, 256, 256, 3).astype(np.float32)
    wavs = [(0.1 * rng.randn(16000)).astype(np.float32),
            (0.1 * rng.randn(12000)).astype(np.float32)]
    poses = [rng.randn(1, 7).astype(np.float32),
             rng.randn(5, 7).astype(np.float32)]
    out = pipeline.render_batch_uint8(sources, wavs, poses)
    assert out.ndim == 5 and out.shape[0] == 2
    assert out.shape[2:] == (256, 256, 3) and out.dtype == np.uint8
    # batched result for identity 0 matches the single-clip fused path
    single = pipeline.render_uint8(sources[0], wavs[0], poses[0],
                                   add_emo=False)
    T = single.shape[0]
    diff = np.abs(out[0, :T].astype(int) - single.astype(int))
    assert diff.max() <= 1          # uint8 rounding wobble only


def test_relative_mode(pipeline):
    src, wav, pose, _ = _inputs(seed=3)
    pipeline.options.relative = True
    try:
        frames = pipeline.render(src, wav, pose, add_emo=False)
    finally:
        pipeline.options.relative = False
    assert np.all(np.isfinite(frames))


def test_yuv420_transfer_matches_rgb(pipeline):
    """yuv420 transfer = same render, codec-equivalent loss only."""
    src, wav, pose, _ = _inputs(seed=5)
    rgb = pipeline.render_uint8(src, wav, pose, add_emo=False)

    yuv_pipe = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=32,
                                transfer_format="yuv420"))
    y, u, v = yuv_pipe.render_yuv420(src, wav, pose, add_emo=False)
    assert y.shape == rgb.shape[:3]
    assert u.shape == (rgb.shape[0], 128, 128)

    back = yuv_pipe.render_uint8(src, wav, pose, add_emo=False)
    assert back.shape == rgb.shape and back.dtype == np.uint8
    err = np.abs(back.astype(np.float32) - rgb.astype(np.float32)) / 255.0
    assert err.mean() < 5e-3        # codec-class chroma subsampling loss
    assert err.max() < 0.2          # sharp chroma edges only


def test_uint8_emotion_upload(pipeline):
    """The yuv420 production path ships emotion frames to the device as
    uint8 (4x fewer host->device bytes); the quantization is visually
    lossless vs the bit-exact f32 upload of the rgb path."""
    src, wav, pose, emo_frames = _inputs(seed=10)
    yuv_pipe = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=32,
                                transfer_format="yuv420"))
    # upload dtype switches with the transfer format
    _, args, _ = yuv_pipe._prepare_full_render_args(
        src, wav, pose, emo_frames, add_emo=True)
    assert args[3].dtype == np.uint8
    _, args_rgb, _ = pipeline._prepare_full_render_args(
        src, wav, pose, emo_frames, add_emo=True)
    assert args_rgb[3].dtype == np.float32

    rgb = pipeline.render_uint8(src, wav, pose,
                                transformed_video=emo_frames, add_emo=True)
    back = yuv_pipe.render_uint8(src, wav, pose,
                                 transformed_video=emo_frames, add_emo=True)
    err = np.abs(back.astype(np.float32) - rgb.astype(np.float32)) / 255.0
    assert err.mean() < 5e-3 and err.max() < 0.2


def test_yuv420_batch_transfer(pipeline):
    rng = np.random.RandomState(6)
    sources = rng.rand(2, 256, 256, 3).astype(np.float32)
    wavs = [(0.1 * rng.randn(16000)).astype(np.float32) for _ in range(2)]
    poses = [rng.randn(1, 7).astype(np.float32) for _ in range(2)]
    yuv_pipe = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=32,
                                transfer_format="yuv420"))
    y, u, v = yuv_pipe.render_batch_yuv420(sources, wavs, poses)
    rgb = pipeline.render_batch_uint8(sources, wavs, poses)
    assert y.shape == rgb.shape[:4]
    from eamm_tpu.ops.colorspace import yuv420_to_rgb
    back = yuv420_to_rgb(y, u, v)
    err = np.abs(back.astype(np.float32) - rgb.astype(np.float32)) / 255.0
    assert err.mean() < 5e-3


def test_bf16_render_quality(pipeline):
    """bf16 decode (the bench configuration) is visually lossless: the
    keypoint path stays f32, only generator convs run bf16."""
    import jax.numpy as jnp
    src, wav, pose, _ = _inputs(seed=7)
    rgb_f32 = pipeline.render_uint8(src, wav, pose, add_emo=False)
    bf16_pipe = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=32,
                                compute_dtype=jnp.bfloat16))
    rgb_bf16 = bf16_pipe.render_uint8(src, wav, pose, add_emo=False)
    d = np.abs(rgb_f32.astype(np.float32) - rgb_bf16.astype(np.float32))
    assert d.mean() < 0.5           # in uint8 counts
    assert np.percentile(d, 99) <= 2.0


def test_bf16_emotional_render_quality(pipeline):
    """bf16 emotional path: the 256^2 emotion trunk runs bf16 (the heads,
    smoothing and kp math stay f32) — displacements and frames track f32."""
    import jax.numpy as jnp
    src, wav, pose, emo_frames = _inputs(seed=8)
    rgb_f32 = pipeline.render_uint8(src, wav, pose,
                                    transformed_video=emo_frames,
                                    add_emo=True)
    bf16_pipe = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=32,
                                compute_dtype=jnp.bfloat16))
    rgb_bf16 = bf16_pipe.render_uint8(src, wav, pose,
                                      transformed_video=emo_frames,
                                      add_emo=True)
    d = np.abs(rgb_f32.astype(np.float32) - rgb_bf16.astype(np.float32))
    assert d.mean() < 0.75          # in uint8 counts
    assert np.percentile(d, 99) <= 3.0


def test_emotion_handle_matches_frames(pipeline):
    """prepare_emotion: a device-cached handle (precomputed [U,512] trunk
    features, zero per-call upload) renders the same frames as passing the
    raw emotion clip — only the trunk moves to prepare time, the math is
    unchanged (fusion-boundary wobble -> +/-1 uint8 count)."""
    src, wav, pose, emo_frames = _inputs(seed=11)
    ref = pipeline.render_uint8(src, wav, pose,
                                transformed_video=emo_frames, add_emo=True)

    handle = pipeline.prepare_emotion(emo_frames)
    assert handle.feats is not None          # linear head -> feature table
    assert handle.feats.shape[1] == 512
    assert handle.feats.shape[0] % 32 == 0   # bucketed rows
    assert handle.n_frames == emo_frames.shape[0]

    # the fused program consumes the feature table, not pixels
    _, args, emo_kw = pipeline._prepare_full_render_args(
        src, wav, pose, handle, add_emo=True)
    assert args[3] is handle.feats
    assert emo_kw["emo_from_feats"] is True

    out = pipeline.render_uint8(src, wav, pose,
                                transformed_video=handle, add_emo=True)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1

    # second render with the same handle reuses the same device buffers
    out2 = pipeline.render_uint8(src, wav, pose,
                                 transformed_video=handle, add_emo=True)
    np.testing.assert_array_equal(out, out2)


def test_overlap_matches_single_dispatch(pipeline):
    """The overlapped (kp stage + S render segments) delivery path runs the
    identical ops in the identical order, so its output is bitwise equal to
    the single whole-clip dispatch — rgb and yuv420, neutral and emotional."""
    src, wav, pose, emo_frames = _inputs(seed=8)
    single_rgb = pipeline.render_uint8(src, wav, pose, add_emo=False)

    ov = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=16,
                                overlap_segments=3))
    rgb = ov.render_uint8(src, wav, pose, add_emo=False)
    assert rgb.shape == single_rgb.shape
    np.testing.assert_array_equal(rgb, single_rgb)

    # emotional path through the overlapped programs
    emo = ov.render_uint8(src, wav, pose, transformed_video=emo_frames,
                          add_emo=True)
    single_emo = pipeline.render_uint8(src, wav, pose,
                                       transformed_video=emo_frames,
                                       add_emo=True)
    np.testing.assert_array_equal(emo, single_emo)

    yuv_single = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=32,
                                transfer_format="yuv420"))
    y0, u0, v0 = yuv_single.render_yuv420(src, wav, pose, add_emo=False)
    yuv_ov = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=16,
                                transfer_format="yuv420",
                                overlap_segments=2))
    y1, u1, v1 = yuv_ov.render_yuv420(src, wav, pose, add_emo=False)
    np.testing.assert_array_equal(y0, y1)
    np.testing.assert_array_equal(u0, u1)
    np.testing.assert_array_equal(v0, v1)


def test_batch_overlap_matches_single_dispatch(pipeline):
    """Batched overlapped delivery == batched single dispatch, bitwise."""
    rng = np.random.RandomState(9)
    sources = rng.rand(2, 256, 256, 3).astype(np.float32)
    wavs = [(0.1 * rng.randn(16000)).astype(np.float32) for _ in range(2)]
    poses = [rng.randn(1, 7).astype(np.float32) for _ in range(2)]
    single = pipeline.render_batch_uint8(sources, wavs, poses)

    ov = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=16,
                                overlap_segments=2))
    out = ov.render_batch_uint8(sources, wavs, poses)
    np.testing.assert_array_equal(out, single)

    yuv_single = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=32,
                                transfer_format="yuv420"))
    y0, u0, v0 = yuv_single.render_batch_yuv420(sources, wavs, poses)
    yuv_ov = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=16,
                                transfer_format="yuv420",
                                overlap_segments=3))
    y1, u1, v1 = yuv_ov.render_batch_yuv420(sources, wavs, poses)
    np.testing.assert_array_equal(y0, y1)
    np.testing.assert_array_equal(u0, u1)
    np.testing.assert_array_equal(v0, v1)


def test_render_stream_matches_whole_clip(pipeline):
    """render_stream yields in-order segments whose concatenation is
    bitwise equal to the whole-clip render — rgb and yuv420, neutral and
    emotional — and the adapt_scale fallback raises."""
    src, wav, pose, emo_frames = _inputs(seed=9)
    ov = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=16,
                                overlap_segments=3))
    whole = ov.render_uint8(src, wav, pose, add_emo=False)
    segs = list(ov.render_stream(src, wav, pose, add_emo=False))
    assert [s for s, _ in segs] == sorted(s for s, _ in segs)
    assert segs[0][0] == 0
    np.testing.assert_array_equal(
        np.concatenate([p for _, p in segs], axis=0), whole)
    # first segment is a strict prefix (streaming is useful)
    assert len(segs) > 1 and segs[0][1].shape[0] < whole.shape[0]

    emo_whole = ov.render_uint8(src, wav, pose,
                                transformed_video=emo_frames, add_emo=True)
    emo_segs = list(ov.render_stream(src, wav, pose,
                                     transformed_video=emo_frames,
                                     add_emo=True))
    np.testing.assert_array_equal(
        np.concatenate([p for _, p in emo_segs], axis=0), emo_whole)

    yuv = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=16,
                                transfer_format="yuv420",
                                overlap_segments=2))
    y0, u0, v0 = yuv.render_yuv420(src, wav, pose, add_emo=False)
    ysegs = list(yuv.render_stream(src, wav, pose, add_emo=False))
    np.testing.assert_array_equal(
        np.concatenate([p[0] for _, p in ysegs], axis=0), y0)
    np.testing.assert_array_equal(
        np.concatenate([p[1] for _, p in ysegs], axis=0), u0)
    np.testing.assert_array_equal(
        np.concatenate([p[2] for _, p in ysegs], axis=0), v0)

    bad = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=16,
                                adapt_scale=True))
    with pytest.raises(ValueError, match="adapt_scale"):
        next(bad.render_stream(src, wav, pose, add_emo=False))


def test_stream_unbounded_matches_whole_clip(pipeline):
    """segment_frames streaming (fixed-size chunk programs with the
    recurrent state threaded between dispatches) equals the whole-clip
    render for any clip length — and a 3x longer clip reuses the SAME
    compiled chunk programs (zero new traces), the property that makes it
    unbounded.  Neutral and emotional (handle == raw frames by the
    prepare_emotion equivalence already tested above)."""
    src, wav, pose, emo_frames = _inputs(seconds=1.5, seed=11)
    un = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=16,
                                segment_frames=16))
    whole = pipeline.render_uint8(src, wav, pose, add_emo=False)
    segs = list(un.render_stream(src, wav, pose, add_emo=False))
    assert [s for s, _ in segs] == list(range(0, whole.shape[0], 16))
    got = np.concatenate([p for _, p in segs], axis=0)
    assert got.shape == whole.shape
    # chunked scans with a threaded carry compute the same math; allow the
    # jit-boundary fusion wobble one uint8 step of headroom
    assert np.abs(got.astype(int) - whole.astype(int)).max() <= 1

    # emotional path (handle-feats chunk programs)
    emo_whole = pipeline.render_uint8(src, wav, pose,
                                      transformed_video=emo_frames,
                                      add_emo=True)
    emo_segs = list(un.render_stream(src, wav, pose,
                                     transformed_video=emo_frames,
                                     add_emo=True))
    emo_got = np.concatenate([p for _, p in emo_segs], axis=0)
    assert np.abs(emo_got.astype(int) - emo_whole.astype(int)).max() <= 1

    # unbounded property: a 3x longer clip must not trace any new program
    n_traces = un._stream_kp_chunk._cache_size()
    src3, wav3, pose3, _ = _inputs(seconds=4.5, seed=12)
    segs3 = list(un.render_stream(src3, wav3, pose3, add_emo=False))
    assert un._stream_kp_chunk._cache_size() == n_traces
    T3 = sum(p.shape[0] for _, p in segs3)
    whole3 = pipeline.render_uint8(src3, wav3, pose3, add_emo=False)
    assert T3 == whole3.shape[0]
    got3 = np.concatenate([p for _, p in segs3], axis=0)
    assert np.abs(got3.astype(int) - whole3.astype(int)).max() <= 1
