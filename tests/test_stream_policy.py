"""Length policy wiring for unbounded streaming (CPU, tiny widths).

``PipelineOptions.stream_policy_frames`` + ``segment_frames`` route short
clips through the whole-clip bucketed programs (~2x faster per BENCH_r04's
stream_60s_vs_10s ratio) and long clips through the unbounded chunk
programs (one compiled program pair for any length, O(chunk) device
memory).  The policy must be reachable from every product surface: the
pipeline renderers, RenderServer (long requests dispatch as singletons),
the HTTP front, and frozen artifacts (``unbounded_frames`` exports).
The reference buffers whole clips and degrades linearly
(ref:demo.py:212-281,477-515).
"""
import numpy as np
import pytest

from eamm_tpu.infer import EammPipeline, PipelineOptions


@pytest.fixture(scope="module")
def base_pipeline(tiny_pipeline):
    """Whole-clip-only reference pipeline (no policy): the shared
    session-scoped narrow-width pipeline (frame_chunk=8, time_bucket=8)."""
    return tiny_pipeline


@pytest.fixture(scope="module")
def policy_pipeline(base_pipeline):
    """Same weights, chunk programs + length policy: clips over 30 frames
    chunk; at most 30 keep the whole-clip buckets."""
    return EammPipeline(
        base_pipeline.config, base_pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=8,
                                segment_frames=16,
                                stream_policy_frames=30))


def _inputs(seconds, seed=0):
    rng = np.random.RandomState(seed)
    src = rng.rand(256, 256, 3).astype(np.float32)
    wav = (0.1 * rng.randn(int(16000 * seconds))).astype(np.float32)
    pose = rng.randn(1, 7).astype(np.float32)
    return src, wav, pose


def test_use_unbounded_policy(policy_pipeline):
    p = policy_pipeline
    assert not p.use_unbounded(30)
    assert p.use_unbounded(31)
    # segment_frames without a policy keeps the historical always-chunk
    # meaning (test_stream_unbounded_matches_whole_clip relies on it)
    p2 = EammPipeline(p.config, p.vars,
                      options=PipelineOptions(frame_chunk=8, time_bucket=8,
                                              segment_frames=16))
    assert p2.use_unbounded(1)
    # no segment_frames -> never unbounded
    p3 = EammPipeline(p.config, p.vars,
                      options=PipelineOptions(frame_chunk=8, time_bucket=8))
    assert not p3.use_unbounded(10_000)


def test_policy_routes_and_matches(base_pipeline, policy_pipeline,
                                   monkeypatch):
    """Short clips keep the whole-clip programs, long clips take the chunk
    programs, and both agree with the no-policy whole-clip render."""
    calls = []
    orig = EammPipeline._render_stream_unbounded

    def spy(self, *a, **k):
        calls.append(True)
        return orig(self, *a, **k)

    monkeypatch.setattr(EammPipeline, "_render_stream_unbounded", spy)

    # short (1 s ~ 25 frames <= 30): whole-clip path
    src, wav, pose = _inputs(1.0, seed=3)
    short = policy_pipeline.render_uint8(src, wav, pose, add_emo=False)
    assert not calls
    ref = base_pipeline.render_uint8(src, wav, pose, add_emo=False)
    np.testing.assert_array_equal(short, ref)

    # long (2 s ~ 50 frames > 30): chunk path, zero new whole-clip traces
    src, wav, pose = _inputs(2.0, seed=4)
    n_full = policy_pipeline._full_render._cache_size()
    long_out = policy_pipeline.render_uint8(src, wav, pose, add_emo=False)
    assert calls
    assert policy_pipeline._full_render._cache_size() == n_full
    ref = base_pipeline.render_uint8(src, wav, pose, add_emo=False)
    assert long_out.shape == ref.shape
    # chunked scans with a threaded carry: allow one uint8 step of
    # jit-boundary fusion wobble (same budget as the unbounded test)
    assert np.abs(long_out.astype(int) - ref.astype(int)).max() <= 1

    # render_stream on the long clip yields chunk-cadence segments
    segs = list(policy_pipeline.render_stream(src, wav, pose,
                                              add_emo=False))
    assert [s for s, _ in segs] == list(range(0, ref.shape[0], 16))
    got = np.concatenate([p for _, p in segs], axis=0)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_server_long_request_is_singleton(base_pipeline, policy_pipeline):
    """A long request through RenderServer dispatches alone through the
    chunk programs instead of padding a whole-clip batch bucket."""
    from eamm_tpu.serve import RenderServer
    server = RenderServer(policy_pipeline, max_batch=2, max_delay_ms=10)
    try:
        src, wav, pose = _inputs(2.0, seed=5)
        n_batch = policy_pipeline._batch_render._cache_size()
        out = server.render(src, wav, pose, timeout=600)
        assert policy_pipeline._batch_render._cache_size() == n_batch
        assert server.stats()["mean_batch_occupancy"] == 1.0
        ref = base_pipeline.render_uint8(src, wav, pose, add_emo=False)
        assert out.shape == ref.shape
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1
    finally:
        server.stop()


def test_http_long_clip_streams_chunked(base_pipeline, policy_pipeline):
    """A long clip streams through the HTTP server in chunk-cadence
    segments with zero new whole-clip traces — the product surface for
    unbounded streaming (scaled-down 5-minute-clip scenario)."""
    import urllib.request
    from eamm_tpu.serve import RenderServer
    from eamm_tpu.serve_http import (HttpRenderFront, encode_request,
                                     iter_stream)
    server = RenderServer(policy_pipeline, max_batch=2, max_delay_ms=10)
    front = HttpRenderFront(server)
    try:
        src, wav, pose = _inputs(2.0, seed=6)
        n_full = policy_pipeline._full_render._cache_size()
        n_batch = policy_pipeline._batch_render._cache_size()
        req = urllib.request.Request(
            front.url + "/render_stream",
            data=encode_request(src, wav, pose), method="POST")
        starts, payloads = [], []
        with urllib.request.urlopen(req, timeout=600) as resp:
            for seg in iter_stream(resp):
                starts.append(seg["start"])
                payloads.append(seg["frames"])
        assert policy_pipeline._full_render._cache_size() == n_full
        assert policy_pipeline._batch_render._cache_size() == n_batch
        ref = base_pipeline.render_uint8(src, wav, pose, add_emo=False)
        assert starts == list(range(0, ref.shape[0], 16))
        got = np.concatenate(payloads, axis=0)
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
    finally:
        front.close()
        server.stop()


# ------------------------------------------------------- frozen artifacts

@pytest.fixture(scope="module")
def unbounded_artifact(base_pipeline, tmp_path_factory):
    from eamm_tpu.infer import export_render_artifact
    path = str(tmp_path_factory.mktemp("ubx") / "model.eammx")
    pipe = EammPipeline(
        base_pipeline.config, base_pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=8,
                                stream_policy_frames=30))
    meta = export_render_artifact(pipe, path, batch=1, frame_buckets=(32,),
                                  emotional=True, emo_frame_buckets=(8,),
                                  unbounded_frames=16)
    assert meta["unbounded"]["segment_frames"] == 16
    assert meta["unbounded"]["stream_policy_frames"] == 30
    return path


def test_artifact_unbounded_matches_live(base_pipeline, unbounded_artifact):
    from eamm_tpu.infer import RenderArtifact
    art = RenderArtifact.load(unbounded_artifact)
    src, wav, pose = _inputs(2.0, seed=7)
    ref = base_pipeline.render_uint8(src, wav, pose, add_emo=False)
    segs = list(art.render_stream_unbounded(src, wav, pose))
    assert [s for s, _ in segs] == list(range(0, ref.shape[0], 16))
    got = np.concatenate([p for _, p in segs], axis=0)
    assert got.shape == ref.shape
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1

    # emotional unbounded path agrees with the live emotional render
    rng = np.random.RandomState(8)
    emo = rng.rand(5, 256, 256, 3).astype(np.float32)
    ref_e = base_pipeline.render_uint8(src, wav, pose,
                                       transformed_video=emo, add_emo=True)
    segs_e = list(art.render_stream_unbounded(src, wav, pose,
                                              emotion_frames=emo))
    got_e = np.concatenate([p for _, p in segs_e], axis=0)
    assert np.abs(got_e.astype(int) - ref_e.astype(int)).max() <= 1


def test_artifact_pipeline_policy(base_pipeline, unbounded_artifact):
    """ArtifactPipeline routes by the frozen length policy, so an
    artifact-backed server handles any clip length with zero compiles."""
    from eamm_tpu.infer import RenderArtifact
    from eamm_tpu.infer.export import ArtifactPipeline
    pipe = ArtifactPipeline(RenderArtifact.load(unbounded_artifact))
    assert not pipe.use_unbounded(30)      # policy (30) < bucket (32)
    assert pipe.use_unbounded(31)
    src, wav, pose = _inputs(2.0, seed=9)
    ref = base_pipeline.render_uint8(src, wav, pose, add_emo=False)
    out = pipe.render_uint8(src, wav, pose, add_emo=False)
    assert out.shape == ref.shape
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1
    segs = list(pipe.render_stream(src, wav, pose, add_emo=False))
    assert [s for s, _ in segs] == list(range(0, ref.shape[0], 16))
