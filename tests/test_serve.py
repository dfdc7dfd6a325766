"""RenderServer dynamic batching over the batched render program (CPU,
random weights).  The reference has no serving component (ref:demo.py is
one-clip-per-process); this is the production coalescing layer."""
import threading

import numpy as np
import pytest

from eamm_tpu.infer import EammPipeline, PipelineOptions
from eamm_tpu.serve import RenderServer
from tests.test_infer_pipeline import SMALL_CONFIG


@pytest.fixture(scope="module")
def pipeline():
    return EammPipeline.from_random(
        SMALL_CONFIG, options=PipelineOptions(frame_chunk=8, time_bucket=32))


def _req(seed, seconds=1.0):
    rng = np.random.RandomState(seed)
    return (rng.rand(256, 256, 3).astype(np.float32),
            (0.1 * rng.randn(int(16000 * seconds))).astype(np.float32),
            rng.randn(1, 7).astype(np.float32))


@pytest.mark.smoke
def test_coalescing_smoke(tiny_pipeline):
    """Smoke-tier twin of test_concurrent_requests_are_coalesced on the
    narrow-width shared pipeline (conftest.TINY_CONFIG)."""
    server = RenderServer(tiny_pipeline, max_batch=2, max_delay_ms=300)
    try:
        futures = [server.submit(*_req(i)) for i in range(2)]
        results = [f.result(timeout=600) for f in futures]
        for r in results:
            assert r.shape[1:] == (256, 256, 3)
            assert 20 <= r.shape[0] <= 30
        s = server.stats()
        assert s["requests"] == 2
        assert s["dispatches"] == 1        # both rode one device dispatch
        assert s["mean_batch_occupancy"] == 2.0
    finally:
        server.stop()


def test_concurrent_requests_are_coalesced(pipeline):
    server = RenderServer(pipeline, max_batch=3, max_delay_ms=300)
    try:
        futures = [server.submit(*_req(i)) for i in range(3)]
        results = [f.result(timeout=600) for f in futures]
        for r in results:
            assert r.shape[1:] == (256, 256, 3)
            assert 20 <= r.shape[0] <= 30
        s = server.stats()
        assert s["requests"] == 3
        # all three rode one device dispatch (they were enqueued well
        # within the batching window)
        assert s["dispatches"] == 1
        assert s["mean_batch_occupancy"] == 3.0
        assert s["mean_latency_ms"] > 0
    finally:
        server.stop()


def test_result_matches_direct_batch_render(pipeline):
    server = RenderServer(pipeline, max_batch=2, max_delay_ms=200)
    try:
        a, b = _req(10), _req(11, seconds=0.7)
        fa, fb = server.submit(*a), server.submit(*b)
        ra, rb = fa.result(600), fb.result(600)
        direct = pipeline.render_batch_uint8(
            [a[0], b[0]], [a[1], b[1]], [a[2], b[2]])
        ta = pipeline.audio_to_windows(a[1]).shape[0]
        tb = pipeline.audio_to_windows(b[1]).shape[0]
        np.testing.assert_array_equal(ra, direct[0, :ta])
        np.testing.assert_array_equal(rb, direct[1, :tb])
        assert ra.shape[0] != rb.shape[0]   # per-request trimming
    finally:
        server.stop()


def test_single_request_pads_to_fixed_batch(pipeline):
    """A lone request still renders (padded by replication) and resolves."""
    server = RenderServer(pipeline, max_batch=2, max_delay_ms=1)
    try:
        r = server.render(*_req(20), timeout=600)
        assert r.shape[1:] == (256, 256, 3)
        assert server.stats()["mean_batch_occupancy"] == 1.0
    finally:
        server.stop()


def test_worker_survives_bad_request(pipeline):
    server = RenderServer(pipeline, max_batch=1, max_delay_ms=1)
    try:
        bad_src = np.zeros((13, 13, 3), np.float32)   # wrong resolution
        f = server.submit(bad_src, _req(30)[1], _req(30)[2])
        with pytest.raises(Exception):
            f.result(600)
        # the worker thread is still alive and serves the next request
        r = server.render(*_req(31), timeout=600)
        assert r.shape[1:] == (256, 256, 3)
    finally:
        server.stop()


def test_stop_rejects_new_submissions(pipeline):
    server = RenderServer(pipeline, max_batch=1, max_delay_ms=1)
    server.stop()
    with pytest.raises(RuntimeError):
        server.submit(*_req(40))


def test_server_over_device_mesh(pipeline):
    """RenderServer + pipeline.use_mesh: coalesced dispatches shard the
    identity axis over the mesh and match the unsharded server results."""
    from eamm_tpu.parallel import host_cpu_mesh
    from eamm_tpu.infer import EammPipeline, PipelineOptions

    reqs = [_req(50), _req(51)]
    plain = RenderServer(pipeline, max_batch=2, max_delay_ms=300)
    try:
        expected = [f.result(600) for f in [plain.submit(*r) for r in reqs]]
    finally:
        plain.stop()

    sharded_pipe = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=32)
    ).use_mesh(host_cpu_mesh(2))
    server = RenderServer(sharded_pipe, max_batch=2, max_delay_ms=300)
    try:
        got = [f.result(600) for f in [server.submit(*r) for r in reqs]]
        for g, e in zip(got, expected):
            assert np.abs(g.astype(int) - e.astype(int)).max() <= 1
    finally:
        server.stop()


def test_emotional_requests_interleave_with_neutral(pipeline):
    """Emotional requests dispatch as singletons through the whole-clip
    program; neutral requests around them still coalesce and everyone's
    future resolves."""
    rng = np.random.RandomState(60)
    emo_frames = rng.rand(4, 256, 256, 3).astype(np.float32)
    server = RenderServer(pipeline, max_batch=2, max_delay_ms=200)
    try:
        f1 = server.submit(*_req(61))
        fe = server.submit(*_req(62), transformed_video=emo_frames)
        f2 = server.submit(*_req(63))
        r1, re, r2 = (f.result(900) for f in (f1, fe, f2))
        for r in (r1, re, r2):
            assert r.shape[1:] == (256, 256, 3)
        s = server.stats()
        assert s["requests"] == 3 and s["batched_requests"] == 3
        assert 2 <= s["dispatches"] <= 3   # emotional one never batched
    finally:
        server.stop()


def test_emotion_handle_requests(pipeline):
    """A prepared EmotionHandle passed as transformed_video renders the
    same frames as raw emotion arrays — the zero-upload serving path."""
    rng = np.random.RandomState(70)
    emo_frames = rng.rand(4, 256, 256, 3).astype(np.float32)
    server = RenderServer(pipeline, max_batch=2, max_delay_ms=50)
    try:
        req = _req(71)
        raw = server.render(*req, transformed_video=emo_frames, timeout=900)
        handle = server.prepare_emotion(emo_frames)
        cached = server.render(*req, transformed_video=handle, timeout=900)
        assert np.abs(cached.astype(int) - raw.astype(int)).max() <= 1
    finally:
        server.stop()


def test_http_emotion_registry(pipeline):
    """PUT /emotion registers a clip once; renders naming its emotion_id
    skip the frames payload and match the raw-frames render."""
    import urllib.request
    from eamm_tpu.serve_http import (HttpRenderFront, encode_request,
                                     encode_emotion_registration,
                                     decode_response)
    rng = np.random.RandomState(80)
    emo_frames = rng.rand(4, 256, 256, 3).astype(np.float32)
    server = RenderServer(pipeline, max_batch=2, max_delay_ms=20)
    front = HttpRenderFront(server)
    try:
        req = _req(81)
        raw_body = encode_request(*req, transformed=emo_frames)
        r = urllib.request.urlopen(urllib.request.Request(
            front.url + "/render", data=raw_body, method="POST"), timeout=900)
        raw = decode_response(r.read())["frames"]

        reg = urllib.request.urlopen(urllib.request.Request(
            front.url + "/emotion",
            data=encode_emotion_registration("style-a", emo_frames),
            method="PUT"), timeout=900)
        import json as _json
        assert _json.loads(reg.read())["frames"] == 4

        id_body = encode_request(*req, emotion_id="style-a")
        # frames payload dropped: the id body is the raw body minus ~all of
        # the emotion-frame bytes (source/waveform/pose still ship)
        assert len(id_body) < len(raw_body) - 0.9 * emo_frames.nbytes
        r2 = urllib.request.urlopen(urllib.request.Request(
            front.url + "/render", data=id_body, method="POST"), timeout=900)
        cached = decode_response(r2.read())["frames"]
        assert np.abs(cached.astype(int) - raw.astype(int)).max() <= 1

        # unknown id -> 400 with a helpful message
        bad = encode_request(*req, emotion_id="nope")
        try:
            urllib.request.urlopen(urllib.request.Request(
                front.url + "/render", data=bad, method="POST"), timeout=900)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400 and b"unknown emotion_id" in e.read()
    finally:
        front.close()
        server.stop()


def test_streaming_request(pipeline):
    """submit_stream delivers ordered segments equal to the non-streamed
    render; neutral batched requests keep working alongside."""
    from eamm_tpu.serve import RenderServer
    from eamm_tpu.infer import EammPipeline, PipelineOptions
    ov = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=16,
                                overlap_segments=2))
    server = RenderServer(ov, max_batch=2, max_delay_ms=30)
    try:
        src, wav, pose = _req(0)
        whole = ov.render_uint8(src, wav, pose, add_emo=False)
        stream = server.submit_stream(src, wav, pose)
        fut = server.submit(*_req(1))           # batched neutral alongside
        segs = list(stream)
        assert [s for s, _ in segs] == sorted(s for s, _ in segs)
        np.testing.assert_array_equal(
            np.concatenate([p for _, p in segs], axis=0), whole)
        assert fut.result(timeout=300).shape == whole.shape
    finally:
        server.stop()


def test_http_front(pipeline):
    """HTTP layer: /render and /render_stream round-trip the npz wire
    format and match the direct pipeline output; /stats and /healthz."""
    import json
    import urllib.request
    from eamm_tpu.serve_http import (HttpRenderFront, encode_request,
                                     decode_response, iter_stream)
    from eamm_tpu.infer import EammPipeline, PipelineOptions
    ov = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=16,
                                overlap_segments=2))
    server = RenderServer(ov, max_batch=2, max_delay_ms=20)
    front = HttpRenderFront(server)
    try:
        src, wav, pose = _req(3)
        want = ov.render_uint8(src, wav, pose, add_emo=False)
        body = encode_request(src, wav, pose)

        req = urllib.request.Request(front.url + "/render", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=600) as resp:
            out = decode_response(resp.read())
        np.testing.assert_array_equal(out["frames"], want)

        req = urllib.request.Request(front.url + "/render_stream", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=600) as resp:
            segs = list(iter_stream(resp))
        assert [s["start"] for s in segs] == sorted(s["start"] for s in segs)
        np.testing.assert_array_equal(
            np.concatenate([s["frames"] for s in segs], axis=0), want)

        with urllib.request.urlopen(front.url + "/healthz", timeout=60) as r:
            assert r.read() == b"ok"
        with urllib.request.urlopen(front.url + "/stats", timeout=60) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 2

        bad = urllib.request.Request(front.url + "/render", data=b"junk",
                                     method="POST")
        try:
            urllib.request.urlopen(bad, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        front.close()
        server.stop()


def test_http_stream_failure_closes_connection(pipeline, monkeypatch):
    """A mid-stream render failure must drop the connection so the client
    gets a fast IOError instead of blocking on an unterminated body."""
    import urllib.request
    from eamm_tpu.serve_http import HttpRenderFront, encode_request
    from eamm_tpu.infer import EammPipeline, PipelineOptions
    ov = EammPipeline(
        pipeline.config, pipeline.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=16,
                                overlap_segments=2))

    def broken_stream(*a, **kw):
        yield 0, np.zeros((8, 256, 256, 3), np.uint8)
        raise RuntimeError("chip fell over")

    monkeypatch.setattr(ov, "render_stream", broken_stream)
    server = RenderServer(ov, max_batch=1, max_delay_ms=10)
    front = HttpRenderFront(server)
    try:
        body = encode_request(*_req(5))
        req = urllib.request.Request(front.url + "/render_stream",
                                     data=body, method="POST")
        with urllib.request.urlopen(req, timeout=120) as resp:
            from eamm_tpu.serve_http import iter_stream
            import http.client
            segs = []
            with pytest.raises((IOError, http.client.HTTPException)):
                for s in iter_stream(resp):
                    segs.append(s)
        assert len(segs) <= 1          # got at most the first segment
    finally:
        front.close()
        server.stop()
