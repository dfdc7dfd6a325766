"""Production serving: dynamic request batching over the batched renderer.

The reference has no serving story (its demo.py renders one clip per
process invocation, frame by frame — ref:demo.py:212-281).  On TPU the
economics invert: the whole-clip program renders N identities at once for
nearly the cost of one (bench: 4-identity aggregate throughput within the
single-clip delivery envelope), so a server should *coalesce* concurrent
requests into one device dispatch.

``RenderServer`` wraps an ``EammPipeline`` with a background worker that:

1. blocks on the first queued request, then waits up to ``max_delay_ms``
   for more (classic dynamic batching),
2. pads the group to exactly ``max_batch`` by replicating the first
   request — the jitted batch program specializes on batch size, so a
   FIXED size means ONE compilation per clip-length bucket instead of one
   per occupancy level,
3. runs ``render_batch_uint8`` / ``render_batch_yuv420`` and resolves each
   request's Future with its own clip trimmed to its own true length.

Thread-safe; ``submit`` never blocks on device work.  No external
dependencies — callers can put an HTTP/gRPC front on the Future API.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future

import numpy as np


def _is_long(pipeline, frames: int) -> bool:
    """True when the pipeline's length policy routes a clip of ``frames``
    through the unbounded chunk programs (``EammPipeline.use_unbounded``);
    frozen ``ArtifactPipeline``s expose the same hook when their artifact
    carries unbounded streaming programs."""
    fn = getattr(pipeline, "use_unbounded", None)
    return bool(fn(frames)) if fn is not None else False


def _as_emotion_arg(transformed_video):
    """Emotion payload for a request: a prepared ``EmotionHandle`` passes
    through untouched (device-cached frames / trunk features — the
    zero-upload serving path), raw frames are copied to float32."""
    if transformed_video is None:
        return None
    from eamm_tpu.infer.pipeline import EmotionHandle
    if isinstance(transformed_video, EmotionHandle):
        return transformed_video
    return np.asarray(transformed_video, np.float32)


@dataclasses.dataclass
class _Request:
    source: np.ndarray
    waveform: np.ndarray
    pose: np.ndarray
    frames: int                 # true clip length for trimming
    future: Future
    t_enqueue: float
    transformed: object | None = None  # emotion frames or EmotionHandle
    stream_q: queue.Queue | None = None     # segment queue (submit_stream)
    long: bool = False   # over the pipeline's stream_policy_frames length

    @property
    def emotional(self) -> bool:
        return self.transformed is not None

    @property
    def singleton(self) -> bool:
        """Dispatched alone: emotional (per-request trunk state),
        streaming (per-request delivery cadence), and long clips (they
        render through the unbounded chunk programs — a coalesced batch
        would compile a whole-clip bucket per length) don't coalesce."""
        return self.emotional or self.stream_q is not None or self.long


_STREAM_END = object()


class RenderServer:
    """Dynamic-batching render server (neutral requests coalesce;
    emotional requests run as singleton whole-clip dispatches).

    Args:
      pipeline: an ``EammPipeline`` (any transfer_format; yuv420 +
        overlap_segments recommended for production delivery).
      max_batch: device batch size — every dispatch runs exactly this many
        clips (short groups are padded by replication).
      max_delay_ms: how long the worker waits to fill a batch after the
        first request arrives.  Latency floor for a lone request.
    """

    def __init__(self, pipeline, max_batch: int = 4,
                 max_delay_ms: float = 50.0):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.max_delay = max_delay_ms / 1e3
        self._q: queue.Queue = queue.Queue()
        self._stashed: _Request | None = None
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._stats = {"requests": 0, "dispatches": 0, "batched_requests": 0,
                       "latency_sum": 0.0, "latency_max": 0.0}
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # ---- client API ----------------------------------------------------

    def submit(self, source_image: np.ndarray, waveform: np.ndarray,
               pose: np.ndarray,
               transformed_video: np.ndarray | None = None) -> Future:
        """Enqueue one clip; resolves to uint8 [T, 256, 256, 3] frames
        (or (y, u, v) planes when the pipeline delivers yuv420).

        ``transformed_video`` (mouth-masked aligned emotion frames) makes
        this an emotional-path request: those render as singleton
        whole-clip dispatches (the emotion trunk is per-request state the
        batch program does not take), while neutral requests coalesce."""
        if self._stop.is_set():
            raise RuntimeError("server stopped")
        from eamm_tpu.ops.mfcc import num_windows_for_samples
        frames = num_windows_for_samples(len(waveform))  # pure host math —
        # submit never touches the device (the worker computes the windows)
        req = _Request(np.asarray(source_image, np.float32),
                       np.asarray(waveform, np.float32),
                       np.asarray(pose, np.float32),
                       frames, Future(), time.monotonic(),
                       _as_emotion_arg(transformed_video),
                       long=_is_long(self.pipeline, frames))
        with self._lock:
            self._stats["requests"] += 1
        self._q.put(req)
        return req.future

    def render(self, source_image, waveform, pose,
               transformed_video=None, timeout=None):
        """Blocking convenience wrapper around ``submit``."""
        return self.submit(source_image, waveform, pose,
                           transformed_video).result(timeout)

    def prepare_emotion(self, transformed_video):
        """Upload an emotion clip once (and precompute its trunk features)
        for reuse across requests — pass the returned handle as
        ``transformed_video`` in later ``submit``/``submit_stream`` calls.
        The per-request emotion-frame upload (~192 KiB/frame through the
        host link) and the 256^2 trunk drop out of the hot path."""
        return self.pipeline.prepare_emotion(transformed_video)

    def submit_stream(self, source_image, waveform, pose,
                      transformed_video=None):
        """Streaming request: returns an iterator over ``(start_frame,
        payload)`` segments, delivered in clip order as the chip renders
        them (``EammPipeline.render_stream``).  The first segment arrives
        after ~1/overlap_segments of the clip's work — the low-latency
        path for live playback.  Streamed requests dispatch as singletons
        (their delivery cadence can't share a coalesced batch)."""
        if self._stop.is_set():
            raise RuntimeError("server stopped")
        from eamm_tpu.ops.mfcc import num_windows_for_samples
        frames = num_windows_for_samples(len(waveform))
        req = _Request(np.asarray(source_image, np.float32),
                       np.asarray(waveform, np.float32),
                       np.asarray(pose, np.float32),
                       frames, Future(), time.monotonic(),
                       _as_emotion_arg(transformed_video),
                       stream_q=queue.Queue())
        with self._lock:
            self._stats["requests"] += 1
        self._q.put(req)

        def segments():
            while True:
                item = req.stream_q.get()
                if item is _STREAM_END:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        return segments()

    def stats(self) -> dict:
        with self._lock:
            s = dict(self._stats)
        done = max(1, s["batched_requests"])      # completed requests
        s["mean_latency_ms"] = round(1e3 * s.pop("latency_sum") / done, 2)
        s["latency_max_ms"] = round(1e3 * s.pop("latency_max"), 2)
        s["mean_batch_occupancy"] = round(
            s["batched_requests"] / max(1, s["dispatches"]), 2)
        return s

    def reset_stats(self):
        """Zero the counters (e.g. after warm-up compilation)."""
        with self._lock:
            for k in self._stats:
                self._stats[k] = type(self._stats[k])()

    def stop(self, timeout: float = 30.0):
        """Drain-free stop: pending requests get RuntimeError."""
        self._stop.set()
        self._q.put(None)
        self._worker.join(timeout)
        # resolve everything still queued (incl. the submit-vs-stop race
        # and the worker's stashed request) so no caller blocks forever
        leftovers = [self._stashed] if self._stashed else []
        self._stashed = None
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            if r is not None:
                leftovers.append(r)
        for r in leftovers:
            if not r.future.done():
                r.future.set_exception(RuntimeError("server stopped"))
            if r.stream_q is not None:
                r.stream_q.put(RuntimeError("server stopped"))

    # ---- worker ---------------------------------------------------------

    def _take_group(self) -> list[_Request] | None:
        first = self._stashed or self._q.get()
        self._stashed = None
        if first is None or self._stop.is_set():
            return None
        if first.singleton:
            return [first]                  # singleton dispatch
        group = [first]
        deadline = time.monotonic() + self.max_delay
        while len(group) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            if nxt.singleton:
                self._stashed = nxt         # different kind: next round
                break
            group.append(nxt)
        return group

    def _loop(self):
        while not self._stop.is_set():
            group = self._take_group()
            if not group:
                continue
            try:
                self._dispatch(group)
            except Exception as e:   # resolve, never kill the worker
                for r in group:
                    if not r.future.done():
                        r.future.set_exception(e)
                    if r.stream_q is not None:
                        r.stream_q.put(e)

    def _dispatch(self, group: list[_Request]):
        yuv = self.pipeline.options.transfer_format == "yuv420"
        if group[0].stream_q is not None:
            r = group[0]
            try:
                count = 0
                for start, payload in self.pipeline.render_stream(
                        r.source, r.waveform, r.pose,
                        transformed_video=r.transformed,
                        add_emo=r.emotional):
                    r.stream_q.put((start, payload))
                    count += 1
            except Exception as e:
                r.stream_q.put(e)
                if not r.future.done():
                    r.future.set_exception(e)
                return
            r.stream_q.put(_STREAM_END)
            self._finish([r], [count])      # future resolves to #segments
            return
        if group[0].singleton:
            # emotional (per-request trunk state) or long (renders through
            # the unbounded chunk programs via the pipeline length policy)
            r = group[0]
            if yuv:
                y, u, v = self.pipeline.render_yuv420(
                    r.source, r.waveform, r.pose,
                    transformed_video=r.transformed, add_emo=r.emotional)
                result = (y[:r.frames], u[:r.frames], v[:r.frames])
            else:
                frames = self.pipeline.render_uint8(
                    r.source, r.waveform, r.pose,
                    transformed_video=r.transformed, add_emo=r.emotional)
                result = frames[:r.frames]
            self._finish([r], [result])
            return
        # fixed-size batch: pad by replicating request 0 so the jitted
        # program compiles once per clip-length bucket
        pad = self.max_batch - len(group)
        reqs = group + [group[0]] * pad
        sources = [r.source for r in reqs]
        wavs = [r.waveform for r in reqs]
        poses = [r.pose for r in reqs]
        if yuv:
            y, u, v = self.pipeline.render_batch_yuv420(sources, wavs, poses)
            results = [(y[i, :r.frames], u[i, :r.frames], v[i, :r.frames])
                       for i, r in enumerate(group)]
        else:
            frames = self.pipeline.render_batch_uint8(sources, wavs, poses)
            results = [frames[i, :r.frames] for i, r in enumerate(group)]
        self._finish(group, results)

    def _finish(self, group: list[_Request], results):
        now = time.monotonic()
        with self._lock:
            self._stats["dispatches"] += 1
            self._stats["batched_requests"] += len(group)
        for r, result in zip(group, results):
            lat = now - r.t_enqueue
            with self._lock:
                self._stats["latency_sum"] += lat
                self._stats["latency_max"] = max(
                    self._stats["latency_max"], lat)
            # a client-cancelled future must not poison its batchmates
            if r.future.set_running_or_notify_cancel():
                r.future.set_result(result)
