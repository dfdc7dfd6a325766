"""Serialized render artifacts: the deployment path.

The reference ships inference as "clone the repo + torch checkpoints +
rebuild every module in demo.py" (ref:demo.py:54-95).  The TPU-native
deployment unit here is a single portable file holding the COMPILED render
program (StableHLO via ``jax.export``, versioned and platform-checked) plus
the converted weights — a serving host loads it and renders without model
definitions, checkpoint converters, or config files, and with zero retrace
risk (the program is frozen at export time).

Artifact layout (one ``zipfile``):

- ``meta.json``    — format version, options, input/output specs, platforms
- ``programs/NxT.bin`` — ``jax.export`` serialization of the batched render
  program at identity-batch N and padded clip length T (one entry per
  exported shape bucket; the loader picks the smallest bucket that fits)
- ``vars.npz``     — flattened model variables (nested dicts of arrays,
  keys joined with '|')

The exported function is ``EammPipeline._batch_render_impl``
(vars, sources [N,256,256,3] f32, mfcc windows [N,T,28,12], pose [N,T,6])
-> uint8 frames [N,T,256,256,3] (or yuv420 planes, per pipeline options) —
the serving hot path.  Audio -> MFCC windows and pose preparation stay
host-side (`RenderArtifact.render_uint8` wraps them).
"""
from __future__ import annotations

import io
import json
import os
import zipfile

import numpy as np

FORMAT_VERSION = 1


def _flatten_vars(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}|{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_vars(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _pad_time(mfcc_windows, pose, t: int, tp: int):
    """Zero-pad [T,...] windows/pose up to the bucket length Tp."""
    win = np.zeros((tp, 28, 12), np.float32)
    win[:t] = mfcc_windows
    pos = np.zeros((tp, 6), np.float32)
    pos[:t] = pose
    return win, pos


def _unflatten_vars(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("|")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def export_render_artifact(pipeline, path: str, batch: int = 1,
                           frame_buckets=(128,), platforms=None,
                           emotional: bool = False,
                           emo_frame_buckets=(32,),
                           stream_segments: int = 0,
                           unbounded_frames: int = 0) -> dict:
    """Export ``pipeline``'s batched render program + weights to ``path``.

    batch: identity-batch size N of the exported program.
    frame_buckets: padded clip lengths (frames) to export, one program per
      bucket; each must be a multiple of the pipeline's chunk bucketing.
    platforms: jax.export lowering platforms, e.g. ("tpu",) or
      ("tpu", "cpu").  Default: the current backend only.  Cross-platform
      lowering does not require the target device to be attached, but the
      Pallas warp kernel only lowers for TPU — exports that include "cpu"
      must use a pipeline with ``pallas_warp=False``.
    emotional: also export single-clip emotional render programs (one per
      clip-length x emotion-frame-count bucket pair) — the full add_emo
      path (ref:demo.py:512) with an explicit timestep->frame index so the
      emotion-frame axis pads to ``emo_frame_buckets`` without changing the
      cycling semantics.  Emotional requests are singletons (their delivery
      cadence can't share a coalesced batch — same policy as RenderServer).
    emo_frame_buckets: padded UNIQUE-emotion-frame counts to export.
    stream_segments: when > 0, additionally export SINGLE-clip streaming
      programs: one kp-stage program per clip-length bucket (plus one per
      emotion bucket pair when ``emotional``) and one segment-decode
      program per bucket.  ``RenderArtifact.render_stream`` then delivers
      the clip in ``stream_segments`` in-order segments while the chip
      renders the tail — the live pipeline's ``overlap_segments``
      time-to-first-frame story, frozen (ref: the reference writes the
      whole mp4 at the end, ref:demo.py:477-515).  Every frame bucket must
      divide into ``stream_segments`` chunk-aligned segments.
    unbounded_frames: when > 0, additionally export the UNBOUNDED streaming
      chunk programs at this chunk size K (a multiple of the pipeline's
      frame_chunk): a prelude (source-only work, run once per clip), a
      first/next kp-chunk pair that threads the recurrent state (LSTM
      carry, one-euro filters, first-frame kp) between dispatches, and a
      K-frame render-segment program.  ONE frozen program set then serves
      ANY clip length with O(K) device memory and zero compiles —
      ``RenderArtifact.render_stream_unbounded`` drives it, and
      ``ArtifactPipeline`` routes clips longer than the artifact's
      ``stream_policy_frames`` (or its largest whole-clip bucket) through
      it automatically.  The live-pipeline equivalent is
      ``PipelineOptions.segment_frames``; the reference buffers the whole
      clip and degrades linearly with length (ref:demo.py:212-281,477-515).

    Returns the meta dict written into the artifact.
    """
    import functools
    import jax.numpy as jnp
    import jax
    from jax import export as jex

    o = pipeline.options
    if platforms is None:
        platforms = (jax.default_backend(),)
    platforms = tuple(platforms)
    if "cpu" in platforms and o.pallas_warp:
        raise ValueError(
            "pallas_warp pipelines cannot lower for the cpu platform; "
            "export with platforms=('tpu',) or pallas_warp=False")

    chunk = pipeline._batch_chunk(batch)
    for t in frame_buckets:
        if t % chunk:
            raise ValueError(f"frame bucket {t} is not a multiple of the "
                             f"render chunk {chunk} at batch {batch}")
    if emotional:
        for t in frame_buckets:
            if t % o.frame_chunk:
                raise ValueError(
                    f"frame bucket {t} is not a multiple of the single-clip "
                    f"render chunk {o.frame_chunk} (emotional programs)")
    if stream_segments:
        for t in frame_buckets:
            if t % (o.frame_chunk * stream_segments):
                raise ValueError(
                    f"frame bucket {t} does not divide into "
                    f"{stream_segments} segments of whole render chunks "
                    f"(chunk {o.frame_chunk})")
    if unbounded_frames and unbounded_frames % o.frame_chunk:
        raise ValueError(f"unbounded_frames {unbounded_frames} is not a "
                         f"multiple of the render chunk {o.frame_chunk}")

    vars_np = _flatten_vars(pipeline.vars)
    meta = {
        "format_version": FORMAT_VERSION,
        "batch": int(batch),
        "frame_buckets": [int(t) for t in frame_buckets],
        "platforms": list(platforms),
        "transfer_format": o.transfer_format,
        "compute_dtype": np.dtype(o.compute_dtype).name
        if o.compute_dtype is not None else "float32",
        "smooth_pose": bool(o.smooth_pose),
        "frame_chunk": int(chunk),
        "inputs": "sources [N,256,256,3] f32 in [0,1]; "
                  "mfcc_windows [N,T,28,12] f32; pose [N,T,6] f32",
        "outputs": "uint8 frames [N,T,256,256,3]"
        if o.transfer_format == "rgb" else
        "uint8 yuv420 planes (y [N,T,256,256], u/v [N,T,128,128])",
        "emotional": {
            "frame_buckets": [int(t) for t in frame_buckets],
            "emo_frame_buckets": [int(u) for u in emo_frame_buckets],
            "emo_type": o.emo_type,
            # the live yuv420 (lossy-delivery) path uploads emotion frames
            # as PACKED yuv420 planes ([U, 384, 256] uint8, 12 bpp — half
            # the uint8-RGB bytes on the tunnel, round 5); the frozen
            # program is traced with the same format so artifact rendering
            # matches the live path bit for bit.  Legacy "uint8" artifacts
            # (rank-4 RGB) keep loading.
            "frames_dtype": "yuv420"
            if o.transfer_format == "yuv420" else "float32",
            "inputs": "source [1,256,256,3] f32; mfcc_windows [T,28,12] "
                      "f32; pose [T,6] f32; emotion_frames "
                      "[U,384,256] u8 packed yuv420 or [U,256,256,3] of "
                      "frames_dtype (mouth-masked, aligned); "
                      "frame_index [T] i32",
        } if emotional else None,
        "streaming": {
            "segments": int(stream_segments),
            "fetch_streams": int(max(1, o.fetch_streams)),
            "frame_buckets": [int(t) for t in frame_buckets],
            "emotional": bool(emotional),
        } if stream_segments else None,
        "unbounded": {
            "segment_frames": int(unbounded_frames),
            "fetch_streams": int(max(1, o.fetch_streams)),
            "emotional": bool(emotional),
            "emo_frame_buckets": [int(u) for u in emo_frame_buckets]
            if emotional else [],
            "frames_dtype": "yuv420"
            if o.transfer_format == "yuv420" else "float32",
            # length policy for ArtifactPipeline: clips at most this many
            # frames keep the whole-clip bucketed programs (when a bucket
            # fits), longer ones take the chunk programs
            "stream_policy_frames": o.stream_policy_frames,
        } if unbounded_frames else None,
    }

    def make_args(t):
        return (pipeline.vars,
                np.zeros((batch, 256, 256, 3), np.float32),
                np.zeros((batch, t, 28, 12), np.float32),
                np.zeros((batch, t, 6), np.float32))

    yuv_emo = o.transfer_format == "yuv420"
    emo_dtype = np.uint8 if yuv_emo else np.float32

    def emo_shape(u):
        # yuv pipelines consume PACKED yuv420 planes (12 bpp); rgb keeps f32
        return (u, 384, 256) if yuv_emo else (u, 256, 256, 3)
    # Write to a temp file and rename into place once every program has
    # exported: a failure mid-way (e.g. a later bucket's lowering error)
    # must not leave a valid-looking but incomplete artifact at ``path``
    # that only fails at load time on the serving host.
    tmp = path + ".tmp"
    try:
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("meta.json", json.dumps(meta, indent=1))
            buf = io.BytesIO()
            np.savez(buf, **vars_np)
            z.writestr("vars.npz", buf.getvalue())
            for t in frame_buckets:
                exp = jex.export(jax.jit(pipeline._batch_render_impl),
                                 platforms=platforms)(*make_args(t))
                z.writestr(f"programs/{batch}x{t}.bin", exp.serialize())
            if emotional:
                for t in frame_buckets:
                    for u in emo_frame_buckets:
                        exp = jex.export(
                            jax.jit(pipeline._emo_render_from_windows_impl),
                            platforms=platforms)(
                            pipeline.vars,
                            np.zeros((1, 256, 256, 3), np.float32),
                            np.zeros((t, 28, 12), np.float32),
                            np.zeros((t, 6), np.float32),
                            np.zeros(emo_shape(u), emo_dtype),
                            np.zeros((t,), np.int32))
                        z.writestr(f"programs/emo_{t}x{u}.bin",
                                   exp.serialize())
            if stream_segments:
                src_s = jax.ShapeDtypeStruct((1, 256, 256, 3), jnp.float32)
                idx_s = jax.ShapeDtypeStruct((), jnp.int32)

                def kp_neutral(v, src, win, pos):
                    return pipeline._kp_stage_from_windows_impl(
                        v, src, win, pos,
                        jnp.zeros((1, 256, 256, 3), jnp.float32), None,
                        add_emo=False)

                def kp_emo(v, src, win, pos, ef, fi):
                    return pipeline._kp_stage_from_windows_impl(
                        v, src, win, pos, ef, fi, add_emo=True)

                for t in frame_buckets:
                    win_s = jax.ShapeDtypeStruct((t, 28, 12), jnp.float32)
                    pos_s = jax.ShapeDtypeStruct((t, 6), jnp.float32)
                    exp = jex.export(jax.jit(kp_neutral),
                                     platforms=platforms)(
                        pipeline.vars, src_s, win_s, pos_s)
                    z.writestr(f"programs/kp_{t}.bin", exp.serialize())
                    # the segment program is shared by the neutral and
                    # emotional paths: the kp-stage outputs have identical
                    # shapes either way
                    kv_s, kj_s, kps_s, feats_s = jax.eval_shape(
                        kp_neutral, pipeline.vars, src_s, win_s, pos_s)
                    seg_fn = functools.partial(
                        pipeline._render_segment_impl,
                        seg_frames=t // stream_segments)
                    exp = jex.export(jax.jit(seg_fn), platforms=platforms)(
                        pipeline.vars, src_s, feats_s, kps_s, kv_s, kj_s,
                        idx_s)
                    z.writestr(f"programs/seg_{t}.bin", exp.serialize())
                    if emotional:
                        for u in emo_frame_buckets:
                            ef_s = jax.ShapeDtypeStruct(
                                emo_shape(u), emo_dtype)
                            fi_s = jax.ShapeDtypeStruct((t,), jnp.int32)
                            exp = jex.export(jax.jit(kp_emo),
                                             platforms=platforms)(
                                pipeline.vars, src_s, win_s, pos_s, ef_s,
                                fi_s)
                            z.writestr(f"programs/kp_emo_{t}x{u}.bin",
                                       exp.serialize())
            if unbounded_frames:
                from eamm_tpu.ops.mfcc import chunk_samples_len
                K = int(unbounded_frames)
                src_s = jax.ShapeDtypeStruct((1, 256, 256, 3), jnp.float32)
                exp = jex.export(jax.jit(pipeline._stream_prelude_impl),
                                 platforms=platforms)(pipeline.vars, src_s)
                z.writestr("programs/u_prelude.bin", exp.serialize())
                kp_src_s, kps0_s, imgf_s, feats_s = jax.eval_shape(
                    pipeline._stream_prelude_impl, pipeline.vars, src_s)
                samp_s = jax.ShapeDtypeStruct((chunk_samples_len(K),),
                                              jnp.float32)
                prev_s = jax.ShapeDtypeStruct((), jnp.float32)
                pos_s = jax.ShapeDtypeStruct((K, 6), jnp.float32)
                fidx_s = jax.ShapeDtypeStruct((K,), jnp.int32)

                def u_chunk(first, add_emo):
                    # first chunks build the carry in-program; later chunks
                    # take it as an input — two exported programs per path
                    if first:
                        def fn(v, kp_src, imgf, samples, prev, pose, emo,
                               fidx):
                            return pipeline._stream_kp_chunk_impl(
                                v, kp_src, imgf, samples, prev, pose, emo,
                                fidx, None, first=True, add_emo=add_emo)
                    else:
                        def fn(v, kp_src, imgf, samples, prev, pose, emo,
                               fidx, carry):
                            return pipeline._stream_kp_chunk_impl(
                                v, kp_src, imgf, samples, prev, pose, emo,
                                fidx, carry, first=False, add_emo=add_emo)
                    return fn

                def export_chunk_pair(tag, emo_s, add_emo):
                    f_first = u_chunk(True, add_emo)
                    args = (pipeline.vars, kp_src_s, imgf_s, samp_s, prev_s,
                            pos_s, emo_s, fidx_s)
                    exp = jex.export(jax.jit(f_first),
                                     platforms=platforms)(*args)
                    z.writestr(f"programs/u_kp_{tag}first.bin",
                               exp.serialize())
                    kv_s, kj_s, carry_s = jax.eval_shape(f_first, *args)
                    exp = jex.export(jax.jit(u_chunk(False, add_emo)),
                                     platforms=platforms)(*args, carry_s)
                    z.writestr(f"programs/u_kp_{tag}next.bin",
                               exp.serialize())
                    return kv_s, kj_s

                neutral_emo_s = jax.ShapeDtypeStruct((1, 256, 256, 3),
                                                     jnp.float32)
                kv_s, kj_s = export_chunk_pair("", neutral_emo_s, False)
                if emotional:
                    for u in emo_frame_buckets:
                        export_chunk_pair(
                            f"emo{u}_",
                            jax.ShapeDtypeStruct(emo_shape(u),
                                                 emo_dtype), True)
                useg = functools.partial(pipeline._render_segment_impl,
                                         seg_frames=K)
                exp = jex.export(jax.jit(useg), platforms=platforms)(
                    pipeline.vars, src_s, feats_s, kps0_s, kv_s, kj_s,
                    jax.ShapeDtypeStruct((), jnp.int32))
                z.writestr("programs/u_seg.bin", exp.serialize())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return meta


class RenderArtifact:
    """A loaded render artifact: frozen program(s) + weights.

    ``load`` needs only jax + numpy (no model code, converters, or config).
    """

    def __init__(self, meta: dict, programs: dict, variables: dict,
                 emo_programs: dict | None = None,
                 stream_programs: dict | None = None,
                 unbounded_programs: dict | None = None):
        self.meta = meta
        self._programs = programs          # {padded_frames: Exported}
        self._emo_programs = emo_programs or {}   # {(T, U): Exported}
        # {"kp": {T: Exported}, "seg": {T: Exported},
        #  "kp_emo": {(T, U): Exported}}
        self._stream = stream_programs or {}
        # {"prelude", "kp_first", "kp_next", "seg",
        #  ("kp_emo_first", U), ("kp_emo_next", U)} -> Exported
        self._unbounded = unbounded_programs or {}
        self.vars = variables
        self.batch = int(meta["batch"])
        self.frame_buckets = sorted(int(t) for t in meta["frame_buckets"])

    @classmethod
    def load(cls, path: str) -> "RenderArtifact":
        from jax import export as jex
        with zipfile.ZipFile(path) as z:
            meta = json.loads(z.read("meta.json"))
            if meta["format_version"] > FORMAT_VERSION:
                raise ValueError(
                    f"artifact format {meta['format_version']} is newer "
                    f"than this loader ({FORMAT_VERSION})")
            flat = dict(np.load(io.BytesIO(z.read("vars.npz"))))
            programs = {}
            for t in meta["frame_buckets"]:
                name = f"programs/{meta['batch']}x{t}.bin"
                programs[int(t)] = jex.deserialize(z.read(name))
            emo_programs = {}
            emo = meta.get("emotional")
            if emo:
                for t in emo["frame_buckets"]:
                    for u in emo["emo_frame_buckets"]:
                        emo_programs[(int(t), int(u))] = jex.deserialize(
                            z.read(f"programs/emo_{t}x{u}.bin"))
            stream_programs = {}
            stream = meta.get("streaming")
            if stream:
                stream_programs = {"kp": {}, "seg": {}, "kp_emo": {}}
                for t in stream["frame_buckets"]:
                    stream_programs["kp"][int(t)] = jex.deserialize(
                        z.read(f"programs/kp_{t}.bin"))
                    stream_programs["seg"][int(t)] = jex.deserialize(
                        z.read(f"programs/seg_{t}.bin"))
                    if stream["emotional"]:
                        for u in emo["emo_frame_buckets"]:
                            stream_programs["kp_emo"][(int(t), int(u))] = \
                                jex.deserialize(
                                    z.read(f"programs/kp_emo_{t}x{u}.bin"))
            unbounded_programs = {}
            ub = meta.get("unbounded")
            if ub:
                for key, name in (("prelude", "u_prelude"),
                                  ("kp_first", "u_kp_first"),
                                  ("kp_next", "u_kp_next"),
                                  ("seg", "u_seg")):
                    unbounded_programs[key] = jex.deserialize(
                        z.read(f"programs/{name}.bin"))
                if ub["emotional"]:
                    for u in ub["emo_frame_buckets"]:
                        for key in ("first", "next"):
                            unbounded_programs[(f"kp_emo_{key}", int(u))] = \
                                jex.deserialize(z.read(
                                    f"programs/u_kp_emo{u}_{key}.bin"))
        return cls(meta, programs, _unflatten_vars(flat), emo_programs,
                   stream_programs, unbounded_programs)

    def bucket_for(self, frames: int) -> int:
        for t in self.frame_buckets:
            if frames <= t:
                return t
        raise ValueError(f"clip of {frames} frames exceeds the largest "
                         f"exported bucket ({self.frame_buckets[-1]})")

    def render(self, sources: np.ndarray, mfcc_windows: np.ndarray,
               pose: np.ndarray):
        """Run the frozen program on already-prepared inputs.

        Inputs must match the exported batch; the time axis pads up to the
        matching bucket.  Returns the program output (uint8 frames, or
        yuv420 planes when exported with transfer_format='yuv420') — callers
        trim padding with the returned slice length.
        """
        n, t = mfcc_windows.shape[:2]
        if n != self.batch:
            raise ValueError(f"artifact was exported at batch "
                             f"{self.batch}, got {n}")
        tp = self.bucket_for(t)
        if tp != t:
            mfcc_windows = np.pad(mfcc_windows,
                                  ((0, 0), (0, tp - t), (0, 0), (0, 0)))
            pose = np.pad(pose, ((0, 0), (0, tp - t), (0, 0)))
        out = self._programs[tp].call(self.vars,
                                      np.asarray(sources, np.float32),
                                      mfcc_windows.astype(np.float32),
                                      pose.astype(np.float32))
        return out, t

    def render_emotional(self, source: np.ndarray, mfcc_windows: np.ndarray,
                         pose: np.ndarray, emotion_frames: np.ndarray):
        """Run the frozen emotional program on prepared inputs.

        source [256,256,3] (or [1,256,256,3]); mfcc_windows [T,28,12];
        pose [T,6]; emotion_frames [U,256,256,3] f32 mouth-masked aligned
        unique frames (the program cycles them over the clip,
        ref:demo.py:499-500).  Returns (program output, delivered T).
        """
        if not self._emo_programs:
            raise ValueError("artifact was exported without emotional "
                             "programs (export with emotional=True)")
        t = mfcc_windows.shape[0]
        tp = self.bucket_for(t)
        frames, frame_index, up = self._emo_inputs(tp, emotion_frames)
        win, pos = _pad_time(mfcc_windows, pose, t, tp)
        out = self._emo_programs[(tp, up)].call(
            self.vars, np.asarray(source, np.float32).reshape(1, 256, 256, 3),
            win, pos, frames, frame_index)
        return out, t

    def _emo_inputs(self, tp: int, emotion_frames):
        """Pad the unique emotion frames to an exported bucket and build
        the explicit timestep -> frame index.  Returns (frames [Up,...] of
        the exported dtype, frame_index [Tp] i32, Up)."""
        u = min(np.asarray(emotion_frames).shape[0], tp)  # frames past Tp
        ubuckets = sorted(self.meta["emotional"]["emo_frame_buckets"])
        up = next((b for b in ubuckets if u <= b), None)
        if up is None:
            raise ValueError(f"{u} emotion frames exceed the largest "
                             f"exported bucket ({ubuckets[-1]})")
        frame_index = (np.arange(tp) % u).astype(np.int32)
        ef = np.asarray(emotion_frames, np.float32)[:u]
        return (self._emo_frames_padded(ef, u, up,
                                        self.meta["emotional"]
                                        .get("frames_dtype")),
                frame_index, up)

    @staticmethod
    def _emo_frames_padded(ef, u: int, up: int, frames_dtype):
        """Pad unique emotion frames to the exported bucket in the traced
        upload format: "yuv420" = packed planes [Up, 384, 256] uint8 (the
        live lossy-delivery path's 12 bpp upload), "uint8" = legacy rank-4
        RGB uint8, else float32 RGB."""
        if frames_dtype == "yuv420":
            from eamm_tpu.ops.colorspace import pack_yuv420_np
            frames = np.zeros((up, 384, 256), np.uint8)
            # neutral gray padding rows are never indexed (frame_index
            # cycles the true u frames)
            frames[:u] = pack_yuv420_np(ef)
            return frames
        if frames_dtype == "uint8":
            frames = np.zeros((up, 256, 256, 3), np.uint8)
            frames[:u] = np.clip(np.rint(ef * 255.0), 0, 255)
            return frames
        frames = np.zeros((up, 256, 256, 3), np.float32)
        frames[:u] = ef
        return frames

    def render_stream(self, source, waveform, pose, emotion_frames=None):
        """Streaming render from the frozen programs: yields
        ``(start_frame, payload)`` in clip order, payload uint8 RGB frames
        or yuv420 planes per the artifact's transfer format — the live
        pipeline's ``render_stream`` contract.  Every segment dispatch is
        issued before the first fetch, so segment i's device->host
        transfer overlaps segment i+1's compute; time-to-first-frame is
        ~1/segments of the whole clip.  Requires a ``stream_segments``
        export; concatenating the payloads equals the whole-clip render."""
        stream = self.meta.get("streaming")
        if not stream:
            raise ValueError("artifact was exported without streaming "
                             "programs (export with stream_segments=N)")
        from eamm_tpu.utils.transfer import fetch_parallel
        win, pos = self._prepare_single(waveform, pose)
        t = win.shape[0]
        tp = next((b for b in sorted(stream["frame_buckets"]) if t <= b),
                  None)
        if tp is None:
            raise ValueError(f"clip of {t} frames exceeds the largest "
                             f"streaming bucket "
                             f"({max(stream['frame_buckets'])})")
        win, pos = _pad_time(win, pos, t, tp)
        src = np.asarray(source, np.float32).reshape(1, 256, 256, 3)
        if emotion_frames is None:
            kv, kj, kp_s, feats = self._stream["kp"][tp].call(
                self.vars, src, win, pos)
        else:
            if not stream["emotional"]:
                raise ValueError("artifact was exported without emotional "
                                 "streaming programs")
            frames, frame_index, up = self._emo_inputs(tp, emotion_frames)
            kv, kj, kp_s, feats = self._stream["kp_emo"][(tp, up)].call(
                self.vars, src, win, pos, frames, frame_index)
        s = int(stream["segments"])
        tseg = tp // s
        seg = self._stream["seg"][tp]
        # issue every segment before any fetch (in-order device queue:
        # fetches then ride alongside later segments' compute)
        parts_list = [seg.call(self.vars, src, feats, kp_s, kv, kj,
                               np.int32(i)) for i in range(s)]
        yuv = self.meta["transfer_format"] == "yuv420"
        ns = int(stream["fetch_streams"])
        ny = max(1, (2 * ns) // 3) if yuv else ns
        for i, parts in enumerate(parts_list):
            keep = min(tseg, max(0, t - i * tseg))
            if keep <= 0:
                break
            fetched = fetch_parallel(list(parts))
            if yuv:
                y = np.concatenate(fetched[:ny], axis=0)[:keep]
                yield i * tseg, (y, fetched[ny][:keep],
                                 fetched[ny + 1][:keep])
            else:
                yield i * tseg, np.concatenate(fetched, axis=0)[:keep]

    def render_stream_unbounded(self, source, waveform, pose,
                                emotion_frames=None):
        """Unbounded streaming from the frozen chunk programs: yields
        ``(start_frame, payload)`` for a clip of ANY length — one prelude
        dispatch, then a kp-chunk + render-segment dispatch pair per K
        frames with the recurrent state threaded between calls.  Zero
        compiles (the programs are frozen), O(K) device memory, host
        memory bounded by the two in-flight segments.  Mirrors the live
        ``EammPipeline._render_stream_unbounded`` driver; requires an
        ``unbounded_frames`` export."""
        ub = self.meta.get("unbounded")
        if not ub:
            raise ValueError("artifact was exported without unbounded "
                             "streaming programs (export with "
                             "unbounded_frames=K)")
        import math
        from eamm_tpu.ops.mfcc import (chunk_samples_len, chunk_sample_start,
                                       padded_buffer_len, PAD_SAMPLES,
                                       num_windows_for_samples)
        from eamm_tpu.infer.pipeline import prepare_pose_np
        K = int(ub["segment_frames"])
        wav = np.asarray(waveform, np.float32).reshape(-1)
        T = num_windows_for_samples(wav.shape[0])
        n_chunks = max(1, math.ceil(T / K))
        buf_len = max(padded_buffer_len(n_chunks * K),
                      2 * PAD_SAMPLES + wav.shape[0])
        buf = np.zeros(buf_len, np.float32)
        buf[PAD_SAMPLES:PAD_SAMPLES + wav.shape[0]] = wav
        pose_full = np.zeros((n_chunks * K, 6), np.float32)
        pose_full[:T] = prepare_pose_np(
            np.asarray(pose, np.float32), T,
            smooth=self.meta.get("smooth_pose", True))
        src = np.asarray(source, np.float32).reshape(1, 256, 256, 3)
        kp_src, kp_s0, imgf, feats = self._unbounded["prelude"].call(
            self.vars, src)

        fidx_mod = 1
        emo_arg = np.zeros((1, 256, 256, 3), np.float32)
        first_key, next_key = "kp_first", "kp_next"
        if emotion_frames is not None:
            if not ub["emotional"]:
                raise ValueError("artifact was exported without emotional "
                                 "unbounded programs")
            ef = np.asarray(emotion_frames, np.float32)
            u = ef.shape[0]
            ubuckets = sorted(ub["emo_frame_buckets"])
            up = next((b for b in ubuckets if u <= b), None)
            if up is None:
                raise ValueError(f"{u} emotion frames exceed the largest "
                                 f"exported bucket ({ubuckets[-1]})")
            emo_arg = self._emo_frames_padded(ef, u, up,
                                              ub.get("frames_dtype"))
            fidx_mod = u
            first_key, next_key = ("kp_emo_first", up), ("kp_emo_next", up)

        yuv = self.meta["transfer_format"] == "yuv420"
        ns = int(ub["fetch_streams"])
        ny = max(1, (2 * ns) // 3) if yuv else ns
        carry = None
        pending = []
        for c in range(n_chunks):
            s0 = chunk_sample_start(c * K)
            samples = np.ascontiguousarray(buf[s0:s0 + chunk_samples_len(K)])
            prev = np.float32(buf[s0 - 1] if s0 else 0.0)
            pose_c = np.ascontiguousarray(pose_full[c * K:(c + 1) * K])
            fidx = (np.arange(c * K, (c + 1) * K) % fidx_mod).astype(np.int32)
            if c == 0:
                kv, kj, carry = self._unbounded[first_key].call(
                    self.vars, kp_src, imgf, samples, prev, pose_c, emo_arg,
                    fidx)
            else:
                kv, kj, carry = self._unbounded[next_key].call(
                    self.vars, kp_src, imgf, samples, prev, pose_c, emo_arg,
                    fidx, carry)
            parts = self._unbounded["seg"].call(self.vars, src, feats,
                                                kp_s0, kv, kj, np.int32(0))
            pending.append((c * K, min(K, T - c * K), list(parts)))
            if len(pending) > 2:
                yield self._fetch_unbounded_item(pending.pop(0), ny, yuv)
        for item in pending:
            yield self._fetch_unbounded_item(item, ny, yuv)

    @staticmethod
    def _fetch_unbounded_item(item, ny, yuv):
        from eamm_tpu.utils.transfer import fetch_parallel
        start, keep, parts = item
        fetched = fetch_parallel(parts)
        if yuv:
            y = np.concatenate(fetched[:ny], axis=0)[:keep]
            return start, (y, fetched[ny][:keep], fetched[ny + 1][:keep])
        return start, np.concatenate(fetched, axis=0)[:keep]

    def _prepare_single(self, waveform, pose):
        from eamm_tpu.infer.pipeline import (_jit_audio_windows,
                                             prepare_pose_np)
        win = np.asarray(_jit_audio_windows(np.asarray(waveform, np.float32)))
        pos = prepare_pose_np(np.asarray(pose, np.float32), win.shape[0],
                              smooth=self.meta.get("smooth_pose", True))
        return win, pos

    def render_replicated(self, source, waveform, pose):
        """One request replicated to the exported batch: the host-side
        windows/pose prep runs ONCE and the arrays broadcast, instead of
        preparing ``batch`` identical copies (the host has one core; per-
        copy MFCC dispatch + one-euro filtering dominates singleton prep).
        Returns (program output, delivered T)."""
        win, pos = self._prepare_single(waveform, pose)
        n = self.batch
        sources = np.broadcast_to(
            np.asarray(source, np.float32).reshape(256, 256, 3),
            (n, 256, 256, 3))
        return self.render(sources, np.broadcast_to(win, (n,) + win.shape),
                           np.broadcast_to(pos, (n,) + pos.shape))

    def render_emotional_uint8(self, source, waveform, pose,
                               emotion_frames) -> np.ndarray:
        """Full emotional convenience path: raw waveform + raw pose ->
        delivered uint8 frames [T, 256, 256, 3] (rgb artifacts only)."""
        if self.meta["transfer_format"] != "rgb":
            raise ValueError("render_emotional_uint8 requires an rgb-format "
                             "artifact")
        win, pos = self._prepare_single(waveform, pose)
        out, t = self.render_emotional(source, win, pos, emotion_frames)
        return np.asarray(out)[:t]

    def render_emotional_yuv420(self, source, waveform, pose,
                                emotion_frames):
        """Emotional convenience path for yuv420 artifacts: delivered
        planes (y [T, 256, 256], u/v [T, 128, 128]) uint8."""
        if self.meta["transfer_format"] != "yuv420":
            raise ValueError("render_emotional_yuv420 requires a "
                             "yuv420-format artifact")
        win, pos = self._prepare_single(waveform, pose)
        (y, u, v), t = self.render_emotional(source, win, pos,
                                             emotion_frames)
        return np.asarray(y)[:t], np.asarray(u)[:t], np.asarray(v)[:t]

    def _prepare_batch(self, waveforms, poses):
        """Host-side prep shared by the convenience paths: raw waveforms ->
        padded MFCC windows [N, T, 28, 12] + prepared pose [N, T, 6]."""
        from eamm_tpu.infer.pipeline import (_jit_audio_windows,
                                             prepare_pose_np)
        windows = [np.asarray(_jit_audio_windows(np.asarray(w, np.float32)))
                   for w in waveforms]
        t = max(w.shape[0] for w in windows)
        n = len(windows)
        win = np.zeros((n, t, 28, 12), np.float32)
        pos = np.zeros((n, t, 6), np.float32)
        for i, w in enumerate(windows):
            win[i, :w.shape[0]] = w
            pos[i, :w.shape[0]] = prepare_pose_np(
                np.asarray(poses[i], np.float32), w.shape[0],
                smooth=self.meta.get("smooth_pose", True))
        return win, pos

    def render_uint8(self, sources, waveforms, poses) -> np.ndarray:
        """Full convenience path: raw waveforms -> delivered uint8 frames
        [N, T, 256, 256, 3] (host-side MFCC windows + pose preparation,
        then the frozen program; rgb artifacts only)."""
        if self.meta["transfer_format"] != "rgb":
            raise ValueError("render_uint8 requires an rgb-format artifact")
        win, pos = self._prepare_batch(waveforms, poses)
        out, t = self.render(np.asarray(sources, np.float32), win, pos)
        return np.asarray(out)[:, :t]

    def render_yuv420(self, sources, waveforms, poses):
        """Convenience path for yuv420 artifacts: raw waveforms ->
        delivered planes (y [N, T, 256, 256], u/v [N, T, 128, 128])."""
        if self.meta["transfer_format"] != "yuv420":
            raise ValueError("render_yuv420 requires a yuv420-format "
                             "artifact")
        win, pos = self._prepare_batch(waveforms, poses)
        (y, u, v), t = self.render(np.asarray(sources, np.float32), win, pos)
        return (np.asarray(y)[:, :t], np.asarray(u)[:, :t],
                np.asarray(v)[:, :t])


class ArtifactPipeline:
    """``RenderServer``-compatible adapter over a frozen artifact:
    ``eamm-serve --artifact model.eammx`` serves with no model code,
    checkpoint converters, or config — the deployment host ships one file.

    Semantics vs the live ``EammPipeline``:
    - coalesced neutral batches run the frozen batched program; the
      server's ``max_batch`` must equal the artifact's exported batch
      (the server pads short groups up to it);
    - emotional singletons run the frozen emotional program (requires an
      ``--emotional`` export);
    - streaming requests run the frozen kp-stage + segment programs when
      the artifact was exported with ``stream_segments`` (real in-order
      early delivery); otherwise they degrade to ONE whole-clip segment —
      same payload contract, no early frames.
    """

    def __init__(self, artifact: RenderArtifact):
        from eamm_tpu.infer.pipeline import PipelineOptions
        self.artifact = artifact
        self.options = PipelineOptions(
            add_emo=bool(artifact.meta.get("emotional")),
            transfer_format=artifact.meta["transfer_format"],
            smooth_pose=bool(artifact.meta.get("smooth_pose", True)))

    def use_unbounded(self, frames: int) -> bool:
        """Length policy (the ``RenderServer`` singleton hook): clips
        longer than the artifact's ``stream_policy_frames`` — or than its
        largest whole-clip bucket — render through the frozen unbounded
        chunk programs when those were exported."""
        ub = self.artifact.meta.get("unbounded")
        if not ub:
            return False
        max_bucket = max(self.artifact.frame_buckets)
        pol = ub.get("stream_policy_frames")
        return frames > min(max_bucket,
                            max_bucket if pol is None else int(pol))

    def _frames_for(self, waveform) -> int:
        from eamm_tpu.ops.mfcc import num_windows_for_samples
        return num_windows_for_samples(
            np.asarray(waveform).reshape(-1).shape[0])

    # --- coalesced batches (the server pads groups to max_batch) --------

    def render_batch_uint8(self, sources, waveforms, poses):
        return self.artifact.render_uint8(sources, waveforms, poses)

    def render_batch_yuv420(self, sources, waveforms, poses):
        return self.artifact.render_yuv420(sources, waveforms, poses)

    # --- singleton dispatches (the server's emotional path) -------------

    def render_uint8(self, source, waveform, pose, transformed_video=None,
                     add_emo=None):
        if self.options.transfer_format != "rgb":
            raise ValueError("render_uint8 requires an rgb-format artifact")
        add_emo = self.options.add_emo if add_emo is None else add_emo
        if self.use_unbounded(self._frames_for(waveform)):
            if add_emo and transformed_video is None:
                raise ValueError("add_emo requires transformed_video frames")
            return np.concatenate(
                [p for _, p in self.artifact.render_stream_unbounded(
                    source, waveform, pose,
                    transformed_video if add_emo else None)], axis=0)
        if add_emo:
            if transformed_video is None:
                raise ValueError("add_emo requires transformed_video frames")
            return self.artifact.render_emotional_uint8(
                source, waveform, pose, transformed_video)
        out, t = self.artifact.render_replicated(source, waveform, pose)
        return np.asarray(out)[0, :t]

    def render_yuv420(self, source, waveform, pose, transformed_video=None,
                      add_emo=None):
        if self.options.transfer_format != "yuv420":
            raise ValueError("render_yuv420 requires a yuv420-format "
                             "artifact")
        add_emo = self.options.add_emo if add_emo is None else add_emo
        if self.use_unbounded(self._frames_for(waveform)):
            if add_emo and transformed_video is None:
                raise ValueError("add_emo requires transformed_video frames")
            parts = [p for _, p in self.artifact.render_stream_unbounded(
                source, waveform, pose,
                transformed_video if add_emo else None)]
            return (np.concatenate([y for y, _, _ in parts], axis=0),
                    np.concatenate([u for _, u, _ in parts], axis=0),
                    np.concatenate([v for _, _, v in parts], axis=0))
        if add_emo:
            if transformed_video is None:
                raise ValueError("add_emo requires transformed_video frames")
            return self.artifact.render_emotional_yuv420(
                source, waveform, pose, transformed_video)
        (y, u, v), t = self.artifact.render_replicated(source, waveform,
                                                       pose)
        return (np.asarray(y)[0, :t], np.asarray(u)[0, :t],
                np.asarray(v)[0, :t])

    def render_stream(self, source, waveform, pose, transformed_video=None,
                      add_emo=None):
        """Segment streaming via the frozen kp-stage + segment programs
        when exported (``stream_segments``); unbounded chunk streaming for
        clips past the length policy (``unbounded_frames`` exports);
        single whole-clip segment otherwise."""
        add_emo = self.options.add_emo if add_emo is None else add_emo
        if self.use_unbounded(self._frames_for(waveform)):
            if add_emo and transformed_video is None:
                raise ValueError("add_emo requires transformed_video frames")
            yield from self.artifact.render_stream_unbounded(
                source, waveform, pose,
                transformed_video if add_emo else None)
            return
        stream = self.artifact.meta.get("streaming")
        if stream and (not add_emo or stream["emotional"]):
            if add_emo and transformed_video is None:
                raise ValueError("add_emo requires transformed_video frames")
            yield from self.artifact.render_stream(
                source, waveform, pose,
                transformed_video if add_emo else None)
            return
        if self.options.transfer_format == "yuv420":
            yield 0, self.render_yuv420(source, waveform, pose,
                                        transformed_video, add_emo)
        else:
            yield 0, self.render_uint8(source, waveform, pose,
                                       transformed_video, add_emo)


