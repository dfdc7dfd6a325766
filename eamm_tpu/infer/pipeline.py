"""One-shot emotional talking-face inference pipeline.

Re-designs the reference demo flow (ref:demo.py:194-354,467-520) as three
fused, jitted stages instead of a frame-at-a-time Python loop with per-frame
GPU<->CPU filter round trips:

1. **audio stage** (sequential, cheap): raw waveform -> MFCC windows ->
   A2FD LSTM scan -> per-frame 35-ch feature maps -> audio keypoints for all
   frames (vmapped head) -> one-euro smoothing as a scan.  Optionally the
   emotion displacement branch (vmapped over frames) with its own filter.
2. **keypoint composition**: emotion deltas added to kp {1 (x0.2), 4, 6}
   (ref:demo.py:263-273), then relative-movement normalization.
3. **render stage** (parallel, heavy): source features encoded once, then
   the generator decoder runs over fixed-size frame chunks — vmapped into
   the batch axis and shardable across the TPU mesh ('data' axis), so a
   whole clip renders in a few big MXU-saturating dispatches.

Clip lengths are padded to buckets to avoid per-length recompilation (the
LSTM scan and one-euro filter are prefix-safe, so padded tails are simply
sliced off).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from eamm_tpu import config as cfg
from eamm_tpu.ops.mfcc import (audio_to_mfcc_windows, num_windows_for_samples,
                               min_samples_for_windows, mfcc_window_chunk)
from eamm_tpu.ops.filters import one_euro_filter, one_euro_filter_np
from eamm_tpu.ops.motion import normalize_kp, convex_hull_area
from eamm_tpu.ops.colorspace import (rgb_to_yuv420, yuv420_to_rgb,
                                     pack_yuv420_np, unpack_yuv420)
from eamm_tpu.utils.transfer import fetch_parallel


@dataclasses.dataclass
class PipelineOptions:
    relative: bool = False            # ref:demo.py:545,558 (default False)
    adapt_scale: bool = False
    add_emo: bool = True
    emo_type: str = "linear_3"        # demo --type (linear_3 -> 'linear' head)
    audio_weight: float = 1.6         # ref:demo.py:352
    smooth_pose: bool = True
    frame_chunk: int = 16             # frames per render dispatch
    time_bucket: int = 32             # clip-length padding granularity
    compute_dtype: Any = jnp.float32  # bfloat16 for speed on TPU
    # VMEM-resident two-level warp kernel for the generator bottleneck
    # (2.3x the XLA gather on v5e).  None = auto: on for TPU, off for CPU
    # (Pallas TPU kernels don't run on the CPU backend).
    pallas_warp: bool | None = None
    check_add: bool = False           # freeze audio kp at frame 0 (ref:demo.py:253-254)
    # "rgb": ship uint8 RGB frames (bit-exact path, used by parity tests).
    # "yuv420": convert to yuv420p on-device and ship 12 bpp — the mp4's
    # native pixel format, so zero added loss for the video product, and
    # half the bytes over the bandwidth-limited device->host link.
    transfer_format: str = "rgb"
    fetch_streams: int = 6            # concurrent device->host fetch streams
    # Pipelined delivery: split the clip render into this many equal segment
    # dispatches (after one cheap whole-clip keypoint dispatch) so the
    # device->host fetch of segment i overlaps the compute of segment i+1.
    # 1 = single whole-clip dispatch (the bit-exact default path).  The
    # segment programs run the identical ops in the identical order, so the
    # output is bitwise equal to the single-dispatch path
    # (test_overlap_matches_single_dispatch).
    overlap_segments: int = 1
    # Unbounded streaming (render_stream): process the clip in fixed-size
    # kp/render chunks of this many frames, threading the recurrent state
    # (LSTM, one-euro filters, first-frame kp) between chunk programs.  ONE
    # compiled program pair then serves ANY clip length — no whole-clip
    # buffering, no per-length recompile (the whole-clip paths instead
    # compile per time_bucket), O(chunk) host+device memory.  Must be a
    # multiple of frame_chunk.  The reference renders frame-at-a-time into
    # a whole-clip buffer and cannot stream at all (ref:demo.py:212-281).
    segment_frames: int | None = None
    # Length policy for the chunk programs: with BOTH segment_frames and
    # this set, clips of at most this many frames keep the whole-clip
    # bucketed programs (~2x faster on short clips: one kp dispatch + S
    # segment dispatches, measured stream_60s_vs_10s_same_programs ~2 in
    # BENCH_r04) while longer clips switch to the unbounded chunk programs
    # (ONE compiled program pair for ANY length, O(chunk) device memory).
    # The policy applies to render_stream AND the whole-clip renderers
    # (render_uint8 / render_yuv420 assemble long clips from the chunk
    # stream), so a server never compiles a per-length whole-clip bucket
    # for a long request.  segment_frames WITHOUT a policy keeps the
    # historical meaning: every render_stream call takes the chunk path.
    stream_policy_frames: int | None = None


_EMO_HEAD = {"linear_3": "linear", "linear_4": "linear_4",
             "linear_10": "linear_10", "linear_np_4": "linear_np_4",
             "linear_np_10": "linear_np_10", "map": "map", "map_4": "map_4"}


@dataclasses.dataclass
class EmotionHandle:
    """Device-resident emotion-clip state, reusable across renders.

    The emotional path's per-call overhead over neutral is NOT compute (the
    trunk adds ~6 ms on a v5e): it is the host->device upload of the emotion
    frames (uint8 256^2x3 ~ 192 KiB/frame through the ~30 MB/s tunnel) paid
    again on every render call.  In the product scenario the emotion clip is
    fixed while the audio varies (ref:demo.py:496-515 loads one emotion video
    per run; a style server reuses it across requests), so
    :meth:`EammPipeline.prepare_emotion` uploads once — and, for the linear
    heads, precomputes the [U, 512] trunk feature table so later renders
    contain no emotion pixels at all.  Pass the handle anywhere
    ``transformed_video`` is accepted.
    """
    frames: jax.Array            # device, in upload format: [U, 256, 256, 3]
                                 # f32 (rgb pipelines) or packed yuv420
                                 # planes [U, 384, 256] uint8 (yuv420)
    feats: jax.Array | None      # [Ub, 512] f32 trunk features (linear heads)
    n_frames: int                # true U (feats rows past this are padding)


def _bucket(n: int, b: int) -> int:
    return max(b, int(math.ceil(n / b)) * b)


# one shared jit wrapper: a fresh jax.jit(...) per call would carry a
# fresh trace cache and re-trace on every invocation
_jit_audio_windows = jax.jit(audio_to_mfcc_windows)


def prepare_pose_np(all_pose: np.ndarray, T: int,
                    smooth: bool = True) -> np.ndarray:
    """Host-side pose tiling / smoothing (ref:demo.py:297-341).

    Host numpy on purpose: a device dispatch for a [T,6] filter would cost
    a tunnel round trip on every render call.  Shared by the live pipeline
    and the frozen-artifact convenience paths (infer/export.py)."""
    pose = np.asarray(all_pose, np.float32).reshape(-1, 7)[:, :6]
    if len(pose) == 1:
        pose = np.repeat(pose, 100, 0)
    elif smooth:
        pose = one_euro_filter_np(pose, mincutoff=0.004, beta=0.7, freq=100)
    if len(pose) < T:
        gap = T - len(pose)
        n = int(gap / len(pose) / 2) + 2
        pose = np.concatenate([pose, pose[::-1, :]], axis=0)
        pose = np.tile(pose, (n, 1))
    return pose[:T]


class EammPipeline:
    """Holds models + variables and the jitted stage functions."""

    def __init__(self, config: dict, variables: dict,
                 options: PipelineOptions | None = None):
        """variables: {'generator': {'params':..., 'batch_stats':...},
        'kp_detector': ..., 'kp_detector_a': ..., 'audio_feature': ...,
        'emo_detector': ...}."""
        self.config = config
        self._batch_in_sharding = None           # set by use_mesh()
        self._time_mesh = None                   # set by use_mesh(time_shard=True)
        self.options = options or PipelineOptions()
        if self.options.pallas_warp is None:
            self.options = dataclasses.replace(
                self.options, pallas_warp=jax.default_backend() != "cpu")
        self.models = cfg.build_all(
            config, emotion_kind=self.options.emo_type.split("_")[0])
        self.vars = variables
        # jit the stages with variables as traced arguments (so weights are
        # device buffers, not baked-in constants).
        self._audio_kp_stage = jax.jit(self._audio_kp_stage_impl)
        self._emotion_stage = jax.jit(self._emotion_stage_impl)
        self._emo_feature = jax.jit(self._emo_feature_impl)
        self._compose_kp = jax.jit(self._compose_kp_impl)
        self._render_chunk = jax.jit(self._render_chunk_impl)
        # Whole-clip fused path: ONE dispatch per clip (the per-dispatch
        # latency of a remote/queued TPU runtime would otherwise dominate).
        self._full_render = jax.jit(
            self._full_render_impl,
            static_argnames=("add_emo", "emo_from_feats"))
        self._batch_render = jax.jit(self._batch_render_impl)
        # Overlapped delivery: one cheap kp-stage dispatch + S identical
        # render-segment dispatches whose fetch overlaps later compute.
        self._kp_stage = jax.jit(
            self._kp_stage_impl,
            static_argnames=("add_emo", "emo_from_feats"))
        # split cold-emotional kp stage: the emotion upload overlaps stage A
        self._kp_stage_a = jax.jit(self._kp_stage_a_impl)
        self._kp_stage_b = jax.jit(self._kp_stage_b_impl)
        # unbounded streaming chunk programs (segment_frames)
        self._stream_prelude = jax.jit(self._stream_prelude_impl)
        self._stream_kp_chunk = jax.jit(
            self._stream_kp_chunk_impl,
            static_argnames=("first", "add_emo", "emo_from_feats"))
        self._render_segment = jax.jit(self._render_segment_impl,
                                       static_argnames=("seg_frames",))
        self._batch_kp_stage = jax.jit(self._batch_kp_stage_impl)
        self._batch_render_segment = jax.jit(
            self._batch_render_segment_impl, static_argnames=("seg_frames",))

    # ------------------------------------------------------------ stages

    def _audio_kp_stage_impl(self, variables, source_image, mfcc_windows, pose):
        """-> (kp_source, kp_audio over T [T,...] smoothed, deco0 kp)."""
        o = self.options
        m, v = self.models, variables
        kp_source = m["kp_detector"].apply(v["kp_detector"], source_image)

        deco = m["audio_feature"].apply(
            v["audio_feature"], source_image, mfcc_windows[None], pose[None],
            audio_weight=o.audio_weight)[0]              # [T,64,64,35]
        # The audio kp head is stateless in eval: the frame axis IS the batch.
        kp_a = m["kp_detector_a"].apply(v["kp_detector_a"], deco)  # [T,...]
        kp_initial = {k: val[:1] for k, val in kp_a.items()}

        # One-euro smoothing of the whole trajectory (ref:demo.py:241-248).
        smoothed = {
            "value": one_euro_filter(kp_a["value"], mincutoff=0.05, beta=8.0,
                                     freq=100, scale=10.0),
            "jacobian": one_euro_filter(kp_a["jacobian"], mincutoff=0.05,
                                        beta=8.0, freq=100, scale=10.0),
        }
        return kp_source, smoothed, kp_initial, deco

    def _emotion_stage_impl(self, variables, transformed_frames, kp_value,
                            kp_jacobian, frame_index=None,
                            emo_from_feats: bool = False,
                            euro_carry=None, return_carry: bool = False):
        """Per-frame emotion displacements, smoothed (ref:demo.py:221-238).

        When ``frame_index`` is given, ``transformed_frames`` holds only the
        UNIQUE emotion frames and ``frame_index[t]`` maps timestep -> frame
        (the demo cycles a short emotion clip via np.resize,
        ref:demo.py:499-500): the heavy trunk (hourglass + ResNet at 256^2)
        runs once per unique frame and only the cheap keypoint-conditioned
        MLP heads run per timestep — the reference's own
        ``emotion_feature`` decomposition (ref:modules/util.py:1459-1475).

        With ``emo_from_feats`` (static), ``transformed_frames`` is instead
        the PRECOMPUTED [U, 512] trunk feature table from
        :meth:`prepare_emotion` — the 256^2 trunk never appears in the
        program and no emotion pixels cross the host->device link.
        """
        o = self.options
        m, v = self.models, variables
        head = _EMO_HEAD[o.emo_type]
        emo_model = m["emo_detector"]
        if emo_from_feats:
            feats = transformed_frames.astype(jnp.float32)[frame_index]
            kp, _ = emo_model.apply(v["emo_detector"], feats, kp_value,
                                    kp_jacobian,
                                    method=emo_model.emotion_feature)
        elif frame_index is not None and head == "linear" \
                and hasattr(emo_model, "emotion_feature"):
            # the 256^2 hourglass+ResNet trunk dominates the emotional
            # path's compute; run it in the pipeline compute dtype (the
            # kp-conditioned heads and the x100 smoothing stay f32 — the
            # displacement magnitudes are small and amplified)
            dt = o.compute_dtype
            evars = v["emo_detector"]
            frames_t = transformed_frames
            if dt != jnp.float32:
                evars = jax.tree.map(
                    lambda x: x.astype(dt)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, evars)
                frames_t = transformed_frames.astype(dt)
            feats_u = emo_model.apply(evars, frames_t,
                                      method=emo_model.feature)     # [U,512]
            feats_u = feats_u.astype(jnp.float32)
            feats = feats_u[frame_index]                            # [T,512]
            kp, _ = emo_model.apply(v["emo_detector"], feats, kp_value,
                                    kp_jacobian,
                                    method=emo_model.emotion_feature)
        else:
            if frame_index is not None:   # non-linear heads: full per-frame
                transformed_frames = transformed_frames[frame_index]
            kp, _ = emo_model.apply(v["emo_detector"], transformed_frames,
                                    kp_value, kp_jacobian, head=head)
        emo = {"value": kp["value"], "jacobian": kp["jacobian"]}
        cv = cj = None
        if euro_carry is not None:
            cv, cj = euro_carry["value"], euro_carry["jacobian"]
        val_s, cv = one_euro_filter(emo["value"], mincutoff=1.0, beta=0.2,
                                    freq=100, scale=100.0, carry=cv,
                                    return_carry=True)
        jac_s, cj = one_euro_filter(emo["jacobian"], mincutoff=1.0, beta=0.2,
                                    freq=100, scale=100.0, carry=cj,
                                    return_carry=True)
        smoothed = {"value": val_s, "jacobian": jac_s}
        if return_carry:
            return smoothed, {"value": cv, "jacobian": cj}
        return smoothed

    def _emo_feature_impl(self, variables, frames):
        """Trunk feature table for :meth:`prepare_emotion`: [U,256,256,3]
        emotion frames -> [U, 512] f32 features.  Must match the trunk
        computation inside ``_emotion_stage_impl`` (same compute dtype) so a
        handle-based render equals the frames-based one."""
        o = self.options
        emo_model = self.models["emo_detector"]
        if frames.dtype == jnp.uint8:
            if frames.ndim == 3:             # packed yuv420 planes
                frames = unpack_yuv420(frames)
            else:
                frames = frames.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        dt = o.compute_dtype
        evars = variables["emo_detector"]
        if dt != jnp.float32:
            evars = jax.tree.map(
                lambda x: x.astype(dt)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, evars)
            frames = frames.astype(dt)
        feats = emo_model.apply(evars, frames, method=emo_model.feature)
        return feats.astype(jnp.float32)

    def prepare_emotion(self, transformed_video) -> EmotionHandle:
        """Upload an emotion clip once and precompute its trunk features.

        Returns an :class:`EmotionHandle` usable as ``transformed_video`` in
        every render entry point.  Renders with a handle skip the per-call
        emotion-frame upload entirely; with the linear heads they also skip
        the 256^2 trunk (the [U, 512] feature table is computed here, padded
        to a 32-row bucket so repeat ``prepare_emotion`` calls at different
        clip lengths reuse one compiled trunk program)."""
        o = self.options
        frames = np.asarray(transformed_video, np.float32)
        U = frames.shape[0]
        if o.transfer_format == "yuv420":
            up = pack_yuv420_np(frames)      # 12 bpp packed planes
        else:
            up = frames
        dev = jnp.asarray(up)
        feats = None
        emo_model = self.models["emo_detector"]
        if _EMO_HEAD[o.emo_type] == "linear" \
                and hasattr(emo_model, "emotion_feature"):
            Ub = _bucket(U, 32)
            padded = np.zeros((Ub,) + up.shape[1:], up.dtype)
            padded[:U] = up
            feats = self._emo_feature(self.vars, jnp.asarray(padded))
        return EmotionHandle(frames=dev, feats=feats, n_frames=U)

    def _compose_kp_impl(self, kp_audio, emo):
        """Add emotion displacement to kp 1 (x0.2), 4, 6 (ref:demo.py:263-273)."""
        value = kp_audio["value"]
        jac = kp_audio["jacobian"]
        value = value.at[:, 1].add(emo["value"][:, 0] * 0.2)
        jac = jac.at[:, 1].add(emo["jacobian"][:, 0] * 0.2)
        value = value.at[:, 4].add(emo["value"][:, 1])
        jac = jac.at[:, 4].add(emo["jacobian"][:, 1])
        value = value.at[:, 6].add(emo["value"][:, 2])
        jac = jac.at[:, 6].add(emo["jacobian"][:, 2])
        return {"value": value, "jacobian": jac}

    def _render_chunk_impl(self, variables, source_image, source_features,
                           kp_source, kp_value, kp_jacobian):
        """Render a [F]-frame chunk with precomputed source features: the
        frame axis becomes the generator's batch axis (eval BN is stateless),
        one big MXU-friendly dispatch."""
        gen = self.models["generator"]
        F = kp_value.shape[0]
        src = jnp.broadcast_to(source_image, (F,) + source_image.shape[1:])
        feats = jnp.broadcast_to(source_features,
                                 (F,) + source_features.shape[1:])
        kp_s = {k: jnp.broadcast_to(val, (F,) + val.shape[1:])
                for k, val in kp_source.items()}
        out = gen.apply(variables["generator"], src, feats,
                        {"value": kp_value, "jacobian": kp_jacobian}, kp_s,
                        method=gen.decode)
        return out["prediction"]

    def _clip_kp_impl(self, variables, source_image, waveform, pose,
                      transformed_frames, add_emo: bool, frame_index=None,
                      emo_from_feats: bool = False):
        """Whole-clip keypoint production (the sequential, cheap part):
        raw waveform -> MFCC -> A2FD -> audio kp -> smoothing -> (emotion
        displacement) -> relative normalization.  Returns (kp_norm over Tp,
        kp_source without heatmap)."""
        Tp = pose.shape[0]
        mfcc_windows = audio_to_mfcc_windows(waveform)[:Tp]
        return self._clip_kp_from_windows_impl(
            variables, source_image, mfcc_windows, pose, transformed_frames,
            add_emo, frame_index=frame_index, emo_from_feats=emo_from_feats)

    def _clip_kp_from_windows_impl(self, variables, source_image,
                                   mfcc_windows, pose, transformed_frames,
                                   add_emo: bool, frame_index=None,
                                   emo_from_feats: bool = False):
        """Clip keypoints from precomputed MFCC windows.  ``frame_index``
        (optional [Tp] int32) maps timestep -> emotion-frame row explicitly;
        when None it is derived from the frame count (the live path).  An
        explicit index makes the program exportable at a fixed emotion-frame
        bucket: padding rows are never referenced.  ``emo_from_feats``
        (static): ``transformed_frames`` is a [U, 512] precomputed trunk
        feature table (see :meth:`prepare_emotion`)."""
        kp_source, kp_audio, kp_initial, _ = self._audio_kp_stage_impl(
            variables, source_image, mfcc_windows, pose)
        return self._emo_normalize_impl(
            variables, kp_source, kp_audio, kp_initial, transformed_frames,
            add_emo, frame_index=frame_index, emo_from_feats=emo_from_feats)

    def _emo_normalize_impl(self, variables, kp_source, kp_audio, kp_initial,
                            transformed_frames, add_emo: bool,
                            frame_index=None, emo_from_feats: bool = False,
                            euro_carry=None, return_carry: bool = False):
        """Emotion displacement + kp composition + relative normalization —
        the post-audio half of the clip kp math, shared verbatim by the
        fused programs and the split cold-emotional stage (whose second
        dispatch starts here so the emotion-frame upload can stream while
        the audio half computes)."""
        o = self.options
        if not emo_from_feats and transformed_frames.dtype == jnp.uint8:
            # production upload formats: packed yuv420 planes (rank 3,
            # 12 bpp — HALF the uint8-RGB bytes over the ~30 MB/s
            # host->device link; same loss the yuv420 delivery path
            # accepts) or plain uint8 RGB; the program unpacks/rescales
            # on device
            if transformed_frames.ndim == 3:
                transformed_frames = unpack_yuv420(transformed_frames)
            else:
                transformed_frames = transformed_frames.astype(jnp.float32) \
                    * jnp.float32(1.0 / 255.0)
        if o.check_add:
            # diagnostic mode: audio kp frozen at the (unsmoothed) first
            # frame, only the emotion displacement animates
            kp_audio = {k: jnp.broadcast_to(kp_initial[k][:1], v.shape)
                        for k, v in kp_audio.items()}
        if add_emo:
            Tp = kp_audio["value"].shape[0]
            if frame_index is None:
                if emo_from_feats:
                    # the feature table's row count is the BUCKETED count;
                    # deriving the cycle from it would gather all-zero
                    # padding rows for timesteps past the true frame count
                    raise ValueError(
                        "emo_from_feats requires an explicit frame_index "
                        "built from the true (unpadded) emotion frame count")
                U = transformed_frames.shape[0]
                frame_index = jnp.arange(Tp) % U if U < Tp else None
                if frame_index is None:
                    transformed_frames = transformed_frames[:Tp]
            emo = self._emotion_stage_impl(
                variables, transformed_frames,
                kp_audio["value"], kp_audio["jacobian"],
                frame_index=frame_index, emo_from_feats=emo_from_feats,
                euro_carry=euro_carry, return_carry=return_carry)
            if return_carry:
                emo, euro_carry = emo
            kp_driving = self._compose_kp_impl(kp_audio, emo)
        else:
            kp_driving = kp_audio
        kp_norm = normalize_kp(
            {k: v[0] for k, v in kp_source.items() if k != "heatmap"},
            kp_driving, {k: v[0] for k, v in kp_initial.items()},
            use_relative_movement=o.relative, use_relative_jacobian=o.relative)
        kp_s = {k: v[0] for k, v in kp_source.items() if k != "heatmap"}
        if return_carry:
            return kp_norm, kp_s, euro_carry
        return kp_norm, kp_s

    def _cast_generator(self, variables):
        """Generator variables + compute dtype for the decode hot path."""
        dt = self.options.compute_dtype
        gvars = variables["generator"]
        if dt != jnp.float32:
            gvars = jax.tree.map(
                lambda x: x.astype(dt)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, gvars)
        return gvars, dt

    def _decode_chunks(self, gvars, src, feats, kp_s, kv, kj):
        """Chunked batched decode: kv [n_chunks, F, 10, 2] -> frames.
        Shared verbatim by the single-dispatch and segment programs so the
        overlapped path is bitwise identical."""
        o = self.options
        gen = self.models["generator"]
        n_chunks, F = kv.shape[:2]
        yuv = o.transfer_format == "yuv420"
        if self._time_mesh is not None:
            # single-clip sequence parallelism: the frame axis inside each
            # chunk rides the mesh's 'data' axis — per-frame decode is
            # independent given keypoints, so XLA only replicates the
            # (1-batch) source features; frames come back time-sharded
            from jax.sharding import NamedSharding, PartitionSpec as P
            cons = NamedSharding(self._time_mesh, P(None, "data"))
            kv = jax.lax.with_sharding_constraint(kv, cons)
            kj = jax.lax.with_sharding_constraint(kj, cons)

        def render_one_chunk(kp_chunk):
            val, jac = kp_chunk
            if o.pallas_warp:
                # shared-source decode: the 1-batch source/features pass
                # through unexpanded — dense motion downsamples the source
                # once and the Pallas warp reads the single feature block,
                # so no [F, 64, 64, 256] broadcast ever hits HBM
                srcF, featF = src, feats
            else:
                srcF = jnp.broadcast_to(src, (F,) + src.shape[1:])
                featF = jnp.broadcast_to(feats, (F,) + feats.shape[1:])
            kpsF = {k: jnp.broadcast_to(v[None], (F,) + v.shape)
                    for k, v in kp_s.items()}
            out = gen.apply(gvars, srcF, featF,
                            {"value": val, "jacobian": jac}, kpsF,
                            method=gen.decode, want_aux=False,
                            shared_source=o.pallas_warp)
            pred = out["prediction"].astype(jnp.float32)
            if yuv:
                return rgb_to_yuv420(pred)
            return jnp.clip(jnp.round(pred * 255.0), 0, 255).astype(jnp.uint8)

        frames = jax.lax.map(render_one_chunk, (kv, kj))
        if yuv:
            return tuple(x.reshape((n_chunks * F,) + x.shape[2:])
                         for x in frames)
        return frames.reshape(n_chunks * F, *frames.shape[2:])

    def _full_render_impl(self, variables, source_image, waveform, pose,
                          transformed_frames, add_emo: bool, frame_index=None,
                          emo_from_feats: bool = False):
        """Entire clip in one XLA program: raw waveform -> MFCC -> kp ->
        (emotion) -> normalize -> chunked batched rendering -> frames.

        The MFCC frontend runs inline (the waveform is zero-padded on the
        host so the window count is the static bucketed frame count) —
        one device dispatch for the whole clip, no separate audio round
        trip.  transformed_frames: [Tp, 256, 256, 3] (ignored unless
        add_emo).  Returns uint8 [Tp, 256, 256, 3] (or yuv420 planes).
        """
        kp_norm, kp_s_f32 = self._clip_kp_impl(
            variables, source_image, waveform, pose, transformed_frames,
            add_emo, frame_index=frame_index, emo_from_feats=emo_from_feats)
        return self._decode_clip(variables, source_image, kp_norm, kp_s_f32)

    def _decode_clip(self, variables, source_image, kp_norm, kp_s_f32):
        """Chunked whole-clip decode from normalized keypoints (the heavy,
        parallel part shared by the fused and exported programs)."""
        gvars, dt = self._cast_generator(variables)
        src = source_image.astype(dt)
        gen = self.models["generator"]
        feats = gen.apply(gvars, src, method=gen.encode_source)
        kp_s = {k: v.astype(dt) for k, v in kp_s_f32.items()}

        Tp = kp_norm["value"].shape[0]
        F = self.options.frame_chunk
        n_chunks = Tp // F
        kv = kp_norm["value"].astype(dt).reshape(n_chunks, F, 10, 2)
        kj = kp_norm["jacobian"].astype(dt).reshape(n_chunks, F, 10, 2, 2)
        return self._decode_chunks(gvars, src, feats, kp_s, kv, kj)

    def _emo_render_from_windows_impl(self, variables, source_image,
                                      mfcc_windows, pose, transformed_frames,
                                      frame_index):
        """Exportable emotional whole-clip program: precomputed MFCC windows
        + an explicit timestep -> emotion-frame index (so the emotion-frame
        axis can pad to a fixed bucket; rows past the real count are never
        gathered).  Same math as ``_full_render_impl`` with add_emo=True —
        the index simply replaces the in-program ``arange(Tp) % U``."""
        kp_norm, kp_s_f32 = self._clip_kp_from_windows_impl(
            variables, source_image, mfcc_windows, pose, transformed_frames,
            add_emo=True, frame_index=frame_index)
        return self._decode_clip(variables, source_image, kp_norm, kp_s_f32)

    def _kp_stage_impl(self, variables, source_image, waveform, pose,
                       transformed_frames, add_emo: bool, frame_index=None,
                       emo_from_feats: bool = False):
        """First dispatch of the overlapped path: whole-clip keypoints plus
        the encoded source features.  Outputs stay on device; the render
        segments consume them without a host round trip."""
        kp_norm, kp_s = self._clip_kp_impl(
            variables, source_image, waveform, pose, transformed_frames,
            add_emo, frame_index=frame_index, emo_from_feats=emo_from_feats)
        gvars, dt = self._cast_generator(variables)
        gen = self.models["generator"]
        feats = gen.apply(gvars, source_image.astype(dt),
                          method=gen.encode_source)
        return kp_norm["value"], kp_norm["jacobian"], kp_s, feats

    def _kp_stage_from_windows_impl(self, variables, source_image,
                                    mfcc_windows, pose, transformed_frames,
                                    frame_index, add_emo: bool):
        """Exportable kp stage: precomputed MFCC windows (+ an explicit
        timestep -> emotion-frame index when emotional) -> whole-clip
        normalized keypoints + encoded source features.  The
        streaming-artifact counterpart of ``_kp_stage_impl`` — its outputs
        feed the frozen segment program without a host round trip."""
        kp_norm, kp_s = self._clip_kp_from_windows_impl(
            variables, source_image, mfcc_windows, pose, transformed_frames,
            add_emo, frame_index=frame_index)
        gvars, dt = self._cast_generator(variables)
        gen = self.models["generator"]
        feats = gen.apply(gvars, source_image.astype(dt),
                          method=gen.encode_source)
        return kp_norm["value"], kp_norm["jacobian"], kp_s, feats

    def _kp_stage_a_impl(self, variables, source_image, waveform, pose):
        """Audio half of the split cold-emotional kp stage: everything that
        does NOT depend on the emotion frames (MFCC -> A2FD -> audio kp ->
        smoothing, source kp, encoded source features).  Dispatched before
        the emotion-frame host->device upload so the ~130 ms upload streams
        concurrently with this compute (the tunnel moves bytes while the
        chip runs; cf. the segment-fetch overlap going the other way)."""
        Tp = pose.shape[0]
        mfcc_windows = audio_to_mfcc_windows(waveform)[:Tp]
        kp_source, kp_audio, kp_initial, _ = self._audio_kp_stage_impl(
            variables, source_image, mfcc_windows, pose)
        gvars, dt = self._cast_generator(variables)
        gen = self.models["generator"]
        feats = gen.apply(gvars, source_image.astype(dt),
                          method=gen.encode_source)
        kp_source = {k: v for k, v in kp_source.items() if k != "heatmap"}
        return kp_source, kp_audio, kp_initial, feats

    def _kp_stage_b_impl(self, variables, kp_source, kp_audio, kp_initial,
                         transformed_frames, frame_index=None):
        """Emotion half of the split kp stage: consumes the uploaded emotion
        frames + stage A's keypoints; same math as the fused stage."""
        kp_norm, kp_s = self._emo_normalize_impl(
            variables, kp_source, kp_audio, kp_initial, transformed_frames,
            add_emo=True, frame_index=frame_index)
        return kp_norm["value"], kp_norm["jacobian"], kp_s

    def _dispatch_kp_stage(self, args, add_emo: bool, emo_kw):
        """kp-stage dispatch for the overlapped/streaming paths -> (kv, kj,
        kp_s, feats), all on device.

        Cold emotional renders (raw frames still on the host) split the
        stage in two dispatches: stage A (audio kp + source encode) is
        issued FIRST, then the emotion-frame upload, then stage B — on an
        in-order device queue the upload's bytes move through the tunnel
        while stage A computes, hiding most of the ~130 ms the one-shot
        emotional path previously paid serially (VERDICT r3 item 5).
        Neutral and handle-based renders keep the single fused dispatch."""
        emo = args[3]
        if add_emo and isinstance(emo, np.ndarray):
            kp_source, kp_audio, kp_initial, feats = self._kp_stage_a(
                self.vars, *args[:3])
            emo_dev = jnp.asarray(emo)   # overlaps stage A's compute
            kv, kj, kp_s = self._kp_stage_b(
                self.vars, kp_source, kp_audio, kp_initial, emo_dev,
                frame_index=emo_kw.get("frame_index"))
            return kv, kj, kp_s, feats
        return self._kp_stage(self.vars, *args, add_emo=add_emo, **emo_kw)

    # -------------------------------------------- unbounded streaming
    # (PipelineOptions.segment_frames): the clip is processed in fixed-size
    # kp/render chunk programs with the recurrent state (LSTM carry,
    # one-euro filter states, first-frame kp) threaded between dispatches.
    # Chunked scans with a threaded carry compute EXACTLY the whole-clip
    # scans, and the chunked MFCC frontend is bit-identical
    # (eamm_tpu/ops/mfcc.py), so the output equals the whole-clip paths
    # (test_stream_unbounded_matches_whole_clip) while ONE compiled program
    # pair serves ANY clip length with O(chunk) memory.

    def _stream_prelude_impl(self, variables, source_image):
        """Once per stream: source kp (batched for the kp chunks, unbatched
        for the render segments) + A2FD identity feature + encoded source
        features (everything that depends only on the source)."""
        m, v = self.models, variables
        kp_source = m["kp_detector"].apply(v["kp_detector"], source_image)
        kp_source = {k: val for k, val in kp_source.items() if k != "heatmap"}
        kp_s0 = {k: val[0] for k, val in kp_source.items()}
        at = m["audio_feature"]
        image_feature = at.apply(v["audio_feature"], source_image,
                                 method=at.encode_image)
        gvars, dt = self._cast_generator(variables)
        gen = self.models["generator"]
        feats = gen.apply(gvars, source_image.astype(dt),
                          method=gen.encode_source)
        return kp_source, kp_s0, image_feature, feats

    def _stream_kp_chunk_impl(self, variables, kp_source, image_feature,
                              samples, prev_sample, pose, transformed_frames,
                              frame_index, carry, first: bool, add_emo: bool,
                              emo_from_feats: bool = False):
        """One fixed-size kp chunk: [chunk_samples_len(K)] raw samples +
        [K, 6] pose -> normalized kp for K frames + the updated recurrent
        carry.  ``first=True`` initializes the carry in-program (the
        first-frame kp that anchors relative normalization is data, not a
        zero state).  Same math as ``_clip_kp_from_windows_impl`` — shared
        helpers carry the state across the chunk boundary instead of
        re-deriving it."""
        o = self.options
        m, v = self.models, variables
        K = pose.shape[0]
        windows = mfcc_window_chunk(samples, prev_sample, K)
        at = m["audio_feature"]
        deco, lstm_carry = at.apply(
            v["audio_feature"], image_feature, windows[None], pose[None],
            audio_weight=o.audio_weight,
            carry=(None if first else carry["lstm"]), return_carry=True,
            method=at.window_features)
        kp_a = m["kp_detector_a"].apply(v["kp_detector_a"], deco[0])
        ev = None if first else carry["euro_val"]
        ej = None if first else carry["euro_jac"]
        val_s, ev = one_euro_filter(kp_a["value"], mincutoff=0.05, beta=8.0,
                                    freq=100, scale=10.0, carry=ev,
                                    return_carry=True)
        jac_s, ej = one_euro_filter(kp_a["jacobian"], mincutoff=0.05,
                                    beta=8.0, freq=100, scale=10.0, carry=ej,
                                    return_carry=True)
        kp_audio = {"value": val_s, "jacobian": jac_s}
        if first:
            kp_initial = {"value": kp_a["value"][:1],
                          "jacobian": kp_a["jacobian"][:1]}
        else:
            kp_initial = carry["kp_initial"]
        emo_carry_in = None if (first or not add_emo) else carry["emo_euro"]
        kp_norm, _, emo_carry = self._emo_normalize_impl(
            variables, kp_source, kp_audio, kp_initial, transformed_frames,
            add_emo, frame_index=frame_index, emo_from_feats=emo_from_feats,
            euro_carry=emo_carry_in, return_carry=True)
        new_carry = {"lstm": lstm_carry, "euro_val": ev, "euro_jac": ej,
                     "kp_initial": kp_initial}
        if add_emo:
            new_carry["emo_euro"] = emo_carry
        return kp_norm["value"], kp_norm["jacobian"], new_carry

    def use_unbounded(self, frames: int) -> bool:
        """Length policy: should a clip of ``frames`` delivered frames take
        the unbounded chunk programs (True) or the whole-clip bucketed
        programs (False)?  See ``PipelineOptions.stream_policy_frames``."""
        o = self.options
        if not o.segment_frames:
            return False
        if o.stream_policy_frames is None:
            return True            # explicit segment_frames, no policy
        return frames > o.stream_policy_frames

    def _render_stream_unbounded(self, source_image, waveform, all_pose,
                                 transformed_video, add_emo):
        """Generator behind render_stream when ``segment_frames`` is set:
        yields ``(start_frame, payload)`` per chunk; a two-deep dispatch
        window keeps chunk c+1's compute overlapping chunk c's fetch."""
        from eamm_tpu.ops.mfcc import (chunk_samples_len, chunk_sample_start,
                                       padded_buffer_len, PAD_SAMPLES)
        o = self.options
        K = o.segment_frames
        if K % o.frame_chunk:
            raise ValueError("segment_frames must be a multiple of "
                             "frame_chunk")
        wav = np.asarray(waveform, np.float32).reshape(-1)
        T = num_windows_for_samples(wav.shape[0])
        n_chunks = max(1, math.ceil(T / K))
        buf_len = max(padded_buffer_len(n_chunks * K),
                      2 * PAD_SAMPLES + wav.shape[0])
        buf = np.zeros(buf_len, np.float32)
        buf[PAD_SAMPLES:PAD_SAMPLES + wav.shape[0]] = wav
        pose_full = np.zeros((n_chunks * K, 6), np.float32)
        pose_full[:T] = self.prepare_pose(all_pose, T)

        src = jnp.asarray(source_image, jnp.float32)[None]
        kp_source, kp_s0, image_feature, feats = self._stream_prelude(
            self.vars, src)

        emo_from_feats = False
        fidx_mod = 1
        emo_arg = jnp.zeros((1, 256, 256, 3), jnp.float32)
        if add_emo:
            if transformed_video is None:
                raise ValueError("add_emo requires transformed_video frames")
            if isinstance(transformed_video, EmotionHandle):
                h = transformed_video
            else:
                # one upload + (linear heads) one trunk pass for the whole
                # stream, however long it runs
                h = self.prepare_emotion(
                    np.asarray(transformed_video, np.float32))
            fidx_mod = h.n_frames
            if h.feats is not None:
                emo_arg, emo_from_feats = h.feats, True
            else:
                emo_arg = h.frames

        yuv = o.transfer_format == "yuv420"
        ns = max(1, o.fetch_streams)
        ny = max(1, (2 * ns) // 3) if yuv else ns
        carry = None
        pending = []
        for c in range(n_chunks):
            s0 = chunk_sample_start(c * K)
            samples = jnp.asarray(buf[s0:s0 + chunk_samples_len(K)])
            prev = jnp.float32(buf[s0 - 1] if s0 else 0.0)
            pose_c = jnp.asarray(pose_full[c * K:(c + 1) * K])
            fidx = jnp.asarray(
                (np.arange(c * K, (c + 1) * K) % fidx_mod).astype(np.int32))
            kv, kj, carry = self._stream_kp_chunk(
                self.vars, kp_source, image_feature, samples, prev, pose_c,
                emo_arg, fidx, carry, first=(c == 0), add_emo=add_emo,
                emo_from_feats=emo_from_feats)
            parts = self._render_segment(self.vars, src, feats, kp_s0,
                                         kv, kj, jnp.int32(0), K)
            pending.append((c * K, min(K, T - c * K), parts))
            if len(pending) > 2:
                yield self._fetch_stream_item(pending.pop(0), ny, yuv)
        for item in pending:
            yield self._fetch_stream_item(item, ny, yuv)

    @staticmethod
    def _fetch_stream_item(item, ny, yuv):
        start, keep, parts = item
        fetched = fetch_parallel(parts)
        if yuv:
            y = np.concatenate(fetched[:ny], axis=0)[:keep]
            return start, (y, fetched[ny][:keep], fetched[ny + 1][:keep])
        return start, np.concatenate(fetched, axis=0)[:keep]

    def _render_segment_impl(self, variables, source_image, feats, kp_s_f32,
                             kp_value, kp_jacobian, seg_index, seg_frames):
        """One overlapped render segment: frames [seg_index*seg_frames,
        +seg_frames) of the clip — identical math to the matching slice of
        the single-dispatch path.  ``seg_index`` is a traced scalar (one
        compiled program serves every segment); ``seg_frames`` is static."""
        o = self.options
        gvars, dt = self._cast_generator(variables)
        src = source_image.astype(dt)
        kp_s = {k: v.astype(dt) for k, v in kp_s_f32.items()}
        start = seg_index * seg_frames
        kp_value = jax.lax.dynamic_slice_in_dim(kp_value, start, seg_frames)
        kp_jacobian = jax.lax.dynamic_slice_in_dim(kp_jacobian, start,
                                                   seg_frames)
        F = o.frame_chunk
        n_chunks = seg_frames // F
        kv = kp_value.astype(dt).reshape(n_chunks, F, 10, 2)
        kj = kp_jacobian.astype(dt).reshape(n_chunks, F, 10, 2, 2)
        out = self._decode_chunks(gvars, src, feats, kp_s, kv, kj)
        # Split the output into fetch parts INSIDE the program: each part is
        # its own output buffer, immediately fetchable when the dispatch
        # completes — a host-issued slice op would queue behind later
        # segments' compute on an in-order device queue.
        ns = max(1, o.fetch_streams)
        if o.transfer_format == "yuv420":
            y, u, v = out
            ny = max(1, (2 * ns) // 3)         # Y holds 2/3 of the bytes
            q = [seg_frames * i // ny for i in range(ny + 1)]
            return tuple([y[q[i]:q[i + 1]] for i in range(ny)] + [u, v])
        q = [seg_frames * i // ns for i in range(ns + 1)]
        return tuple(out[q[i]:q[i + 1]] for i in range(ns))

    def _batch_chunk(self, n_identities: int) -> int:
        """Frames-per-identity per render dispatch: the total per-chunk
        frame count (N * F) is bounded so HBM activations stay ~constant
        regardless of identity count."""
        return max(8, min(self.options.frame_chunk,
                          128 // max(1, n_identities)))

    def _batch_kp_stage_impl(self, variables, source_images, mfcc_windows,
                             pose):
        """Batched whole-clip keypoint production for N identities: audio
        features -> audio kp -> one-euro smoothing, plus source kp and the
        encoded source features (in compute dtype)."""
        o = self.options
        m, v = self.models, variables
        N, Tp = mfcc_windows.shape[:2]
        kp_source = m["kp_detector"].apply(v["kp_detector"], source_images)

        deco = m["audio_feature"].apply(
            v["audio_feature"], source_images, mfcc_windows, pose,
            audio_weight=o.audio_weight)                  # [N,Tp,64,64,35]
        kp_a = m["kp_detector_a"].apply(
            v["kp_detector_a"], deco.reshape((N * Tp,) + deco.shape[2:]))
        kp_a = {k: val.reshape((N, Tp) + val.shape[1:])
                for k, val in kp_a.items() if k != "heatmap"}
        smooth = {
            k: jax.vmap(lambda x: one_euro_filter(
                x, mincutoff=0.05, beta=8.0, freq=100, scale=10.0))(val)
            for k, val in kp_a.items()}

        gvars, dt = self._cast_generator(variables)
        gen = self.models["generator"]
        feats = gen.apply(gvars, source_images.astype(dt),
                          method=gen.encode_source)       # [N,...]
        kp_s = {k: val for k, val in kp_source.items() if k != "heatmap"}
        return smooth["value"], smooth["jacobian"], kp_s, feats

    def _batch_decode_chunks(self, gvars, source_images, feats, kp_s, kv, kj):
        """Batched chunked decode: kv [n_chunks, N, F, 10, 2] -> frames
        [N, n_chunks*F, ...] (or yuv420 planes).  Shared verbatim by the
        single-dispatch and segment programs."""
        o = self.options
        gen = self.models["generator"]
        n_chunks, N, F = kv.shape[:3]
        yuv = o.transfer_format == "yuv420"

        def render_chunk(kp_chunk):
            val, jac = kp_chunk                           # [N,F,...]
            if o.pallas_warp:
                # shared-source decode: source b//F serves frames of
                # identity b//F directly (kernel-side indexing), no
                # [N*F, 64, 64, 256] feature repeat in HBM
                srcF, featF = source_images, feats
            else:
                srcF = jnp.repeat(source_images, F, axis=0)
                featF = jnp.repeat(feats, F, axis=0)
            kpsF = {k: jnp.repeat(val2, F, axis=0) for k, val2 in kp_s.items()}
            out = gen.apply(gvars, srcF, featF,
                            {"value": val.reshape(N * F, 10, 2),
                             "jacobian": jac.reshape(N * F, 10, 2, 2)},
                            kpsF, method=gen.decode, want_aux=False,
                            shared_source=o.pallas_warp)
            pred = out["prediction"].astype(jnp.float32).reshape(
                N, F, 256, 256, 3)
            if yuv:
                return rgb_to_yuv420(pred.reshape(N * F, 256, 256, 3))
            return jnp.clip(jnp.round(pred * 255.0), 0, 255).astype(jnp.uint8)

        frames = jax.lax.map(render_chunk, (kv, kj))      # [n_chunks,N,F,...]
        Tseg = n_chunks * F
        if yuv:
            # [n_chunks, N*F, h, w] -> [N, Tseg, h, w]
            return tuple(
                x.reshape(n_chunks, N, F, *x.shape[2:])
                 .swapaxes(0, 1).reshape((N, Tseg) + x.shape[2:])
                for x in frames)
        return frames.swapaxes(0, 1).reshape(N, Tseg, 256, 256, 3)

    def _batch_prepare_chunks(self, source_images, kp_value, kp_jacobian):
        """[N, T, ...] kp -> chunked [n_chunks, N, F, ...] in compute dtype,
        plus the cast source/feature inputs."""
        o = self.options
        dt = o.compute_dtype
        N, Tseg = kp_value.shape[:2]
        F = self._batch_chunk(N)
        n_chunks = Tseg // F
        kv = kp_value.astype(dt).reshape(N, n_chunks, F, 10, 2).swapaxes(0, 1)
        kj = kp_jacobian.astype(dt).reshape(
            N, n_chunks, F, 10, 2, 2).swapaxes(0, 1)
        return kv, kj

    def _batch_render_impl(self, variables, source_images, mfcc_windows,
                           pose):
        """Multi-identity batched neutral rendering in one XLA program.

        source_images [N,256,256,3], mfcc_windows [N,Tp,28,12],
        pose [N,Tp,6] -> uint8 [N,Tp,256,256,3].  The identity axis is the
        natural 'data' mesh axis — under jit with N sharded, every stage
        (A2FD batch, kp heads, chunked rendering) parallelizes across chips
        (the BASELINE 'batched clip inference' configuration).
        """
        kv_t, kj_t, kp_s, feats = self._batch_kp_stage_impl(
            variables, source_images, mfcc_windows, pose)
        gvars, dt = self._cast_generator(variables)
        kv, kj = self._batch_prepare_chunks(source_images, kv_t, kj_t)
        kp_s = {k: v.astype(dt) for k, v in kp_s.items()}
        return self._batch_decode_chunks(gvars, source_images.astype(dt),
                                         feats, kp_s, kv, kj)

    def _batch_render_segment_impl(self, variables, source_images, feats,
                                   kp_s_f32, kp_value, kp_jacobian,
                                   seg_index, seg_frames):
        """One overlapped batched render segment: frames [seg_index *
        seg_frames, +seg_frames) of every identity's clip."""
        o = self.options
        gvars, dt = self._cast_generator(variables)
        kp_s = {k: v.astype(dt) for k, v in kp_s_f32.items()}
        start = seg_index * seg_frames
        kp_value = jax.lax.dynamic_slice_in_dim(kp_value, start, seg_frames,
                                                axis=1)
        kp_jacobian = jax.lax.dynamic_slice_in_dim(kp_jacobian, start,
                                                   seg_frames, axis=1)
        kv, kj = self._batch_prepare_chunks(source_images, kp_value,
                                            kp_jacobian)
        out = self._batch_decode_chunks(gvars, source_images.astype(dt),
                                        feats, kp_s, kv, kj)
        # split into fetch parts inside the program (see _render_segment_impl)
        ns = max(1, o.fetch_streams)
        if o.transfer_format == "yuv420":
            y, u, v = out
            ny = max(1, (2 * ns) // 3)
            q = [seg_frames * i // ny for i in range(ny + 1)]
            return tuple([y[:, q[i]:q[i + 1]] for i in range(ny)] + [u, v])
        q = [seg_frames * i // ns for i in range(ns + 1)]
        return tuple(out[:, q[i]:q[i + 1]] for i in range(ns))

    def _prepare_batch_args(self, source_images, waveforms, poses):
        """Host-side input prep for the batched paths: waveforms may differ
        in length; everything pads to the longest clip, bucketed so the
        padded length divides into overlap segments of whole chunks."""
        o = self.options
        N = len(waveforms)
        windows = [self.audio_to_windows(w) for w in waveforms]
        T = max(w.shape[0] for w in windows)
        S = max(1, o.overlap_segments)
        Tp = _bucket(T, _bucket(o.time_bucket, self._batch_chunk(N) * S))
        win = np.zeros((N, Tp, 28, 12), np.float32)
        pos = np.zeros((N, Tp, 6), np.float32)
        for i, w in enumerate(windows):
            win[i, :w.shape[0]] = w
            pos[i, :w.shape[0]] = self.prepare_pose(poses[i], w.shape[0])
        src = np.asarray(source_images, np.float32)
        if self._batch_in_sharding is not None:
            put = lambda x: jax.device_put(x, self._batch_in_sharding)
        else:
            put = jnp.asarray
        return T, (put(src), put(win), put(pos))

    def use_mesh(self, mesh, time_shard: bool = False):
        """Shard the batched render paths over a device mesh: identities
        ride the 'data' axis, variables replicate, and XLA inserts the ICI
        collectives.  Batch sizes should be multiples of the mesh size.
        Returns self (chainable); sharded == unsharded is asserted by
        tests/test_sharded_inference.py and test_serve.py.

        ``time_shard=True`` additionally spreads SINGLE-clip rendering
        over the mesh: the sequential-cheap kp stage (scan LSTM) computes
        as usual, and the heavy per-frame generator decode shards its
        frame axis across devices (frames are independent given keypoints
        — the moral sequence parallelism for this model family, SURVEY
        §2.5/§5).  frame_chunk should be a multiple of the mesh size.
        Implies the XLA warp path (the Pallas kernel is not shard_mapped).
        """
        from eamm_tpu.parallel import batch_sharding, replicated
        self._batch_in_sharding = batch_sharding(mesh)
        self.vars = jax.device_put(self.vars, replicated(mesh))
        if time_shard:
            import dataclasses
            self._time_mesh = mesh
            if self.options.pallas_warp:
                self.options = dataclasses.replace(self.options,
                                                   pallas_warp=False)
        return self

    def render_batch_uint8(self, source_images, waveforms, poses) -> np.ndarray:
        """Render several identities / clips at once (neutral path).

        Returns uint8 [N, T_max, 256, 256, 3] (frames past each clip's own
        length repeat the padded tail).
        """
        T, args = self._prepare_batch_args(source_images, waveforms, poses)
        if self.options.overlap_segments > 1:
            out = self._batch_render_overlapped(args, T)
            if self.options.transfer_format == "yuv420":
                return yuv420_to_rgb(*out)
            return out
        out = self._batch_render(self.vars, *args)
        if self.options.transfer_format == "yuv420":
            y, u, v = self._fetch_batch_yuv(out, T)
            return yuv420_to_rgb(y, u, v)
        return np.asarray(out)[:, :T]

    def render_batch_yuv420(self, source_images, waveforms, poses):
        """Batched neutral rendering delivered as yuv420p planes:
        (Y [N,T,256,256], U, V [N,T,128,128]) uint8 on host."""
        if self.options.transfer_format != "yuv420":
            raise ValueError(
                "render_batch_yuv420 requires transfer_format='yuv420'")
        T, args = self._prepare_batch_args(source_images, waveforms, poses)
        if self.options.overlap_segments > 1:
            return self._batch_render_overlapped(args, T)
        out = self._batch_render(self.vars, *args)
        return self._fetch_batch_yuv(out, T)

    def _batch_render_overlapped(self, args, T):
        """Pipelined batched delivery (see _render_overlapped)."""
        o = self.options
        src = args[0]
        kv, kj, kp_s, feats = self._batch_kp_stage(self.vars, *args)
        S = o.overlap_segments
        Tp = kv.shape[1]
        Tseg = Tp // S
        segs = [self._batch_render_segment(self.vars, src, feats, kp_s,
                                           kv, kj, jnp.int32(i), Tseg)
                for i in range(S)]
        keeps = [min(Tseg, max(0, T - i * Tseg)) for i in range(S)]
        flat = [p for parts, keep in zip(segs, keeps) if keep > 0
                for p in parts]
        fetched = fetch_parallel(flat)
        it = iter(fetched)
        yuv = o.transfer_format == "yuv420"
        ns = max(1, o.fetch_streams)
        ny = max(1, (2 * ns) // 3) if yuv else ns
        if yuv:
            ys, us, vs = [], [], []
            for keep in keeps:
                if keep == 0:
                    continue
                y = np.concatenate([next(it) for _ in range(ny)], axis=1)
                ys.append(y[:, :keep])
                us.append(next(it)[:, :keep])
                vs.append(next(it)[:, :keep])
            return (np.concatenate(ys, axis=1), np.concatenate(us, axis=1),
                    np.concatenate(vs, axis=1))
        out = []
        for keep in keeps:
            if keep == 0:
                continue
            seg = np.concatenate([next(it) for _ in range(ns)], axis=1)
            out.append(seg[:, :keep])
        return np.concatenate(out, axis=1)

    def _fetch_batch_yuv(self, out, T: int):
        y, u, v = out
        ns = max(1, self.options.fetch_streams)
        ny = max(1, (2 * ns) // 3)
        q = [y.shape[1] * i // ny for i in range(ny + 1)]
        parts = ([y[:, q[i]:q[i + 1]] for i in range(ny)] + [u, v])
        fetched = fetch_parallel(parts)
        yh = np.concatenate(fetched[:ny], axis=1)
        return yh[:, :T], fetched[ny][:, :T], fetched[ny + 1][:, :T]

    # ------------------------------------------------------------ driver

    def audio_to_windows(self, waveform: np.ndarray) -> np.ndarray:
        return np.asarray(_jit_audio_windows(jnp.asarray(waveform)))

    def prepare_pose(self, all_pose: np.ndarray, T: int) -> np.ndarray:
        """Host-side pose tiling / smoothing (ref:demo.py:297-341)."""
        return prepare_pose_np(all_pose, T, smooth=self.options.smooth_pose)

    def render(self, source_image: np.ndarray, waveform: np.ndarray,
               all_pose: np.ndarray,
               transformed_video: np.ndarray | None = None,
               add_emo: bool | None = None) -> np.ndarray:
        """Full clip synthesis.

        Args:
          source_image: [256, 256, 3] float32 in [0, 1] (pre-cropped).
          waveform: [N] float32 at 16 kHz.
          all_pose: [M, 7] 3DDFA pose (or [1, 7]).
          transformed_video: [T', 256, 256, 3] mouth-masked aligned emotion
            frames (required when add_emo).
        Returns [T, 256, 256, 3] float32 frames in [0, 1].
        """
        return self.render_uint8(source_image, waveform, all_pose,
                                 transformed_video, add_emo
                                 ).astype(np.float32) / 255.0

    def render_uint8(self, source_image, waveform, all_pose,
                     transformed_video=None, add_emo=None) -> np.ndarray:
        """Fused fast path: one device dispatch per clip, uint8 frames out.

        Falls back to the staged path when ``adapt_scale`` is requested
        (its convex-hull scale is computed on the host).  With
        ``transfer_format='yuv420'`` the frames cross the host link as
        yuv420p planes and are converted back here (codec-equivalent loss).
        """
        o = self.options
        if o.transfer_format == "yuv420" and not o.adapt_scale:
            y, u, v = self.render_yuv420(source_image, waveform, all_pose,
                                         transformed_video, add_emo)
            return yuv420_to_rgb(y, u, v)
        return self._render_rgb_uint8(source_image, waveform, all_pose,
                                      transformed_video, add_emo)

    def render_yuv420(self, source_image, waveform, all_pose,
                      transformed_video=None, add_emo=None):
        """Whole clip as yuv420p planes: (Y [T,256,256], U, V [T,128,128])
        uint8 on host — the video encoder's native input, delivered at half
        the link bytes of RGB.  Requires ``transfer_format='yuv420'``."""
        o = self.options
        if o.transfer_format != "yuv420":
            raise ValueError("render_yuv420 requires transfer_format='yuv420'")
        add_emo = o.add_emo if add_emo is None else add_emo
        T_clip = num_windows_for_samples(
            np.asarray(waveform).reshape(-1).shape[0])
        if self.use_unbounded(T_clip):
            # long clip: assemble planes from the unbounded chunk stream
            parts = [p for _, p in self._render_stream_unbounded(
                source_image, waveform, all_pose, transformed_video,
                add_emo)]
            return (np.concatenate([y for y, _, _ in parts], axis=0),
                    np.concatenate([u for _, u, _ in parts], axis=0),
                    np.concatenate([v for _, _, v in parts], axis=0))
        T, args, emo_kw = self._prepare_full_render_args(
            source_image, waveform, all_pose, transformed_video, add_emo)
        if o.overlap_segments > 1:
            return self._render_overlapped(args, add_emo, T, emo_kw)
        y, u, v = self._full_render(self.vars, *args, add_emo=add_emo,
                                    **emo_kw)
        ns = max(1, o.fetch_streams)
        ny = max(1, (2 * ns) // 3)   # Y holds 2/3 of the bytes
        q = [T * i // ny for i in range(ny + 1)]   # padded tail never fetched
        parts = [y[q[i]:q[i + 1]] for i in range(ny)] + [u[:T], v[:T]]
        fetched = fetch_parallel(parts)
        return (np.concatenate(fetched[:ny], axis=0),
                fetched[ny], fetched[ny + 1])

    def _render_overlapped(self, args, add_emo, T, emo_kw=None):
        """Pipelined delivery: dispatch the kp stage, then all S render
        segments back-to-back (dispatch is asynchronous), and fetch the
        segments in completion order — segment i's device->host transfer
        rides alongside segment i+1's compute, so delivered throughput
        approaches max(compute, transfer) instead of their sum.  Returns
        the first T frames (uint8 frames, or yuv420 planes); the padded
        tail is rendered but never crosses the host link."""
        o = self.options
        src = args[0]
        kv, kj, kp_s, feats = self._dispatch_kp_stage(args, add_emo,
                                                      emo_kw or {})
        S = o.overlap_segments
        Tp = kv.shape[0]
        Tseg = Tp // S
        # every segment dispatch is issued before any fetch begins; the
        # fetch of segment i then overlaps the compute of segments > i
        segs = [self._render_segment(self.vars, src, feats, kp_s, kv, kj,
                                     jnp.int32(i), Tseg)
                for i in range(S)]
        # frames of segment i to keep (the last segments hold the padding)
        keeps = [min(Tseg, max(0, T - i * Tseg)) for i in range(S)]
        flat = [p for parts, keep in zip(segs, keeps) if keep > 0
                for p in parts]
        fetched = fetch_parallel(flat)
        it = iter(fetched)
        yuv = o.transfer_format == "yuv420"
        ns = max(1, o.fetch_streams)
        ny = max(1, (2 * ns) // 3) if yuv else ns
        if yuv:
            ys, us, vs = [], [], []
            for keep in keeps:
                if keep == 0:
                    continue
                y = np.concatenate([next(it) for _ in range(ny)], axis=0)
                ys.append(y[:keep])
                us.append(next(it)[:keep])
                vs.append(next(it)[:keep])
            return (np.concatenate(ys, axis=0), np.concatenate(us, axis=0),
                    np.concatenate(vs, axis=0))
        out = []
        for keep in keeps:
            if keep == 0:
                continue
            seg = np.concatenate([next(it) for _ in range(ns)], axis=0)
            out.append(seg[:keep])
        return np.concatenate(out, axis=0)

    def render_stream(self, source_image, waveform, all_pose,
                      transformed_video=None, add_emo=None):
        """Segment-streaming render: a generator yielding
        ``(start_frame, payload)`` in clip order as each segment finishes,
        where payload is uint8 RGB ``[k, 256, 256, 3]`` frames (or
        ``(y, u, v)`` yuv420p planes with ``transfer_format='yuv420'``).

        Same dispatch structure as the pipelined whole-clip path — the kp
        stage, then every render segment issued back-to-back before any
        fetch — so total throughput matches ``render_uint8``, but the first
        segment is delivered after one segment's compute + fetch instead of
        the whole clip's: time-to-first-frame drops by ~(S-1)/S.  The
        reference has no streaming story at all (whole mp4 written at the
        end, ref:demo.py:477-515).  Concatenating the payloads equals the
        non-streaming result exactly.
        """
        o = self.options
        if o.adapt_scale:
            raise ValueError("render_stream does not support adapt_scale "
                             "(its convex-hull scale is a host round trip)")
        add_emo = o.add_emo if add_emo is None else add_emo
        T_clip = num_windows_for_samples(
            np.asarray(waveform).reshape(-1).shape[0])
        if self.use_unbounded(T_clip):
            yield from self._render_stream_unbounded(
                source_image, waveform, all_pose, transformed_video, add_emo)
            return
        T, args, emo_kw = self._prepare_full_render_args(
            source_image, waveform, all_pose, transformed_video, add_emo)
        src = args[0]
        kv, kj, kp_s, feats = self._dispatch_kp_stage(args, add_emo, emo_kw)
        S = max(1, o.overlap_segments)
        Tp = kv.shape[0]
        Tseg = Tp // S
        segs = [self._render_segment(self.vars, src, feats, kp_s, kv, kj,
                                     jnp.int32(i), Tseg)
                for i in range(S)]
        yuv = o.transfer_format == "yuv420"
        ns = max(1, o.fetch_streams)
        ny = max(1, (2 * ns) // 3) if yuv else ns
        for i, parts in enumerate(segs):
            keep = min(Tseg, max(0, T - i * Tseg))
            if keep <= 0:
                break
            fetched = fetch_parallel(parts)
            if yuv:
                y = np.concatenate(fetched[:ny], axis=0)[:keep]
                yield i * Tseg, (y, fetched[ny][:keep],
                                 fetched[ny + 1][:keep])
            else:
                yield i * Tseg, np.concatenate(fetched, axis=0)[:keep]

    def _render_rgb_uint8(self, source_image, waveform, all_pose,
                          transformed_video=None, add_emo=None) -> np.ndarray:
        o = self.options
        add_emo = o.add_emo if add_emo is None else add_emo
        if o.adapt_scale:
            frames = self._render_staged(source_image, waveform, all_pose,
                                         transformed_video, add_emo)
            return np.clip(np.round(frames * 255.0), 0, 255).astype(np.uint8)
        T_clip = num_windows_for_samples(
            np.asarray(waveform).reshape(-1).shape[0])
        if self.use_unbounded(T_clip):
            # long clip (stream_policy_frames): assemble from the unbounded
            # chunk programs — zero new whole-clip compiles, O(chunk) device
            # memory, host memory bounded by the clip itself
            return np.concatenate(
                [p for _, p in self._render_stream_unbounded(
                    source_image, waveform, all_pose, transformed_video,
                    add_emo)], axis=0)
        T, args, emo_kw = self._prepare_full_render_args(
            source_image, waveform, all_pose, transformed_video, add_emo)
        if o.overlap_segments > 1:
            return self._render_overlapped(args, add_emo, T, emo_kw)
        out = self._full_render(self.vars, *args, add_emo=add_emo, **emo_kw)
        return np.asarray(out)[:T]

    def _prepare_full_render_args(self, source_image, waveform, all_pose,
                                  transformed_video, add_emo):
        """Host-side input prep shared by the rgb and yuv420 fast paths.

        The frame count is pure shape arithmetic on the waveform length, so
        no device round trip happens here: the waveform is zero-padded to
        the bucketed length and the fused program computes MFCC inline."""
        o = self.options
        waveform = np.asarray(waveform, np.float32).reshape(-1)
        T = num_windows_for_samples(waveform.shape[0])
        # Tp must divide into overlap_segments equal chunk-aligned segments.
        bucket = _bucket(o.time_bucket,
                         o.frame_chunk * max(1, o.overlap_segments))
        Tp = _bucket(T, bucket)
        n_samples = max(waveform.shape[0], min_samples_for_windows(Tp))
        wav_p = np.zeros(n_samples, np.float32)
        wav_p[:waveform.shape[0]] = waveform
        pose_p = np.zeros((Tp, 6), np.float32)
        pose_p[:T] = self.prepare_pose(all_pose, T)

        emo_kw = {}
        if add_emo:
            if transformed_video is None:
                raise ValueError("add_emo requires transformed_video frames")
            if isinstance(transformed_video, EmotionHandle):
                h = transformed_video
                if h.feats is not None:
                    # zero-upload, zero-trunk path: the program consumes the
                    # precomputed [Ub, 512] feature table; the timestep ->
                    # frame index is built host-side with the TRUE row count
                    # so feats padding rows are never gathered
                    emo_frames = h.feats
                    emo_kw = {
                        "frame_index": jnp.asarray(
                            (np.arange(Tp) % h.n_frames).astype(np.int32)),
                        "emo_from_feats": True,
                    }
                else:
                    # non-linear heads: device-cached frames (upload saved).
                    # Truncate to Tp on device (a slice, no re-upload) so a
                    # longer emotion clip does not change the program shape
                    # — each distinct U > Tp would otherwise trigger a fresh
                    # whole-clip compile (10-25 min through the tunnel).
                    emo_frames = (h.frames[:Tp]
                                  if h.frames.shape[0] > Tp else h.frames)
            else:
                # keep only the unique frames; the fused program cycles them
                # with modular indexing (== np.resize, ref:demo.py:499-500).
                # Stays a HOST array here: the single-dispatch path uploads
                # it implicitly at the jit call, while the overlapped path
                # defers the upload until after stage A's dispatch so the
                # transfer streams during that compute (_dispatch_kp_stage).
                frames = np.asarray(transformed_video, np.float32)[:Tp]
                if o.transfer_format == "yuv420":
                    # lossy delivery path: ship packed yuv420 planes
                    # (12 bpp, half the uint8-RGB bytes — the cold
                    # emotional render pays this upload per call; the
                    # bit-exact "rgb" path ships f32)
                    frames = pack_yuv420_np(frames)
                emo_frames = frames
        else:
            emo_frames = jnp.zeros((1, 256, 256, 3), jnp.float32)

        src = jnp.asarray(source_image, jnp.float32)[None]
        return T, (src, jnp.asarray(wav_p), jnp.asarray(pose_p),
                   emo_frames), emo_kw

    def _render_staged(self, source_image, waveform, all_pose,
                       transformed_video=None, add_emo=None) -> np.ndarray:
        o = self.options
        add_emo = o.add_emo if add_emo is None else add_emo

        windows = self.audio_to_windows(waveform)
        T = windows.shape[0]
        Tp = _bucket(T, o.time_bucket)
        windows_p = np.zeros((Tp,) + windows.shape[1:], np.float32)
        windows_p[:T] = windows
        pose = self.prepare_pose(all_pose, T)
        pose_p = np.zeros((Tp, 6), np.float32)
        pose_p[:T] = pose

        src = jnp.asarray(source_image, jnp.float32)[None]
        kp_source, kp_audio, kp_initial, _ = self._audio_kp_stage(
            self.vars, src, jnp.asarray(windows_p), jnp.asarray(pose_p))
        kp_audio = {k: v[:T] for k, v in kp_audio.items()}
        if o.check_add:
            kp_audio = {k: jnp.broadcast_to(kp_initial[k][:1], v.shape)
                        for k, v in kp_audio.items()}

        if add_emo:
            if transformed_video is None:
                raise ValueError("add_emo requires transformed_video frames")
            if isinstance(transformed_video, EmotionHandle):
                frames = np.asarray(transformed_video.frames)
                if frames.dtype == np.uint8:
                    frames = frames.astype(np.float32) / 255.0
            else:
                frames = np.asarray(transformed_video, np.float32)
            if len(frames) < T:   # np.resize-style cycling (ref:demo.py:499-500)
                frames = np.resize(frames, (T,) + frames.shape[1:])
            frames = frames[:T]
            emo = self._emotion_stage(self.vars, jnp.asarray(frames),
                                      kp_audio["value"], kp_audio["jacobian"])
            kp_driving = self._compose_kp(kp_audio, emo)
        else:
            kp_driving = kp_audio

        scale = 1.0
        if o.adapt_scale:
            src_area = convex_hull_area(np.asarray(kp_source["value"][0]))
            drv_area = convex_hull_area(np.asarray(kp_initial["value"][0]))
            scale = float(np.sqrt(src_area) / np.sqrt(drv_area))
        kp_norm = normalize_kp(
            {k: v[0] for k, v in kp_source.items() if k != "heatmap"},
            kp_driving,
            {k: v[0] for k, v in kp_initial.items()},
            use_relative_movement=o.relative, use_relative_jacobian=o.relative,
            adapt_movement_scale=scale)

        # Render in fixed-size chunks (one compilation).
        gen = self.models["generator"]
        feats = gen.apply(self.vars["generator"], src,
                          method=gen.encode_source)
        F = o.frame_chunk
        n_chunks = int(math.ceil(T / F))
        out = np.zeros((n_chunks * F, 256, 256, 3), np.float32)
        val = np.zeros((n_chunks * F,) + kp_norm["value"].shape[1:], np.float32)
        jac = np.zeros((n_chunks * F,) + kp_norm["jacobian"].shape[1:], np.float32)
        val[:T] = np.asarray(kp_norm["value"])
        jac[:T] = np.asarray(kp_norm["jacobian"])
        jac[T:] = np.eye(2)
        for c in range(n_chunks):
            sl = slice(c * F, (c + 1) * F)
            out[sl] = np.asarray(self._render_chunk(
                self.vars, src, feats,
                {k: v for k, v in kp_source.items() if k != "heatmap"},
                jnp.asarray(val[sl]), jnp.asarray(jac[sl])))
        return out[:T]

    # -------------------------------------------------------- constructors

    @classmethod
    def from_random(cls, config: dict, rng=None,
                    options: PipelineOptions | None = None) -> "EammPipeline":
        """Random-weight pipeline (benchmarks, smoke tests)."""
        rng = jax.random.PRNGKey(0) if rng is None else rng
        options = options or PipelineOptions()
        models = cfg.build_all(config,
                               emotion_kind=options.emo_type.split("_")[0])
        k = jax.random.split(rng, 5)
        src = jnp.zeros((1, 256, 256, 3))
        kp0 = {"value": jnp.zeros((1, 10, 2)),
               "jacobian": jnp.broadcast_to(jnp.eye(2), (1, 10, 2, 2))}
        # jit the inits: eager op-by-op init dispatch is very slow on TPU.
        variables = {
            "kp_detector": jax.jit(models["kp_detector"].init)(k[0], src),
            "generator": jax.jit(models["generator"].init)(k[1], src, kp0, kp0),
            "kp_detector_a": jax.jit(models["kp_detector_a"].init)(
                k[2], jnp.zeros((1, 64, 64, 35))),
            "audio_feature": jax.jit(models["audio_feature"].init)(
                k[3], src, jnp.zeros((1, 2, 28, 12)), jnp.zeros((1, 2, 6))),
            "emo_detector": jax.jit(
                lambda key, x, v, j: models["emo_detector"].init(
                    key, x, v, j, head="all"))(
                k[4], src, kp0["value"], kp0["jacobian"]),
        }
        return cls(config, variables, options)

    @classmethod
    def from_torch_checkpoints(cls, config: dict, fomm_path: str,
                               audio_path: str, emo_path: str,
                               options: PipelineOptions | None = None
                               ) -> "EammPipeline":
        """Load the reference's three torch checkpoints (ref:demo.py:82-95)."""
        from eamm_tpu import compat
        options = options or PipelineOptions()
        fomm = compat.load_torch_checkpoint(fomm_path)
        audio = compat.load_torch_checkpoint(audio_path)
        emo = compat.load_torch_checkpoint(emo_path)
        convert_emo = (compat.convert_emotion_map
                       if options.emo_type.startswith("map")
                       else compat.convert_emotion_k)
        variables = {
            "generator": compat.convert_generator(fomm["generator"]),
            "kp_detector": compat.convert_kp_detector(fomm["kp_detector"]),
            "kp_detector_a": compat.convert_kp_detector_a(
                audio["kp_detector_a"]),
            "audio_feature": compat.convert_atnet(audio["audio_feature"]),
            "emo_detector": convert_emo(emo["emo_detector"]),
        }
        return cls(config, variables, options)
