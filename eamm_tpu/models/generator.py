"""Occlusion-aware generator (Johnson architecture).

Re-design of ref:modules/generator.py:8-97 with a TPU-oriented split: the
source-image encoding depends only on the source, so inference exposes
``encode_source`` (run once per clip) and ``decode`` (run per frame, vmapped
across the frame axis and sharded across the mesh) — the reference re-runs
the whole network per frame (ref:demo.py:279).  ``__call__`` composes both
for the training path and matches the reference contract.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

import jax
from eamm_tpu.models.blocks import (SameBlock, DownBlock, UpBlock, ResBlock,
                                    _ConvWeights)
from eamm_tpu.models.dense_motion import DenseMotionNetwork
from eamm_tpu.ops.warp import grid_sample, resize_bilinear


def _deform(feature: jnp.ndarray, deformation: jnp.ndarray) -> jnp.ndarray:
    """Warp [B,H,W,C] features by a [B,h,w,2] deformation, bilinearly
    resizing the deformation if resolutions differ (ref:modules/generator.py:50-57)."""
    H, W = feature.shape[1:3]
    if deformation.shape[1:3] != (H, W):
        deformation = resize_bilinear(deformation, (H, W))
    return grid_sample(feature, deformation)


class OcclusionAwareGenerator(nn.Module):
    num_channels: int = 3
    num_kp: int = 10
    block_expansion: int = 64
    max_features: int = 512
    num_down_blocks: int = 2
    num_bottleneck_blocks: int = 6
    estimate_occlusion_map: bool = True
    dense_motion_params: dict | None = None
    estimate_jacobian: bool = True

    def setup(self):
        if self.dense_motion_params is not None:
            self.dense_motion_network = DenseMotionNetwork(
                num_kp=self.num_kp, num_channels=self.num_channels,
                estimate_occlusion_map=self.estimate_occlusion_map,
                **self.dense_motion_params)
        else:
            self.dense_motion_network = None
        self.first = SameBlock(self.block_expansion, kernel=7, padding=3,
                               name="first")
        self.down_blocks = [
            DownBlock(min(self.max_features, self.block_expansion * (2 ** (i + 1))),
                      name=f"down{i}")
            for i in range(self.num_down_blocks)]
        bottleneck_features = min(self.max_features,
                                  self.block_expansion * (2 ** self.num_down_blocks))
        self.bottleneck = [ResBlock(bottleneck_features, name=f"res{i}")
                           for i in range(self.num_bottleneck_blocks)]
        self.up_blocks = [
            UpBlock(min(self.max_features,
                        self.block_expansion * (2 ** (self.num_down_blocks - i - 1))),
                    name=f"up{i}")
            for i in range(self.num_down_blocks)]
        # parameter-only twin of conv(num_channels, 7, padding=3): eval
        # computes the thin 64->3 conv on the space-to-depth grid (the
        # literal form leaves 125 of the MXU's 128 output lanes idle at
        # 256^2 — see eamm_tpu/ops/subpixel.py::conv_s2d)
        self.final = _ConvWeights(self.num_channels, 7, name="final")

    def encode_source(self, source_image: jnp.ndarray, train: bool = False):
        """Source-only feature volume [B, H/4, W/4, 256]."""
        out = self.first(source_image, train)
        for block in self.down_blocks:
            out = block(out, train)
        return out

    def decode(self, source_image: jnp.ndarray, source_features: jnp.ndarray,
               kp_driving: dict, kp_source: dict, train: bool = False,
               want_aux: bool = True, shared_source: bool = False) -> dict:
        """Per-frame motion + rendering given precomputed source features.

        want_aux=False skips the diagnostic outputs (mask, sparse_deformed
        and the full-resolution ``deformed`` source warp) — they are only
        consumed by training visualisation, and the 256^2 warp is pure
        overhead in the inference hot path.

        shared_source=True routes the bottleneck warp through the Pallas
        VMEM-resident kernel (valid when all batch elements share one
        source image, i.e. batched clip rendering) and additionally
        accepts 1-batch ``source_image`` / ``source_features`` with a
        B-batch keypoint set — the kernel reads the single shared feature
        block directly, so the caller never materializes the per-frame
        broadcast of the encoded source volume.
        """
        output = {}
        out = source_features
        B = kp_driving["value"].shape[0]
        if out.shape[0] != B and not shared_source:
            raise ValueError("source_features batch must match keypoints "
                             "unless shared_source=True")
        if shared_source and B % out.shape[0]:
            raise ValueError("shared_source needs the feature batch to "
                             "divide the keypoint batch")
        if self.dense_motion_network is not None:
            dense_motion = self.dense_motion_network(
                source_image, kp_driving=kp_driving, kp_source=kp_source,
                train=train, shared_source=shared_source)
            occlusion_map = dense_motion.get("occlusion_map")
            if want_aux:
                output["mask"] = dense_motion["mask"]
                output["sparse_deformed"] = dense_motion["sparse_deformed"]
                if occlusion_map is not None:
                    output["occlusion_map"] = occlusion_map
            deformation = dense_motion["deformation"]
            if (shared_source and out.shape[-1] % 128 == 0
                    and out.dtype == jnp.bfloat16):
                # bottleneck warp: gather-free VMEM two-level kernel, bf16
                # compute only (25.5->11.3 ms at [64,64,64,256] on v5e);
                # grid b reads source b // (B//Bi), so each shared source
                # serves a contiguous run of frames with no HBM repeat.
                # f32 stays on the exact gather path: the kernel's
                # f32-exact mode needs multi-pass MXU dots and measures
                # SLOWER than the gather (39.5 vs 30 ms), and its native
                # precision would break the <1e-2 parity guarantee.
                from eamm_tpu.ops.warp_pallas import grid_sample_twolevel_pallas
                if deformation.shape[1:3] != out.shape[1:3]:
                    deformation = resize_bilinear(deformation, out.shape[1:3])
                out = grid_sample_twolevel_pallas(out, deformation)
            else:
                if out.shape[0] != B:
                    out = jnp.repeat(out, B // out.shape[0], axis=0)
                out = _deform(out, deformation)
            if occlusion_map is not None:
                if out.shape[1:3] != occlusion_map.shape[1:3]:
                    occlusion_map = resize_bilinear(occlusion_map, out.shape[1:3])
                out = out * occlusion_map
            if want_aux:
                if source_image.shape[0] != B:
                    source_image = jnp.repeat(
                        source_image, B // source_image.shape[0], axis=0)
                output["deformed"] = _deform(source_image, deformation)

        for block in self.bottleneck:
            out = block(out, train)
        for block in self.up_blocks:
            out = block(out, train)
        k, bias = self.final(out.shape[-1])
        dt = jnp.promote_types(out.dtype, k.dtype)
        out, k, bias = out.astype(dt), k.astype(dt), bias.astype(dt)
        if not train and out.shape[1] % 4 == 0 and out.shape[2] % 4 == 0:
            # implicit space-to-depth: the stride-4 phase-expanded conv
            # avoids conv_s2d's full-activation input transpose (measured
            # faster at this 256^2 shape, benchmarks/bench_s2d_strided.py)
            from eamm_tpu.ops.subpixel import conv_s2d_strided
            out = conv_s2d_strided(out, k, block=4) + bias
        else:
            dn = jax.lax.conv_dimension_numbers(
                out.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
            out = jax.lax.conv_general_dilated(
                out, k, window_strides=(1, 1), padding=((3, 3), (3, 3)),
                dimension_numbers=dn) + bias
        output["prediction"] = nn.sigmoid(out)
        return output

    def __call__(self, source_image: jnp.ndarray, kp_driving: dict,
                 kp_source: dict, train: bool = False) -> dict:
        features = self.encode_source(source_image, train)
        return self.decode(source_image, features, kp_driving, kp_source, train)
