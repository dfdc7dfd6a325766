"""Sparse keypoint motion -> dense deformation field + occlusion map.

Re-design of ref:modules/dense_motion.py for TPU: the K+1 deformed source
copies are produced by one batched grid_sample (folding the K+1 axis into
the batch), the heatmap/motion math comes from eamm_tpu.ops, and the whole
forward is a single fused XLA program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from eamm_tpu.models.blocks import Hourglass, _ConvWeights
from eamm_tpu.ops.antialias import antialias_downsample
from eamm_tpu.ops.grid import kp2gaussian
from eamm_tpu.ops.motion import sparse_motions
from eamm_tpu.ops.warp import grid_sample


class DenseMotionNetwork(nn.Module):
    """ref:modules/dense_motion.py:7-113; config ref:config/train_part1.yaml."""
    num_kp: int = 10
    block_expansion: int = 64
    max_features: int = 1024
    num_blocks: int = 5
    scale_factor: float = 0.25
    kp_variance: float = 0.01
    estimate_occlusion_map: bool = True
    num_channels: int = 3

    @nn.compact
    def __call__(self, source_image: jnp.ndarray, kp_driving: dict,
                 kp_source: dict, train: bool = False,
                 shared_source: bool = False) -> dict:
        """shared_source=True additionally allows a 1-batch
        ``source_image`` with a B-batch keypoint set (the batched-clip
        inference case): the 256^2 source is downsampled ONCE and only the
        64^2 result broadcasts per frame, instead of the caller
        materializing B copies of the full-resolution image.  The
        narrow-channel warps always use the gather-free twolevel dispatch
        inside grid_sample."""
        src = antialias_downsample(source_image, self.scale_factor)
        B = kp_driving["value"].shape[0]
        _, h, w, C = src.shape
        if src.shape[0] != B and (not shared_source or B % src.shape[0]):
            raise ValueError("source batch must match (or, with "
                             "shared_source, divide) the keypoint batch")
        K = self.num_kp

        # Heatmap representation: gaussian(driving) - gaussian(source), plus a
        # zero background channel (ref:modules/dense_motion.py:32-45).
        heatmap = (kp2gaussian(kp_driving["value"], (h, w), self.kp_variance)
                   - kp2gaussian(kp_source["value"], (h, w), self.kp_variance))
        heatmap = jnp.concatenate(
            [jnp.zeros((B, 1, h, w), heatmap.dtype), heatmap], axis=1)

        # Sparse motions [B, K+1, h, w, 2] and K+1 deformed source copies via
        # one batched warp (ref:modules/dense_motion.py:47-79).
        motions = sparse_motions((h, w), kp_driving["value"], kp_source["value"],
                                 kp_driving.get("jacobian"),
                                 kp_source.get("jacobian"))
        # Narrow-channel source warp.  Batched bf16 inference (shared_source)
        # routes through the VMEM-resident small-C Pallas kernel: the XLA
        # twolevel path streams a [B*(K+1), P, W*C] rows intermediate through
        # HBM in chunks (43.8 ms per 128-frame render program at the
        # production shape on v5e) while the kernel keeps rows in VMEM and
        # the 24 KB shared source resident across the launch (34.5 ms) —
        # and the B*(K+1)-fold HBM repeat of the source disappears (the
        # kernel indexes block b // group in-kernel).  Everything else
        # (training, f32, CPU) keeps the gather-free twolevel dispatch
        # inside grid_sample.
        if (shared_source and src.dtype == jnp.bfloat16
                and C <= 8 and h * w <= 4096):
            from eamm_tpu.ops.warp_pallas import grid_sample_smallc_pallas
            deformed = grid_sample_smallc_pallas(
                src, motions.reshape(B * (K + 1), h, w, 2))
        else:
            if src.shape[0] != B:
                src = jnp.repeat(src, B // src.shape[0], axis=0)
            src_rep = jnp.broadcast_to(src[:, None], (B, K + 1, h, w, C))
            deformed = grid_sample(src_rep.reshape(B * (K + 1), h, w, C),
                                   motions.reshape(B * (K + 1), h, w, 2))
        deformed = deformed.reshape(B, K + 1, h, w, C)

        out = {"sparse_deformed": deformed}

        # Hourglass over [heatmap | deformed]: channel c = kp*(C+1) + (0 for
        # the heatmap, 1..C for the deformed copy), matching the reference's
        # concat-then-flatten (ref:modules/dense_motion.py:93-94).
        hg_in = jnp.concatenate(
            [heatmap[:, :, None], deformed.transpose(0, 1, 4, 2, 3)], axis=2)
        hg_in = hg_in.reshape(B, (K + 1) * (C + 1), h, w)
        hg_in = jnp.moveaxis(hg_in, 1, -1)                     # NHWC
        prediction = Hourglass(self.block_expansion, self.num_blocks,
                               self.max_features, name="hourglass")(hg_in, train)

        # Parameter-only twins of conv(K+1, 7, pad=3) / conv(1, 7, pad=3):
        # eval fuses both thin heads into ONE space-to-depth conv (the
        # literal pair leaves 116 of the MXU's 128 output lanes idle and
        # reads the hourglass features twice — see
        # eamm_tpu/ops/subpixel.py::conv_s2d).
        cp = prediction.shape[-1]
        km, bm = _ConvWeights(K + 1, 7, name="mask")(cp)
        if self.estimate_occlusion_map:
            ko, bo = _ConvWeights(1, 7, name="occlusion")(cp)
        dt = jnp.promote_types(prediction.dtype, km.dtype)
        pred = prediction.astype(dt)
        if not train and h % 4 == 0 and w % 4 == 0:
            from eamm_tpu.ops.subpixel import conv_s2d
            w_all = km if not self.estimate_occlusion_map else (
                jnp.concatenate([km, ko], axis=-1))
            b_all = bm if not self.estimate_occlusion_map else (
                jnp.concatenate([bm, bo], axis=-1))
            y = conv_s2d(pred, w_all.astype(dt), block=4) + b_all.astype(dt)
            mask_raw = y[..., :K + 1]
            occ_raw = y[..., K + 1:] if self.estimate_occlusion_map else None
        else:
            dn = jax.lax.conv_dimension_numbers(
                pred.shape, km.shape, ("NHWC", "HWIO", "NHWC"))
            mask_raw = jax.lax.conv_general_dilated(
                pred, km.astype(dt), window_strides=(1, 1),
                padding=((3, 3), (3, 3)),
                dimension_numbers=dn) + bm.astype(dt)
            occ_raw = None
            if self.estimate_occlusion_map:
                occ_raw = jax.lax.conv_general_dilated(
                    pred, ko.astype(dt), window_strides=(1, 1),
                    padding=((3, 3), (3, 3)),
                    dimension_numbers=dn) + bo.astype(dt)
        mask = nn.softmax(mask_raw, axis=-1)                   # [B,h,w,K+1]
        out["mask"] = mask
        deformation = jnp.einsum("bhwk,bkhwc->bhwc", mask, motions)
        out["deformation"] = deformation                       # [B,h,w,2]

        if self.estimate_occlusion_map:
            out["occlusion_map"] = nn.sigmoid(occ_raw)         # [B,h,w,1]
        return out
