"""Keypoint detectors: image -> K keypoints + 2x2 local Jacobians.

``KPDetector`` consumes an RGB image (antialias-downsampled x0.25);
``KPDetectorA`` shares the same head but reads the 35-channel 64x64 feature
map produced by the audio decoder (ref:modules/keypoint_detector.py:7-205).

Returned dict: {'value': [B,K,2], 'heatmap': [B,K,58,58],
'jacobian': [B,K,2,2]} — identical contract to the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from eamm_tpu.models.blocks import Hourglass, _ConvWeights
from eamm_tpu.ops.antialias import antialias_downsample
from eamm_tpu.ops.grid import heatmap_softmax, gaussian2kp


def _identity_jacobian_bias(key, shape, dtype=jnp.float32):
    """Jacobian head bias initialized to [1,0,0,1] per map
    (ref:modules/keypoint_detector.py:27-28)."""
    n = shape[0] // 4
    return jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 1.0], dtype), n)


class _KPHead(nn.Module):
    """7x7 unpadded conv heads over an hourglass feature map -> kp dict."""
    num_kp: int
    temperature: float
    estimate_jacobian: bool
    single_jacobian_map: bool = False

    @nn.compact
    def __call__(self, feature_map: jnp.ndarray,
                 train: bool = False) -> dict:
        # Parameter-only twins of the two 7x7 VALID conv heads: eval fuses
        # kp (K lanes) + jacobian (4K lanes) into ONE space-to-depth conv
        # (eamm_tpu/ops/subpixel.py::conv_s2d with pad=0 computes the
        # unpadded alignment on the full block grid; the VALID region is a
        # slice) — the literal pair leaves most of the MXU's 128 output
        # lanes idle and reads the hourglass features twice per frame.
        cf = feature_map.shape[-1]
        k = 7  # VALID head kernel size; the eval slice below depends on it
        kk, kb = _ConvWeights(self.num_kp, k, name="kp")(cf)
        num_maps = 1 if self.single_jacobian_map else self.num_kp
        jk = jb = None
        if self.estimate_jacobian:
            jk, jb = _ConvWeights(4 * num_maps, k,
                                  kernel_init=nn.initializers.zeros,
                                  bias_init=_identity_jacobian_bias,
                                  name="jacobian")(cf)
        H, W = feature_map.shape[1:3]
        dt = jnp.promote_types(feature_map.dtype, kk.dtype)
        fm = feature_map.astype(dt)
        if jk is not None:
            w_all = jnp.concatenate([kk, jk], axis=-1).astype(dt)
            b_all = jnp.concatenate([kb, jb]).astype(dt)
        else:
            w_all, b_all = kk.astype(dt), kb.astype(dt)
        if not train and H % 4 == 0 and W % 4 == 0:
            from eamm_tpu.ops.subpixel import conv_s2d
            y = conv_s2d(fm, w_all, block=4, pad=0)
            y = y[:, :H - (k - 1), :W - (k - 1)] + b_all
        else:
            dn = jax.lax.conv_dimension_numbers(
                fm.shape, w_all.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                fm, w_all, window_strides=(1, 1), padding=((0, 0), (0, 0)),
                dimension_numbers=dn) + b_all
        prediction = jnp.moveaxis(y[..., :self.num_kp], -1, 1)  # [B,K,h,w]
        heatmap = heatmap_softmax(prediction, self.temperature)
        out = {"heatmap": heatmap}

        if self.estimate_jacobian:
            jmap = jnp.moveaxis(y[..., self.num_kp:], -1, 1)   # [B,4M,h,w]
            B, _, h, w = jmap.shape
            jmap = jmap.reshape(B, num_maps, 4, h, w)
            if num_maps == self.num_kp:
                # fused softmax-expectation kernel (one HBM pass for value
                # + jacobian; Pallas on TPU).  ``heatmap`` above is kept
                # for the part1 mimic loss — inference programs drop it and
                # XLA DCEs its softmax chain.
                from eamm_tpu.ops.kp_expectation import kp_expectation
                value, jac = kp_expectation(prediction, jmap,
                                            self.temperature)
                out["value"], out["jacobian"] = value, jac
            else:
                out["value"] = gaussian2kp(heatmap)
                # heatmap-weighted average of the per-pixel jacobian entries
                weighted = heatmap[:, :, None] * jmap          # [B,K,4,h,w]
                jac = jnp.sum(weighted, axis=(-2, -1))         # [B,K,4]
                out["jacobian"] = jac.reshape(B, self.num_kp, 2, 2)
        else:
            out["value"] = gaussian2kp(heatmap)
        return out


class KPDetector(nn.Module):
    """RGB image keypoint detector (ref:modules/keypoint_detector.py:7-105)."""
    num_kp: int = 10
    block_expansion: int = 32
    max_features: int = 1024
    num_blocks: int = 5
    temperature: float = 0.1
    estimate_jacobian: bool = True
    scale_factor: float = 0.25
    single_jacobian_map: bool = False
    num_channels: int = 3       # kept for config parity; inferred from input

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> dict:
        x = antialias_downsample(image, self.scale_factor)
        feature_map = Hourglass(self.block_expansion, self.num_blocks,
                                self.max_features, name="predictor")(x, train)
        return _KPHead(self.num_kp, self.temperature, self.estimate_jacobian,
                       self.single_jacobian_map, name="head")(feature_map,
                                                             train)


class KPDetectorA(nn.Module):
    """Audio-feature keypoint detector: reads the 35-channel 64x64 map from
    the A2FD decoder; no image encoder in the forward path
    (ref:modules/keypoint_detector.py:110-205; its hourglass is constructed
    but unused, so we simply don't have one)."""
    num_kp: int = 10
    temperature: float = 0.1
    estimate_jacobian: bool = True
    single_jacobian_map: bool = False
    # Accepted for YAML-config parity (ref:config/train_part1.yaml audio_params):
    num_channels: int = 3
    num_channels_a: int = 3
    block_expansion: int = 32
    max_features: int = 1024
    num_blocks: int = 5
    scale_factor: float = 0.25

    @nn.compact
    def __call__(self, feature_map: jnp.ndarray, train: bool = False) -> dict:
        return _KPHead(self.num_kp, self.temperature, self.estimate_jacobian,
                       self.single_jacobian_map, name="head")(feature_map,
                                                              train)
