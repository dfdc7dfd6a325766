"""Keypoint detectors: image -> K keypoints + 2x2 local Jacobians.

``KPDetector`` consumes an RGB image (antialias-downsampled x0.25);
``KPDetectorA`` shares the same head but reads the 35-channel 64x64 feature
map produced by the audio decoder (ref:modules/keypoint_detector.py:7-205).

Returned dict: {'value': [B,K,2], 'heatmap': [B,K,58,58],
'jacobian': [B,K,2,2]} — identical contract to the reference.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from eamm_tpu.models.blocks import Hourglass, conv
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
    def __call__(self, feature_map: jnp.ndarray) -> dict:
        prediction = conv(self.num_kp, 7, padding=0, name="kp")(feature_map)
        prediction = jnp.moveaxis(prediction, -1, 1)          # [B,K,h,w]
        heatmap = heatmap_softmax(prediction, self.temperature)
        out = {"heatmap": heatmap}

        if self.estimate_jacobian:
            num_maps = 1 if self.single_jacobian_map else self.num_kp
            jac_conv = nn.Conv(4 * num_maps, (7, 7), padding=((0, 0), (0, 0)),
                               kernel_init=nn.initializers.zeros,
                               bias_init=_identity_jacobian_bias,
                               name="jacobian")
            jmap = jnp.moveaxis(jac_conv(feature_map), -1, 1)  # [B,4M,h,w]
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
                       self.single_jacobian_map, name="head")(feature_map)


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
                       self.single_jacobian_map, name="head")(feature_map)
