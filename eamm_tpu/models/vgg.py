"""VGG19 feature extractor for the pyramid perceptual loss.

5 feature slices after the relu at torchvision ``features`` indices
2/7/12/21/30, with ImageNet normalization folded in
(ref:modules/model.py:10-50).  Weights come from a torchvision state_dict
via ``convert_vgg19`` — pretrained weights are loaded when a weights file is
available, otherwise training falls back to random features (documented in
train docs; the image has no network access).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from eamm_tpu.models.blocks import conv

# torchvision vgg19.features conv indices per slice (conv layers only; the
# boundaries 2/7/12/21/30 are after-relu cut points, maxpools in between).
_SLICES = (
    [(0, 64)],                                        # conv1_1
    [(2, 64), ("pool", 0), (5, 128)],                 # conv1_2, pool, conv2_1
    [(7, 128), ("pool", 0), (10, 256)],               # conv2_2, pool, conv3_1
    [(12, 256), (14, 256), (16, 256), ("pool", 0), (19, 512)],
    [(21, 512), (23, 512), (25, 512), ("pool", 0), (28, 512)],
)

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class Vgg19(nn.Module):
    """Exact torchvision VGG19 slicing: convs + ReLU with MaxPool2d(2).
    x in [0,1], NHWC -> list of 5 after-relu feature maps."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        h = (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
        outs = []
        for layers in _SLICES:
            for item, features in layers:
                if item == "pool":
                    h = nn.max_pool(h, (2, 2), strides=(2, 2))
                else:
                    h = nn.relu(conv(features, 3, padding=1,
                                     name=f"conv{item}")(h))
            outs.append(h)
        return outs


def convert_vgg19(state_dict) -> dict:
    """torchvision vgg19 state_dict -> Vgg19 params."""
    params = {}
    for layers in _SLICES:
        for item, _ in layers:
            if item == "pool":
                continue
            w = np.asarray(state_dict[f"features.{item}.weight"])
            b = np.asarray(state_dict[f"features.{item}.bias"])
            params[f"conv{item}"] = {"kernel": w.transpose(2, 3, 1, 0),
                                     "bias": b}
    return {"params": params}
