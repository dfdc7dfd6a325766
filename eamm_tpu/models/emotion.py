"""Implicit Emotion Displacement Learner.

Predicts additive keypoint/Jacobian displacements for a subset of keypoints
from a (mouth-masked) emotion-source frame, plus an 8-way emotion
classification used as an auxiliary loss.  Re-design of ``Emotion_k`` /
``Emotion_map`` (ref:modules/util.py:1223-1737).

Trunk: antialias x0.25 -> Hourglass(32, 5, 1024) -> ResNet-18-style layers
-> global average pool -> 512-d feature.  Keypoint conditioning: NeRF-style
positional embedding of the 10 neutral keypoints (value||jacobian = 6 dims,
10 frequencies -> 126/kp, ref:modules/util.py:97-145,1254).

Head variants (matching the reference training/demo ``type`` strings, with
the reference's broken ``linear_4`` head made coherent — its ``fc_single``
is referenced but never constructed upstream, ref:modules/util.py:1387 vs
SURVEY.md §5.1):

- ``linear``  (demo ``--type linear_3``): 4-kp displacement via Conv1d stack
- ``linear_10``: 10-kp displacement
- ``linear_np_4`` / ``linear_np_10``: no positional embedding (``fc_n``)
- ``map`` / ``map_4``: decode a 35-ch feature map and read kp through conv
  heads + spatial softmax (Emotion_map)
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from eamm_tpu.models.blocks import dense, BatchNorm, Hourglass, ConvTranspose, conv
from eamm_tpu.models.kp_detector import _KPHead
from eamm_tpu.ops.antialias import antialias_downsample


def positional_embed(x: jnp.ndarray, num_freqs: int = 10) -> jnp.ndarray:
    """NeRF positional encoding: [x, sin(2^i x), cos(2^i x)] for i<num_freqs
    (log-sampled, include_input=True; ref:modules/util.py:97-145)."""
    outs = [x]
    for i in range(num_freqs):
        freq = 2.0 ** i
        outs.append(jnp.sin(x * freq))
        outs.append(jnp.cos(x * freq))
    return jnp.concatenate(outs, axis=-1)


class BasicBlock(nn.Module):
    """ResNet-18 basic block, post-activation (ref:modules/util.py:1069-1098)."""
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = conv(self.features, 3, stride=self.stride, padding=1,
                   use_bias=False, name="conv1")(x)
        out = BatchNorm(self.features, name="bn1")(out, train)
        out = nn.relu(out)
        out = conv(self.features, 3, padding=1, use_bias=False,
                   name="conv2")(out)
        out = BatchNorm(self.features, name="bn2")(out, train)
        if self.downsample:
            residual = conv(self.features, 1, stride=self.stride,
                            use_bias=False, name="ds_conv")(x)
            residual = BatchNorm(self.features, name="ds_bn")(residual, train)
        return nn.relu(out + residual)


class ResNetTrunk(nn.Module):
    """conv1 + 4 layers of [2,2,2,2] BasicBlocks + global avgpool -> 512
    (ref:modules/util.py:1241-1252,1316-1331)."""

    @nn.compact
    def __call__(self, feature_map, train: bool):
        f = conv(64, 3, padding=1, use_bias=False, name="conv1")(feature_map)
        f = BatchNorm(64, name="bn1")(f, train)
        f = nn.relu(f)
        f = nn.max_pool(f, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for li, (planes, stride) in enumerate(
                [(64, 1), (128, 2), (256, 2), (512, 2)]):
            for bi in range(2):
                ds = bi == 0 and (stride != 1 or (li == 0 and planes != 64))
                f = BasicBlock(planes, stride if bi == 0 else 1, ds,
                               name=f"layer{li + 1}_{bi}")(f, train)
        return jnp.mean(f, axis=(1, 2))                        # [B,512]


class _MLP(nn.Module):
    features: tuple
    name_prefix: str = "fc"

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.relu(dense(f, name=f"{self.name_prefix}{i}")(x))
        return x


class Conv1dBlock(nn.Module):
    """torch Conv1d with symmetric padding; input [B, L, C]."""
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel,), strides=(self.stride,),
                       padding=((self.padding, self.padding),),
                       name="conv")(x)


class EmotionK(nn.Module):
    """Linear-head emotion displacement learner (ref:modules/util.py:1223-1527)."""
    block_expansion: int = 32
    num_channels: int = 3
    max_features: int = 1024
    num_blocks: int = 5
    scale_factor: float = 0.25
    num_classes: int = 8

    def setup(self):
        self.predictor = Hourglass(self.block_expansion, self.num_blocks,
                                   self.max_features, name="predictor")
        self.trunk = ResNetTrunk(name="trunk")
        self.fc_p = _MLP((1024, 512), name="fc_p")
        self.fc_n = _MLP((128, 512), name="fc_n")
        self.fc_all = _MLP((512, 256, 64), name="fc_all")
        self.fc_single = _MLP((256, 64), name="fc_single")
        self.classify = dense(self.num_classes, name="classify")
        # final: Conv1d(1,2,4,2,1) -> MaxPool1d(2,2) -> ReLU -> Conv1d(2,4,4,2,1)
        #        -> ReLU -> Conv1d(4,4,3)       (ref:modules/util.py:1287-1295)
        self.final_c0 = Conv1dBlock(2, 4, 2, 1, name="final_c0")
        self.final_c1 = Conv1dBlock(4, 4, 2, 1, name="final_c1")
        self.final_c2 = Conv1dBlock(4, 3, 1, 0, name="final_c2")
        # final_4 (ref:modules/util.py:1297-1303)
        self.final4_c0 = Conv1dBlock(4, 3, 1, 1, name="final4_c0")
        self.final4_c1 = Conv1dBlock(4, 3, 1, 0, name="final4_c1")
        # final_10 (ref:modules/util.py:1305-1312)
        self.final10_c0 = Conv1dBlock(8, 3, 1, 1, name="final10_c0")
        self.final10_c1 = Conv1dBlock(10, 3, 1, 0, name="final10_c1")

    def feature(self, x, train: bool = False):
        """Image -> 512-d trunk feature (ref:modules/util.py:1477-1496)."""
        x = antialias_downsample(x, self.scale_factor)
        fm = self.predictor(x, train)
        return self.trunk(fm, train)

    def _neutral_feature(self, value, jacobian, use_embedding: bool):
        B = value.shape[0]
        neu = jnp.concatenate(
            [value, jacobian.reshape(B, value.shape[1], 4)], axis=2)
        if use_embedding:
            return self.fc_p(positional_embed(neu).reshape(B, -1))
        return self.fc_n(neu.reshape(B, -1))

    def _final(self, x):                       # x: [B,1,64] (L=64,C=1 -> NLC [B,64,1])
        h = jnp.swapaxes(x, 1, 2)              # [B,64,1]
        h = self.final_c0(h)                   # [B,32,2]
        h = nn.max_pool(h, (2,), strides=(2,), padding="VALID")
        h = nn.relu(h)
        h = nn.relu(self.final_c1(h))          # [B,8,4]
        h = self.final_c2(h)                   # [B,6,4]
        return jnp.swapaxes(h, 1, 2)           # [B,4,6]

    def _final_4(self, x):                     # [B,4,16] channels-first
        h = jnp.swapaxes(x, 1, 2)              # [B,16,4]
        h = self.final4_c0(h)
        h = nn.max_pool(h, (2,), strides=(2,), padding="VALID")
        h = nn.relu(h)
        h = self.final4_c1(h)                  # [B,6,4]
        return jnp.swapaxes(h, 1, 2)           # [B,4,6]

    def _final_10(self, x):                    # [B,4,16] channels-first
        h = jnp.swapaxes(x, 1, 2)              # [B,16,4]
        h = self.final10_c0(h)                 # [B,16,8]
        h = nn.max_pool(h, (2,), strides=(2,), padding="VALID")
        h = nn.relu(h)
        h = self.final10_c1(h)                 # [B,6,10]
        return jnp.swapaxes(h, 1, 2)           # [B,10,6]

    @staticmethod
    def _split(result, num_kp):
        value = result[:, :, :2]
        jacobian = result[:, :, 2:].reshape(result.shape[0], num_kp, 2, 2)
        return {"value": value, "jacobian": jacobian}

    def __call__(self, x, value, jacobian, head: str = "linear",
                 train: bool = False):
        """Emotion frame + neutral kp -> (displacement kp dict, emotion logits).

        head: 'linear' (4-kp, demo --type linear_3) | 'linear_10' |
              'linear_4' | 'linear_np_4' | 'linear_np_10' | 'all' ('all' is
              for initialization: creates parameters of every head — torch
              constructs them all up front — and returns the 'linear' result).
        """
        out = self.feature(x, train)
        fake = self.classify(out)
        if head == "all":
            result = None
            for h in ("linear", "linear_10", "linear_4", "linear_np_4",
                      "linear_np_10"):
                kp, _ = self._apply_head(h, out, value, jacobian)
                result = result if result is not None else kp
            return result, fake
        kp, _ = self._apply_head(head, out, value, jacobian)
        return kp, fake

    def _apply_head(self, head, out, value, jacobian):
        if head == "linear":
            ner = self._neutral_feature(value, jacobian, True)
            all_fc = self.fc_all(jnp.concatenate([out, ner], axis=1))[:, None]
            kp = self._split(self._final(all_fc), 4)
        elif head == "linear_10":
            ner = self._neutral_feature(value, jacobian, True)
            all_fc = self.fc_all(jnp.concatenate([out, ner], axis=1))
            kp = self._split(self._final_10(all_fc.reshape(-1, 4, 16)), 10)
        elif head == "linear_4":
            all_fc = self.fc_single(out)[:, None]
            kp = self._split(self._final(all_fc), 4)
        elif head == "linear_np_4":
            ner = self._neutral_feature(value, jacobian, False)
            all_fc = self.fc_all(jnp.concatenate([out, ner], axis=1))[:, None]
            kp = self._split(self._final(all_fc), 4)
        elif head == "linear_np_10":
            ner = self._neutral_feature(value, jacobian, False)
            all_fc = self.fc_all(jnp.concatenate([out, ner], axis=1))
            kp = self._split(self._final_10(all_fc.reshape(-1, 4, 16)), 10)
        else:
            raise ValueError(f"unknown EmotionK head {head!r}")
        return kp, None

    def emotion_feature(self, feature, value, jacobian):
        """Precomputed 512-d feature variant (ref:modules/util.py:1459-1475)."""
        fake = self.classify(feature)
        ner = self._neutral_feature(value, jacobian, True)
        all_fc = self.fc_all(jnp.concatenate([feature, ner], axis=1))[:, None]
        kp = self._split(self._final(all_fc), 4)
        return kp, fake


class EmotionMap(nn.Module):
    """Map-head variant: decode a 35-channel 64x64 map, read kp/jacobians
    through 7x7 conv heads + spatial softmax (ref:modules/util.py:1529-1737)."""
    block_expansion: int = 32
    num_channels: int = 3
    max_features: int = 1024
    num_blocks: int = 5
    scale_factor: float = 0.25
    num_classes: int = 8
    temperature: float = 0.1

    def setup(self):
        self.predictor = Hourglass(self.block_expansion, self.num_blocks,
                                   self.max_features, name="predictor")
        self.trunk = ResNetTrunk(name="trunk")
        self.fc_p = _MLP((1024, 512), name="fc_p")
        self.fc_all = _MLP((2048,), name="fc_all")
        self.classify = dense(self.num_classes, name="classify")
        self.decon = [ConvTranspose(128, 4, 2, 1, name="decon0"),
                      ConvTranspose(64, 4, 2, 1, name="decon1"),
                      ConvTranspose(64, 4, 2, 1, name="decon2"),
                      ConvTranspose(35, 4, 2, 1, name="decon3")]
        self.decon_norms = [BatchNorm(128, name="norm0"),
                            BatchNorm(64, name="norm1"),
                            BatchNorm(64, name="norm2")]
        self.head_10 = _KPHead(10, self.temperature, True, name="head_10")
        self.head_4 = _KPHead(4, self.temperature, True, name="head_4")

    def _feature_map(self, x, value, jacobian, train: bool):
        xs = antialias_downsample(x, self.scale_factor)
        fm = self.predictor(xs, train)
        out = self.trunk(fm, train)
        fake = self.classify(out)
        B = value.shape[0]
        neu = jnp.concatenate(
            [value, jacobian.reshape(B, value.shape[1], 4)], axis=2)
        ner = self.fc_p(positional_embed(neu).reshape(B, -1))
        all_fc = self.fc_all(jnp.concatenate([out, ner], axis=1))
        # torch view(-1, 128, 4, 4) is channels-first -> NHWC transpose.
        h = all_fc.reshape(B, 128, 4, 4).transpose(0, 2, 3, 1)
        for i, de in enumerate(self.decon[:-1]):
            h = nn.relu(self.decon_norms[i](de(h), train))
        return self.decon[-1](h), fake                         # [B,64,64,35]

    def __call__(self, x, value, jacobian, head: str = "map",
                 train: bool = False):
        fmap, fake = self._feature_map(x, value, jacobian, train)
        if head == "all":      # initialization: create both heads' params
            out10 = self.head_10(fmap)
            self.head_4(fmap)
            return out10, fake
        if head in ("map", "map_10"):
            return self.head_10(fmap), fake
        if head == "map_4":
            return self.head_4(fmap), fake
        raise ValueError(f"unknown EmotionMap head {head!r}")
