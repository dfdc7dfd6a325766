"""Auxiliary / experimental networks of the reference, TPU-native.

None of these are wired into the shipped training or demo configs, but they
are part of the reference's component surface (SURVEY.md §2.2): audio
content / emotion encoders, feature->map decoders, the emotion classifier
trunk, and the AdaIN-conditioned A2FD variant.

- CtEncoder       audio-content encoder        (ref:modules/util.py:618-644)
- EmotionNet      audio-emotion encoder        (ref:modules/util.py:647-712)
- AF2F / AF2FS    feature -> 35-ch map decoders (ref:modules/util.py:715-773)
- A2I             audio -> 2-ch image decoder  (ref:modules/util.py:776-813)
- NANet           neutral -> feature deconv    (ref:modules/util.py:175-201)
- EmDetector      emotion classifier trunk     (ref:modules/util.py:1139-1216)
- AudioFeature    Ct_encoder+EmotionNet+AF2F_s wrapper
                  (ref:modules/keypoint_detector.py:208-228)
- TFNet           AdaIN-conditioned A2FD       (ref:modules/util.py:321-511)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from eamm_tpu.models.blocks import dense, BatchNorm, ConvBlock, ConvTranspose
from eamm_tpu.models.audio import (LSTM, ImageEncoder, AudioEncoder,
                                   PoseEncoder, FeatureDecoder)
from eamm_tpu.models.emotion import ResNetTrunk
from eamm_tpu.models.blocks import Hourglass
from eamm_tpu.ops.antialias import antialias_downsample


class CtEncoder(nn.Module):
    """Audio content encoder: MFCC window -> 256-d (same conv stack as the
    A2FD audio encoder)."""

    @nn.compact
    def __call__(self, mfcc: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # mfcc: [B, 1, 28, 12] (torch NCHW convention) or [B, 28, 12]
        if mfcc.ndim == 4:
            mfcc = mfcc[:, 0]
        return AudioEncoder(name="encoder")(mfcc, train)


class EmotionNet(nn.Module):
    """Audio emotion encoder over the transposed [12, 28] MFCC window ->
    128-d feature (ref:modules/util.py:647-712)."""

    @nn.compact
    def __call__(self, mfcc: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if mfcc.ndim == 4:
            mfcc = mfcc[:, 0]
        x = jnp.swapaxes(mfcc, 1, 2)[..., None]       # [B,12,28,1]
        x = ConvBlock(64, name="conv0")(x, train)
        x = nn.max_pool(x, (1, 3), strides=(1, 2), padding="VALID")
        x = ConvBlock(128, name="conv1")(x, train)
        x = ConvBlock(256, name="conv2")(x, train)
        x = nn.max_pool(x, (12, 1), strides=(12, 1), padding="VALID")
        x = ConvBlock(512, name="conv3")(x, train)
        x = nn.max_pool(x, (1, 2), strides=(1, 2), padding="VALID")
        # torch flattens NCHW [B,512,1,6]; ours is [B,1,6,512]
        x = jnp.swapaxes(x, 1, 3).reshape(x.shape[0], -1)
        x = nn.relu(dense(2048, name="fc0")(x))
        return nn.relu(dense(128, name="fc1")(x))


class AF2F(nn.Module):
    """[content 256 | emotion 128] -> 35-ch 64x64 map."""

    @nn.compact
    def __call__(self, content, emotion, train: bool = False):
        h = jnp.concatenate([content, emotion], axis=1)[:, None, None, :]
        h = ConvTranspose(256, 6, 2, 1, name="decon0")(h)
        h = nn.relu(BatchNorm(256, name="norm0")(h, train))
        h = ConvTranspose(128, 4, 2, 1, name="decon1")(h)
        h = nn.relu(BatchNorm(128, name="norm1")(h, train))
        h = ConvTranspose(64, 4, 2, 1, name="decon2")(h)
        h = nn.relu(BatchNorm(64, name="norm2")(h, train))
        h = ConvTranspose(64, 4, 2, 1, name="decon3")(h)
        h = nn.relu(BatchNorm(64, name="norm3")(h, train))
        return ConvTranspose(35, 4, 2, 1, name="decon4")(h)


class AF2FS(nn.Module):
    """256-d content -> 35-ch 64x64 map with final ReLU
    (ref:modules/util.py:745-773)."""

    @nn.compact
    def __call__(self, content, train: bool = False):
        h = content[:, None, None, :]
        h = ConvTranspose(256, 6, 2, 1, name="decon0")(h)
        h = nn.relu(BatchNorm(256, name="norm0")(h, train))
        h = ConvTranspose(128, 4, 2, 1, name="decon1")(h)
        h = nn.relu(BatchNorm(128, name="norm1")(h, train))
        h = ConvTranspose(64, 4, 2, 1, name="decon2")(h)
        h = nn.relu(BatchNorm(64, name="norm2")(h, train))
        h = ConvTranspose(64, 4, 2, 1, name="decon3")(h)
        h = nn.relu(BatchNorm(64, name="norm3")(h, train))
        return nn.relu(ConvTranspose(35, 4, 2, 1, name="decon4")(h))


class A2I(nn.Module):
    """MFCC window -> 2-channel 64x64 map (ref:modules/util.py:776-813)."""

    @nn.compact
    def __call__(self, mfcc: jnp.ndarray, train: bool = False):
        x = jnp.swapaxes(mfcc, 1, 2)[..., None]       # [B,12,28,1]
        x = ConvBlock(64, name="conv0")(x, train)
        x = ConvBlock(128, name="conv1")(x, train)
        x = nn.max_pool(x, (1, 5), strides=(1, 2), padding="VALID")
        x = ConvBlock(256, name="conv2")(x, train)
        x = ConvBlock(256, name="conv3")(x, train)
        x = nn.max_pool(x, (5, 5), strides=(2, 2), padding="VALID")
        h = ConvTranspose(128, 4, 2, 1, name="decon0")(x)
        h = nn.relu(BatchNorm(128, name="norm0")(h, train))
        h = ConvTranspose(64, 4, 2, 1, name="decon1")(h)
        h = nn.relu(BatchNorm(64, name="norm1")(h, train))
        h = ConvTranspose(32, 4, 2, 1, name="decon2")(h)
        h = nn.relu(BatchNorm(32, name="norm2")(h, train))
        return nn.relu(ConvTranspose(2, 4, 2, 1, name="decon3")(h))


class NANet(nn.Module):
    """Neutral map deconv decoder (ref:modules/util.py:175-201)."""

    @nn.compact
    def __call__(self, neutral: jnp.ndarray, train: bool = False):
        h = neutral[..., None]                        # [B,H,W,1]
        h = ConvTranspose(16, (2, 3), 2, (2, 1), name="decon0")(h)
        h = nn.relu(BatchNorm(16, name="norm0")(h, train))
        h = ConvTranspose(32, 4, 2, 1, name="decon1")(h)
        h = nn.relu(BatchNorm(32, name="norm1")(h, train))
        return ConvTranspose(35, 4, 2, 1, name="decon2")(h)


class EmDetector(nn.Module):
    """Hourglass + ResNet trunk + 8-way classifier
    (ref:modules/util.py:1139-1216)."""
    block_expansion: int = 32
    num_channels: int = 3
    max_features: int = 1024
    num_blocks: int = 5
    scale_factor: float = 0.25
    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = antialias_downsample(x, self.scale_factor)
        fm = Hourglass(self.block_expansion, self.num_blocks,
                       self.max_features, name="predictor")(x, train)
        out = ResNetTrunk(name="trunk")(fm, train)
        fake = dense(self.num_classes, name="classify")(out)
        return out, fake


class AudioFeature(nn.Module):
    """Content-encoder -> AF2F_s decoder wrapper
    (ref:modules/keypoint_detector.py:208-228; the emotion branch is encoded
    but unused there, faithfully reproduced)."""

    @nn.compact
    def __call__(self, mfcc: jnp.ndarray, train: bool = False):
        c = CtEncoder(name="con_encoder")(mfcc, train)
        EmotionNet(name="emo_encoder")(mfcc, train)   # computed, unused
        return AF2FS(name="decoder")(c, train)


class _InstanceNorm1x1(nn.Module):
    """Feature-vector normalization for the AdaIN paths.  The reference's
    InstanceNorm on [B,C,1,1] vectors has degenerate per-channel spatial
    statistics (it zeroes the input); the AdaIN convention its own ``adain``
    helper uses (ref:modules/function.py:12-33) normalizes over the channel
    axis, which is what we implement — the intended semantics, made
    coherent (SURVEY.md §5.1 policy)."""
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class TFNet(nn.Module):
    """AdaIN / concat emotion-conditioned A2FD variant
    (ref:modules/util.py:321-511), folded time + scan LSTM.

    mode: 'concat' (reference forward: emotion feature concatenated into the
    LSTM input, lstm_two 1536->256), 'adain_input' (style-modulate the LSTM
    input), 'adain_output' (style-modulate the decoded 35-ch map).
    """
    mode: str = "concat"

    @nn.compact
    def __call__(self, example_image, audio, pose, emo_features,
                 train: bool = False):
        B, T = audio.shape[:2]
        img = ImageEncoder(name="image_encoder")(example_image, train)
        aud = AudioEncoder(name="audio_encoder")(
            audio.reshape(B * T, *audio.shape[2:]), train).reshape(B, T, -1)
        pos = PoseEncoder(name="pose_encoder")(
            pose.reshape(B * T, -1)).reshape(B, T, -1)
        img_rep = jnp.broadcast_to(img[:, None], (B, T, img.shape[-1]))
        feats = jnp.concatenate([img_rep, aud, pos], axis=-1)  # [B,T,1024]

        if self.mode == "concat":
            feats = jnp.concatenate([feats, emo_features], axis=-1)
            lstm_out = LSTM(256, 3, name="lstm_two")(feats)
        elif self.mode == "adain_input":
            h = _InstanceNorm1x1(name="instance_norm")(feats)
            style = dense(2 * feats.shape[-1], name="style_mod")(
                emo_features)
            scale, bias = jnp.split(style, 2, axis=-1)
            feats = h * (scale + 1.0) + bias
            lstm_out = LSTM(256, 3, name="lstm")(feats)
        elif self.mode == "adain_output":
            lstm_out = LSTM(256, 3, name="lstm")(feats)
        else:
            raise ValueError(f"unknown TFNet mode {self.mode!r}")

        deco = FeatureDecoder(name="decoder")(lstm_out.reshape(B * T, -1),
                                              train)
        deco = deco.reshape(B, T, *deco.shape[1:])
        if self.mode == "adain_output":
            h = _InstanceNorm1x1(name="instance_norm")(deco)
            style = dense(2 * 35, name="style_mod1")(emo_features)
            scale, bias = jnp.split(style, 2, axis=-1)
            deco = h * (scale[:, :, None, None, :] + 1.0) \
                + bias[:, :, None, None, :]
        return deco
