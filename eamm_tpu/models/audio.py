"""Audio2Facial-Dynamics (A2FD): audio + pose + identity -> per-frame
35-channel feature maps for the audio keypoint detector.

Re-design of the reference AT_net / AT_net2 (ref:modules/util.py:203-304,
514-614) for TPU:

- The reference loops over timesteps in Python three times (audio encoder,
  LSTM input build, decoder).  Here the per-step encoders/decoder fold the
  time axis into the batch (one big MXU-friendly conv/matmul batch) and the
  3-layer LSTM runs as a single ``lax.scan``.
- AT_net2 is AT_net plus a scalar multiplier on the audio feature (the demo
  passes 1.6 to exaggerate mouth motion, ref:demo.py:352); both are this one
  module — pass ``audio_weight=1.0`` for the training-time AT_net.
- ``jaco_net='cnn'`` uses the deconv decoder; ``'gan'`` routes the LSTM
  state through the StyleGAN2 synthesis generator (ref:modules/util.py:294-300).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from eamm_tpu.models.blocks import (dense, BatchNorm, ConvBlock, ConvTranspose,
                                    DownBlock)


def _w(channels: int, width: float) -> int:
    """Scale a channel count by the module's ``width`` multiplier.

    ``width=1.0`` (the default everywhere) reproduces the reference
    architecture exactly; fractional widths keep the full structure (layer
    count, strides, output shapes) at narrower channels — used by the
    multichip dryrun and sharding tests, where the 45M-param production
    ATNet would be pure replicated-weight traffic on virtual devices."""
    return max(4, int(round(channels * width)))


class LSTM(nn.Module):
    """Multi-layer LSTM with torch gate ordering (i, f, g, o) and zero
    initial state (ref:modules/util.py:244,271-272,288), as one lax.scan."""
    hidden: int
    num_layers: int

    @nn.compact
    def __call__(self, xs: jnp.ndarray, initial_carry=None,
                 return_carry: bool = False):
        """xs: [B, T, F] -> outputs of the last layer [B, T, hidden].

        ``initial_carry`` (a :meth:`zero_carry`-shaped tuple, or the carry a
        prior ``return_carry=True`` call returned) threads the recurrent
        state across fixed-size chunks: chunked invocation with the carry
        passed along computes EXACTLY the whole-sequence scan.
        """
        B, T, F = xs.shape
        H = self.hidden
        bound = float(1.0 / (H ** 0.5))

        def uniform_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        params = []
        for l in range(self.num_layers):
            in_f = F if l == 0 else H
            w_ih = self.param(f"w_ih_l{l}", uniform_init, (in_f, 4 * H))
            w_hh = self.param(f"w_hh_l{l}", uniform_init, (H, 4 * H))
            b_ih = self.param(f"b_ih_l{l}", uniform_init, (4 * H,))
            b_hh = self.param(f"b_hh_l{l}", uniform_init, (4 * H,))
            params.append((w_ih, w_hh, b_ih + b_hh))

        def step(carry, x_t):
            new_carry = []
            inp = x_t
            for (w_ih, w_hh, b), (h, c) in zip(params, carry):
                z = inp @ w_ih + h @ w_hh + b
                i, f, g, o = jnp.split(z, 4, axis=-1)
                c_new = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
                h_new = nn.sigmoid(o) * jnp.tanh(c_new)
                new_carry.append((h_new, c_new))
                inp = h_new
            return tuple(new_carry), inp

        init_carry = initial_carry
        if init_carry is None:
            init_carry = self.zero_carry(B, xs.dtype)
        final, ys = jax.lax.scan(step, init_carry, jnp.swapaxes(xs, 0, 1))
        ys = jnp.swapaxes(ys, 0, 1)
        return (ys, final) if return_carry else ys

    def zero_carry(self, batch: int, dtype=jnp.float32):
        """The zero initial state (torch LSTM default, ref:modules/util.py:271-272)."""
        return tuple((jnp.zeros((batch, self.hidden), dtype),
                      jnp.zeros((batch, self.hidden), dtype))
                     for _ in range(self.num_layers))


class ImageEncoder(nn.Module):
    """8 DownBlocks 3->4->...->512, 256^2 -> 1^2, flattened to a 512-d
    identity vector (ref:modules/util.py:206-212,273-277)."""
    width: float = 1.0

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool) -> jnp.ndarray:
        out = image
        for i in range(8):
            out = DownBlock(_w(2 * (2 ** (i + 1)), self.width),
                            name=f"down{i}")(out, train)
        return out.reshape(out.shape[0], -1)


class AudioEncoder(nn.Module):
    """Conv stack over a 28x12 MFCC window -> 256-d feature
    (ref:modules/util.py:228-243)."""
    width: float = 1.0

    @nn.compact
    def __call__(self, mfcc: jnp.ndarray, train: bool) -> jnp.ndarray:
        w = self.width
        x = mfcc[..., None]                                   # [N,28,12,1]
        x = ConvBlock(_w(64, w), name="conv0")(x, train)
        x = ConvBlock(_w(128, w), name="conv1")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(1, 2), padding="VALID")
        x = ConvBlock(_w(256, w), name="conv2")(x, train)
        x = ConvBlock(_w(256, w), name="conv3")(x, train)
        x = ConvBlock(_w(512, w), name="conv4")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = x.reshape(x.shape[0], -1)                         # [N, 12288]
        x = nn.relu(dense(_w(2048, w), name="fc0")(x))
        x = nn.relu(dense(_w(256, w), name="fc1")(x))
        return x


class PoseEncoder(nn.Module):
    """6-d head pose -> 256-d feature (ref:modules/util.py:221-227)."""
    width: float = 1.0

    @nn.compact
    def __call__(self, pose: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(dense(_w(128, self.width), name="fc0")(pose))
        return nn.relu(dense(_w(256, self.width), name="fc1")(x))


class FeatureDecoder(nn.Module):
    """LSTM state [N,256] -> 35-channel 64x64 map via transposed convs
    (ref:modules/util.py:248-265)."""
    width: float = 1.0

    @nn.compact
    def __call__(self, h: jnp.ndarray, train: bool) -> jnp.ndarray:
        w = self.width
        x = h[:, None, None, :]                               # [N,1,1,256]
        x = ConvTranspose(_w(256, w), 6, 2, 1, name="decon0")(x)   # 4x4
        x = nn.relu(BatchNorm(_w(256, w), name="norm0")(x, train))
        x = ConvTranspose(_w(128, w), 4, 2, 1, name="decon1")(x)   # 8x8
        x = nn.relu(BatchNorm(_w(128, w), name="norm1")(x, train))
        x = ConvTranspose(_w(128, w), 4, 2, 1, name="decon2")(x)   # 16x16
        x = nn.relu(BatchNorm(_w(128, w), name="norm2")(x, train))
        x = ConvTranspose(_w(128, w), 4, 2, 1, name="decon3")(x)   # 32x32
        x = nn.relu(BatchNorm(_w(128, w), name="norm3")(x, train))
        return ConvTranspose(35, 4, 2, 1, name="decon4")(x)   # 64x64, raw


class ATNet(nn.Module):
    """Full A2FD module (AT_net / AT_net2 unified).

    __call__(example_image [B,256,256,3], audio [B,T,28,12], pose [B,T,6])
      -> deco_out [B,T,64,64,35]
    """
    jaco_net: str = "cnn"
    # width=1.0 is the reference architecture; fractional widths keep the
    # structure at narrower channels (sharding tests / multichip dryrun).
    width: float = 1.0

    def setup(self):
        self.image_encoder = ImageEncoder(self.width)
        self.audio_encoder = AudioEncoder(self.width)
        self.pose_encoder = PoseEncoder(self.width)
        self.lstm = LSTM(_w(256, self.width), 3)
        if self.jaco_net == "cnn":
            self.decoder = FeatureDecoder(self.width)
        elif self.jaco_net == "gan":
            from eamm_tpu.models.stylegan2 import SynthesisGenerator
            self.generator = SynthesisGenerator(size=64,
                                                style_dim=_w(256, self.width),
                                                n_mlp=8, out_channels=35)
        else:
            raise ValueError(
                f"jaco_net must be 'cnn' or 'gan', got {self.jaco_net!r}")

    def encode_image(self, example_image: jnp.ndarray,
                     train: bool = False) -> jnp.ndarray:
        """Identity feature [B, 512] — depends only on the source image, so
        streaming callers run it once and reuse it for every chunk."""
        return self.image_encoder(example_image, train)

    def window_features(self, image_feature: jnp.ndarray, audio: jnp.ndarray,
                        pose: jnp.ndarray, audio_weight: float = 1.0,
                        train: bool = False, carry=None,
                        return_carry: bool = False):
        """Per-window feature maps from a precomputed identity feature.

        audio [B, T, 28, 12] + pose [B, T, 6] -> deco [B, T, 64, 64, 35].
        ``carry``/``return_carry`` thread the LSTM state so fixed-size
        chunks compose EXACTLY into the whole-clip result (the encoders and
        the decoder are per-window; only the LSTM is recurrent)."""
        B, T = audio.shape[:2]
        audio_flat = audio.reshape(B * T, *audio.shape[2:])
        audio_feature = self.audio_encoder(audio_flat, train)
        audio_feature = audio_feature.reshape(B, T, -1) * audio_weight

        pose_feature = self.pose_encoder(
            pose.reshape(B * T, -1)).reshape(B, T, -1)

        img_rep = jnp.broadcast_to(image_feature[:, None],
                                   (B, T, image_feature.shape[-1]))
        lstm_in = jnp.concatenate([img_rep, audio_feature, pose_feature],
                                  axis=-1)                    # [B,T,1024]
        lstm_out = self.lstm(lstm_in, initial_carry=carry,
                             return_carry=return_carry)       # [B,T,256]
        if return_carry:
            lstm_out, carry_out = lstm_out

        if self.jaco_net == "cnn":
            deco = self.decoder(lstm_out.reshape(B * T, -1), train)
        else:
            deco = self.generator(lstm_out.reshape(B * T, -1))
        deco = deco.reshape(B, T, *deco.shape[1:])
        return (deco, carry_out) if return_carry else deco

    def zero_carry(self, batch: int, dtype=jnp.float32):
        return self.lstm.zero_carry(batch, dtype)

    def __call__(self, example_image: jnp.ndarray, audio: jnp.ndarray,
                 pose: jnp.ndarray, audio_weight: float = 1.0,
                 train: bool = False) -> jnp.ndarray:
        image_feature = self.encode_image(example_image, train)
        return self.window_features(image_feature, audio, pose,
                                    audio_weight, train)
