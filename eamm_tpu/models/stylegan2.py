"""StyleGAN2 synthesis generator (the optional ``jaco_net='gan'`` decoder of
the A2FD module, ref:modules/stylegan2.py + ref:modules/util.py:266,298-300).

TPU-first re-design rather than a port:

- ``upfirdn2d`` (zero-insert upsample -> FIR -> crop/downsample), which
  upstream StyleGAN2 implements as a custom CUDA op, is one XLA
  ``conv_general_dilated`` with ``lhs_dilation`` — the compiler fuses it and
  the MXU/VPU execute it directly.
- Modulated convolution avoids per-sample grouped weights (hostile to the
  MXU): since weight = scale*W*style_in, conv(x, W*style) == conv(x*style, W)
  and the demodulation factor depends only on W and style, so the whole
  batch runs through one ordinary convolution:
      out[b] = demod[b] * conv(x[b] * style[b], scale * W).
- ``fused_leaky_relu`` (bias + leaky_relu * sqrt(2), another upstream CUDA
  op) is plain fused elementwise XLA.

The EAMM-specific modifications are preserved: ToRGB emits 3+32=35 channels
(ref:modules/stylegan2.py:431-434), the constant input is replaced by the
broadcast latent (ref:modules/stylegan2.py:604-605), and noise injection is
disabled (ref:modules/stylegan2.py:396,414).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def fused_leaky_relu(x, bias, negative_slope=0.2, scale=math.sqrt(2.0)):
    return nn.leaky_relu(x + bias, negative_slope) * scale


def _fir_kernel(k=(1, 3, 3, 1)) -> np.ndarray:
    k = np.asarray(k, np.float32)
    k2 = np.outer(k, k)
    return k2 / k2.sum()


def upfirdn2d(x: jnp.ndarray, kernel: np.ndarray, up: int = 1, down: int = 1,
              pad: tuple[int, int] = (0, 0)) -> jnp.ndarray:
    """x: [B, H, W, C].  Upsample by zero insertion, FIR filter, downsample.

    Single dilated depthwise conv; trailing ``up-1`` zeros of the classic
    formulation are folded into the right/bottom padding.
    """
    C = x.shape[-1]
    k = jnp.asarray(kernel[::-1, ::-1].copy(), x.dtype)
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, C))
    pad0, pad1 = pad
    p = (pad0, pad1 + up - 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kern.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(down, down), padding=[p, p],
        lhs_dilation=(up, up), dimension_numbers=dn, feature_group_count=C)


class EqualLinear(nn.Module):
    """Equalized-lr dense layer (ref:modules/stylegan2.py:207-238)."""
    features: int
    lr_mul: float = 1.0
    bias_init: float = 0.0
    activation: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param("weight",
                       lambda key, shape: jax.random.normal(key, shape) / self.lr_mul,
                       (in_dim, self.features))
        b = self.param("bias",
                       nn.initializers.constant(self.bias_init),
                       (self.features,))
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        out = x @ (w * scale)
        if self.activation:
            return fused_leaky_relu(out, b * self.lr_mul)
        return out + b * self.lr_mul


class ModulatedConv(nn.Module):
    """Style-modulated (optionally demodulated / upsampling) conv
    (ref:modules/stylegan2.py:253-345)."""
    features: int
    kernel: int
    style_dim: int = 256
    demodulate: bool = True
    upsample: bool = False
    blur_kernel: tuple = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style):
        B, H, W, Cin = x.shape
        ksz = self.kernel
        w = self.param("weight", jax.nn.initializers.normal(1.0),
                       (ksz, ksz, Cin, self.features))
        scale = 1.0 / math.sqrt(Cin * ksz * ksz)
        if style is None:
            # style-free operation (the encoder/decoder image-translation
            # path, ref:modules/stylegan2.py:896-900): demodulate-only
            s = jnp.ones((B, Cin), x.dtype)
        else:
            s = EqualLinear(Cin, bias_init=1.0,
                            name="modulation")(style)     # [B,Cin]

        if self.demodulate:
            # demod[b,o] = rsqrt(sum_{khw,i} (scale*W*s)^2 + eps)
            w2 = jnp.sum(jnp.square(scale * w), axis=(0, 1))           # [Cin,O]
            demod = jax.lax.rsqrt(jnp.square(s) @ w2 + 1e-8)           # [B,O]

        xs = x * s[:, None, None, :]
        dn = jax.lax.conv_dimension_numbers(xs.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        if self.upsample:
            # conv_transpose stride 2, padding 0 (torch) == dilated conv with
            # flipped kernel, pad k-1.
            out = jax.lax.conv_general_dilated(
                xs, jnp.flip(scale * w, (0, 1)), (1, 1),
                [(ksz - 1, ksz - 1)] * 2, lhs_dilation=(2, 2),
                dimension_numbers=dn)
            if self.demodulate:
                out = out * demod[:, None, None, :]
            p = len(self.blur_kernel) - 2 - (ksz - 1)
            out = upfirdn2d(out, _fir_kernel(self.blur_kernel) * 4.0,
                            pad=((p + 1) // 2 + 1, p // 2 + 1))
        else:
            out = jax.lax.conv_general_dilated(
                xs, scale * w, (1, 1), [(ksz // 2, ksz // 2)] * 2,
                dimension_numbers=dn)
            if self.demodulate:
                out = out * demod[:, None, None, :]
        return out


class StyledConv(nn.Module):
    """ModulatedConv + fused bias/leaky-relu (noise injection disabled as in
    the reference, ref:modules/stylegan2.py:386-421)."""
    features: int
    kernel: int = 3
    style_dim: int = 256
    upsample: bool = False

    @nn.compact
    def __call__(self, x, style):
        out = ModulatedConv(self.features, self.kernel, self.style_dim,
                            upsample=self.upsample, name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return fused_leaky_relu(out, bias)


class ToRGB(nn.Module):
    """1x1 modulated conv to the 35-channel output + upsampled skip
    accumulation (ref:modules/stylegan2.py:425-446)."""
    out_channels: int = 35
    style_dim: int = 256

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv(self.out_channels, 1, self.style_dim,
                            demodulate=False, name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        out = out + bias
        if skip is not None:
            blur = _fir_kernel() * 4.0
            p = blur.shape[0] - 2
            skip = upfirdn2d(skip, blur, up=2,
                             pad=((p + 1) // 2 + 1, p // 2))
            out = out + skip
        return out


class SynthesisGenerator(nn.Module):
    """Style MLP + synthesis network (ref:modules/stylegan2.py:447-638).

    __call__(style [B, style_dim]) -> [B, size, size, out_channels].
    """
    size: int = 64
    style_dim: int = 256
    n_mlp: int = 8
    out_channels: int = 35
    channel_multiplier: int = 1

    @nn.compact
    def __call__(self, style: jnp.ndarray) -> jnp.ndarray:
        channels = {4: 256, 8: 256, 16: 128, 32: 64,
                    64: 32 * self.channel_multiplier,
                    128: 16 * self.channel_multiplier,
                    256: 8 * self.channel_multiplier}
        # Style MLP: PixelNorm + n_mlp equalized dense layers (lr_mul 0.01).
        s = style * jax.lax.rsqrt(
            jnp.mean(jnp.square(style), axis=-1, keepdims=True) + 1e-8)
        for i in range(self.n_mlp):
            s = EqualLinear(self.style_dim, lr_mul=0.01, activation=True,
                            name=f"style{i}")(s)

        # Constant input replaced by the broadcast latent (EAMM modification).
        out = jnp.broadcast_to(s[:, None, None, :],
                               (s.shape[0], 4, 4, self.style_dim))
        out = StyledConv(channels[4], name="conv1")(out, s)
        skip = ToRGB(self.out_channels, name="to_rgb1")(out, s)

        log_size = int(math.log2(self.size))
        for li, res in enumerate(range(3, log_size + 1)):
            ch = channels[2 ** res]
            out = StyledConv(ch, upsample=True, name=f"conv_up{li}")(out, s)
            out = StyledConv(ch, name=f"conv_same{li}")(out, s)
            skip = ToRGB(self.out_channels, name=f"to_rgb_up{li}")(out, s, skip)
        return skip


# ---------------------------------------------------------------------------
# Non-synthesis StyleGAN2 modules (ref:modules/stylegan2.py:630-922).
# No reference entry point instantiates these (dead upstream — SURVEY §2.2);
# they are implemented for full component coverage with the *intended*
# semantics: the upstream decoder path cannot even construct (StyledConv in
# an nn.Sequential receives no style), so style=None here means an
# unmodulated (demodulate-only) convolution, the coherent reading of the
# CUT-style generator this code derives from.
# ---------------------------------------------------------------------------


class EqualConv(nn.Module):
    """Equalized-lr conv (ref:modules/stylegan2.py:159-206)."""
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        Cin = x.shape[-1]
        w = self.param("weight", jax.nn.initializers.normal(1.0),
                       (self.kernel, self.kernel, Cin, self.features))
        scale = 1.0 / math.sqrt(Cin * self.kernel * self.kernel)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            x, w * scale, (self.stride, self.stride),
            [(self.padding, self.padding)] * 2, dimension_numbers=dn)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,))
        return out


class ConvLayer(nn.Module):
    """(Blur + stride-2) equalized conv + fused leaky-relu
    (ref:modules/stylegan2.py:630-676)."""
    features: int
    kernel: int
    downsample: bool = False
    use_bias: bool = True
    activate: bool = True
    blur_kernel: tuple = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            p = (len(self.blur_kernel) - 2) + (self.kernel - 1)
            x = upfirdn2d(x, _fir_kernel(self.blur_kernel),
                          pad=((p + 1) // 2, p // 2))
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel // 2
        out = EqualConv(self.features, self.kernel, stride, padding,
                        use_bias=self.use_bias and not self.activate,
                        name="conv")(x)
        if self.activate:
            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,))
                    if self.use_bias else jnp.zeros((self.features,)))
            out = fused_leaky_relu(out, bias)
        return out


class DResBlock(nn.Module):
    """Discriminator/encoder residual block with sqrt(2) skip scaling
    (ref:modules/stylegan2.py:679-701)."""
    features: int
    downsample: bool = True
    skip_gain: float = 1.0
    blur_kernel: tuple = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        Cin = x.shape[-1]
        out = ConvLayer(Cin, 3, name="conv1")(x)
        out = ConvLayer(self.features, 3, downsample=self.downsample,
                        blur_kernel=self.blur_kernel, name="conv2")(out)
        if Cin != self.features or self.downsample:
            skip = ConvLayer(self.features, 1, downsample=self.downsample,
                             activate=False, use_bias=False, name="skip")(x)
        else:
            skip = x
        return (out * self.skip_gain + skip) / math.sqrt(
            self.skip_gain ** 2 + 1.0)


def _disc_channels(multiplier: float) -> dict:
    return {4: min(384, int(4096 * multiplier)),
            8: min(384, int(2048 * multiplier)),
            16: min(384, int(1024 * multiplier)),
            32: min(384, int(512 * multiplier)),
            64: int(256 * multiplier), 128: int(128 * multiplier),
            256: int(64 * multiplier), 512: int(32 * multiplier),
            1024: int(16 * multiplier)}


class StyleGAN2Discriminator(nn.Module):
    """ref:modules/stylegan2.py:704-794.  variant: 'global' (4x4 head ->
    scalar), 'patch' (8x8 spatial logits), 'smallpatch' (16x16).  The
    minibatch-stddev branch is disabled upstream (`if False and "tile"...`)
    and stays out here."""
    size: int = 256
    ndf: int = 64
    variant: str = "global"

    @nn.compact
    def __call__(self, x):
        channels = _disc_channels(self.ndf / 64)
        out = ConvLayer(channels[self.size], 1, name="from_rgb")(x)
        final_res_log2 = {"global": 2, "patch": 3, "smallpatch": 4}[self.variant]
        log_size = int(math.log2(self.size))
        for i in range(log_size, final_res_log2, -1):
            out = DResBlock(channels[2 ** (i - 1)], name=f"res{i}")(out)
        out = ConvLayer(channels[4], 3, name="final_conv")(out)
        if self.variant in ("patch", "smallpatch"):
            return ConvLayer(1, 3, use_bias=False, activate=False,
                             name="final_linear")(out)
        B = out.shape[0]
        out = out.reshape(B, -1)
        out = EqualLinear(channels[4], activation=True, name="final_dense0")(out)
        return EqualLinear(1, name="final_dense1")(out)


class TileStyleGAN2Discriminator(nn.Module):
    """Tiles the input into patch_size^2 crops and scores each
    (ref:modules/stylegan2.py:797-805)."""
    patch_size: int = 64
    ndf: int = 64
    variant: str = "global"

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        s = self.patch_size
        Y, X = H // s, W // s
        tiles = (x.reshape(B, Y, s, X, s, C).transpose(0, 1, 3, 2, 4, 5)
                 .reshape(B * Y * X, s, s, C))
        return StyleGAN2Discriminator(size=s, ndf=self.ndf,
                                      variant=self.variant,
                                      name="discriminator")(tiles)


def _gen_channels(multiplier: float) -> dict:
    return {4: min(512, int(round(4096 * multiplier))),
            8: min(512, int(round(2048 * multiplier))),
            16: min(512, int(round(1024 * multiplier))),
            32: min(512, int(round(512 * multiplier))),
            64: int(round(256 * multiplier)), 128: int(round(128 * multiplier)),
            256: int(round(64 * multiplier)), 512: int(round(32 * multiplier)),
            1024: int(round(16 * multiplier))}


class StyleGAN2Encoder(nn.Module):
    """ref:modules/stylegan2.py:808-864: from-RGB, num_downsampling
    downsampling ResBlocks, n_blocks//2 residual blocks.  ``layers`` taps
    intermediate features (-1 = the final one), as the CUT-style contrastive
    losses consume."""
    size: int = 256
    ngf: int = 64
    n_blocks: int = 6
    num_downsampling: int = 1

    @nn.compact
    def __call__(self, x, layers=(), get_features: bool = False):
        channels = _gen_channels(self.ngf / 32)
        layers = list(layers)
        feats = []
        cur = self.size
        out = x
        if 0 in layers:                      # layer 0 is upstream's Identity
            feats.append(out)
        out = ConvLayer(channels[cur], 1, name="from_rgb")(out)
        idx = 1
        if idx in layers:
            feats.append(out)
        for i in range(self.num_downsampling):
            out = DResBlock(channels[cur // 2], name=f"down{i}")(out)
            cur //= 2
            idx += 1
            if idx in layers:
                feats.append(out)
        for i in range(self.n_blocks // 2):
            out = DResBlock(channels[cur], downsample=False,
                            name=f"res{i}")(out)
            idx += 1
            if idx in layers:
                feats.append(out)
        if -1 in layers:
            feats.append(out)
        if get_features:
            return out, feats
        return out


class StyleGAN2Decoder(nn.Module):
    """ref:modules/stylegan2.py:867-911: n_blocks//2 residual blocks,
    num_downsampling style-free upsampling StyledConvs, to-RGB."""
    size: int = 256
    ngf: int = 64
    n_blocks: int = 6
    num_downsampling: int = 1

    @nn.compact
    def __call__(self, x):
        channels = _gen_channels(self.ngf / 32)
        cur = self.size // (2 ** self.num_downsampling)
        out = x
        for i in range(self.n_blocks // 2):
            out = DResBlock(channels[cur], downsample=False,
                            name=f"res{i}")(out)
        for i in range(self.num_downsampling):
            out = StyledConv(channels[cur * 2], upsample=True,
                             name=f"up{i}")(out, None)
            cur *= 2
        return ConvLayer(3, 1, name="to_rgb")(out)


class StyleGAN2ImageGenerator(nn.Module):
    """Encoder + decoder image-to-image generator
    (ref:modules/stylegan2.py:914-922; named to avoid clashing with the
    synthesis ``Generator`` EAMM actually uses)."""
    size: int = 256
    ngf: int = 64
    n_blocks: int = 6
    num_downsampling: int = 1

    def setup(self):
        self.encoder = StyleGAN2Encoder(self.size, self.ngf, self.n_blocks,
                                        self.num_downsampling)
        self.decoder = StyleGAN2Decoder(self.size, self.ngf, self.n_blocks,
                                        self.num_downsampling)

    def __call__(self, x, layers=(), encode_only: bool = False):
        feat, feats = self.encoder(x, layers, get_features=True)
        if encode_only:
            return feats
        fake = self.decoder(feat)
        if layers:
            return fake, feats
        return fake
