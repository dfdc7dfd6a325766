"""Shared flax building blocks (NHWC).

These re-design the reference's conv blocks (ref:modules/util.py:858-1002)
for TPU: NHWC layout feeds the MXU directly, the synchronized-BatchNorm
thread machinery (ref:sync_batchnorm/) is replaced by plain batch reductions
— under ``jit`` with the batch axis sharded across the mesh, XLA lowers the
mean/variance reductions to ICI collectives, which *is* cross-replica
sync BN with zero custom communication code.

BatchNorm matches torch semantics: biased variance for normalization,
unbiased variance in the running stats, momentum 0.1, eps 1e-5
(ref:sync_batchnorm/batchnorm.py:113-120); eval mode normalizes with the
running stats.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from eamm_tpu.ops.warp import upsample_nearest_2x, avg_pool_2x


class BatchNorm(nn.Module):
    """Torch-semantics batch normalization over (batch, H, W)."""
    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features, jnp.float32))
        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(x), axis=reduce_axes)
            var = mean2 - jnp.square(mean)          # biased, used to normalize
            n = x.size // x.shape[-1]
            if (not self.is_initializing()
                    and self.is_mutable_collection("batch_stats")):
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean.astype(jnp.float32))
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased.astype(jnp.float32))
        else:
            mean = ra_mean.value.astype(x.dtype)
            var = ra_var.value.astype(x.dtype)

        inv = jax.lax.rsqrt(var + self.eps)
        out = (x - mean) * inv
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out * scale + bias
        return out


# torch nn.Conv2d/Linear default init: kaiming_uniform(a=sqrt(5)) for the
# kernel == U(+-sqrt(1/fan_in)); bias U(+-1/sqrt(fan_in)).  Matching it keeps
# from-scratch training dynamics comparable to the reference.
_torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def _torch_bias_init(key, shape, dtype=jnp.float32, fan_in=None):
    bound = 1.0 / (fan_in ** 0.5) if fan_in else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _bias_init_for(fan_in):
    def init(key, shape, dtype=jnp.float32):
        return _torch_bias_init(key, shape, dtype, fan_in)
    return init


def conv(features: int, kernel: int | tuple[int, int], *,
         stride: int | tuple[int, int] = 1,
         padding: int | tuple[int, int] = 0,
         use_bias: bool = True, groups: int = 1, in_features: int | None = None,
         name: str | None = None) -> nn.Conv:
    """2-D conv with torch-style symmetric zero padding and torch default
    initialization (bias fan-in needs ``in_features``; falls back to zeros)."""
    k = (kernel, kernel) if isinstance(kernel, int) else tuple(kernel)
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    p = (padding, padding) if isinstance(padding, int) else tuple(padding)
    bias_init = (_bias_init_for(in_features * k[0] * k[1] // groups)
                 if in_features else nn.initializers.zeros)
    return nn.Conv(features, kernel_size=k, strides=s,
                   padding=((p[0], p[0]), (p[1], p[1])),
                   use_bias=use_bias, feature_group_count=groups,
                   kernel_init=_torch_kernel_init, bias_init=bias_init,
                   name=name)


def dense(features: int, in_features: int | None = None,
          name: str | None = None) -> nn.Dense:
    """Dense layer with torch nn.Linear default initialization."""
    bias_init = (_bias_init_for(in_features) if in_features
                 else nn.initializers.zeros)
    return nn.Dense(features, kernel_init=_torch_kernel_init,
                    bias_init=bias_init, name=name)


class ConvTranspose(nn.Module):
    """Torch-semantics ConvTranspose2d: out = (in-1)*stride - 2*pad + kernel.

    Implemented as an input-dilated convolution with a spatially flipped
    kernel, which XLA fuses onto the MXU like a normal conv.  The kernel
    param is stored HWIO for the equivalent forward conv (the torch
    converter flips/transposes on import).
    """
    features: int
    kernel: int | tuple[int, int]
    stride: int = 2
    padding: int | tuple[int, int] = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = (self.kernel,) * 2 if isinstance(self.kernel, int) else self.kernel
        p = (self.padding,) * 2 if isinstance(self.padding, int) else self.padding
        s = self.stride
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform",
                                             in_axis=3, out_axis=2),
            (k[0], k[1], in_ch, self.features))
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1),
            padding=[(k[0] - 1 - p[0], k[0] - 1 - p[0]),
                     (k[1] - 1 - p[1], k[1] - 1 - p[1])],
            lhs_dilation=(s, s), dimension_numbers=dn)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out


class ConvBlock(nn.Module):
    """conv -> BatchNorm -> ReLU (the reference's ``conv2d`` helper,
    ref:modules/util.py:1740-1753; conv has no bias when normalized)."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv(self.features, self.kernel, stride=self.stride,
                 padding=self.padding, use_bias=False, name="conv")(x)
        x = BatchNorm(self.features, name="norm")(x, train)
        return nn.relu(x)


class SameBlock(nn.Module):
    """conv -> BN -> ReLU preserving resolution (ref:modules/util.py:923-938)."""
    features: int
    kernel: int = 3
    padding: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv(self.features, self.kernel, padding=self.padding,
                 groups=self.groups, name="conv")(x)
        x = BatchNorm(self.features, name="norm")(x, train)
        return nn.relu(x)


class DownBlock(nn.Module):
    """conv -> BN -> ReLU -> 2x2 avg pool (ref:modules/util.py:903-920)."""
    features: int
    kernel: int = 3
    padding: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv(self.features, self.kernel, padding=self.padding,
                 groups=self.groups, name="conv")(x)
        x = BatchNorm(self.features, name="norm")(x, train)
        x = nn.relu(x)
        return avg_pool_2x(x)


class _ConvWeights(nn.Module):
    """Parameter-only twin of a ``conv`` child: declares the identical
    kernel/bias (same names, shapes, initializers) so checkpoints and the
    torch converters see the same tree while the parent module chooses the
    computation form (literal, folded subpixel, or space-to-depth)."""
    features: int
    kernel: int
    kernel_init: object = None     # defaults to the torch conv init
    bias_init: object = None       # defaults to zeros

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", self.kernel_init or _torch_kernel_init,
                       (self.kernel, self.kernel, in_features, self.features))
        b = self.param("bias", self.bias_init or nn.initializers.zeros,
                       (self.features,))
        return k, b


class UpBlock(nn.Module):
    """nearest x2 -> conv -> BN -> ReLU (ref:modules/util.py:883-900).

    Eval-mode calls compute the upsample+conv in the aligned depth-to-space
    subpixel form (one SAME 3x3 conv at the input resolution with 4x the
    output channels + a single depth-to-space transpose — exact up to
    tap-sum reassociation, MXU-aligned output widths; see
    eamm_tpu/ops/subpixel.py, which also documents the measured-slower 2x2
    fold whose phase interleave cost ~59 ms/render program in data
    movement).  Training keeps the literal form: BN batch statistics are
    defined on the conv output at the doubled resolution.
    """
    features: int
    kernel: int = 3
    padding: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        foldable = (self.kernel == 3 and self.padding == 1
                    and self.groups == 1)
        if foldable:
            k, b = _ConvWeights(self.features, self.kernel,
                                name="conv")(x.shape[-1])
            dt = jnp.promote_types(x.dtype, k.dtype)
            x, k, b = x.astype(dt), k.astype(dt), b.astype(dt)
            if train:
                x = upsample_nearest_2x(x)
                dn = jax.lax.conv_dimension_numbers(
                    x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
                x = jax.lax.conv_general_dilated(
                    x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                    dimension_numbers=dn) + b
            else:
                from eamm_tpu.ops.subpixel import upsample_conv3x3_d2s
                x = upsample_conv3x3_d2s(x, k) + b
        else:
            x = upsample_nearest_2x(x)
            x = conv(self.features, self.kernel, padding=self.padding,
                     groups=self.groups, name="conv")(x)
        x = BatchNorm(self.features, name="norm")(x, train)
        return nn.relu(x)


class ResBlock(nn.Module):
    """Pre-activation residual block (ref:modules/util.py:858-880)."""
    features: int
    kernel: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        out = BatchNorm(self.features, name="norm1")(x, train)
        out = nn.relu(out)
        out = conv(self.features, self.kernel, padding=self.padding,
                   name="conv1")(out)
        out = BatchNorm(self.features, name="norm2")(out, train)
        out = nn.relu(out)
        out = conv(self.features, self.kernel, padding=self.padding,
                   name="conv2")(out)
        return out + x


def _enc_features(block_expansion: int, num_blocks: int, max_features: int):
    return [min(max_features, block_expansion * (2 ** (i + 1)))
            for i in range(num_blocks)]


class Encoder(nn.Module):
    """Hourglass encoder: chain of DownBlocks, keeping skips
    (ref:modules/util.py:941-960)."""
    block_expansion: int
    num_blocks: int = 3
    max_features: int = 256

    @nn.compact
    def __call__(self, x, train: bool):
        outs = [x]
        for i, f in enumerate(_enc_features(self.block_expansion,
                                            self.num_blocks, self.max_features)):
            outs.append(DownBlock(f, name=f"down{i}")(outs[-1], train))
        return outs


class Decoder(nn.Module):
    """Hourglass decoder: UpBlocks with skip concatenation
    (ref:modules/util.py:963-987)."""
    block_expansion: int
    num_blocks: int = 3
    max_features: int = 256

    @nn.compact
    def __call__(self, skips: Sequence[jnp.ndarray], train: bool):
        skips = list(skips)
        out = skips.pop()
        for j, i in enumerate(range(self.num_blocks - 1, -1, -1)):
            f = min(self.max_features, self.block_expansion * (2 ** i))
            out = UpBlock(f, name=f"up{j}")(out, train)
            out = jnp.concatenate([out, skips.pop()], axis=-1)
        return out


class Hourglass(nn.Module):
    """Encoder + skip decoder; output channels = block_expansion + in_features
    (ref:modules/util.py:990-1002)."""
    block_expansion: int
    num_blocks: int = 3
    max_features: int = 256

    @nn.compact
    def __call__(self, x, train: bool):
        skips = Encoder(self.block_expansion, self.num_blocks,
                        self.max_features, name="encoder")(x, train)
        return Decoder(self.block_expansion, self.num_blocks,
                       self.max_features, name="decoder")(skips, train)
