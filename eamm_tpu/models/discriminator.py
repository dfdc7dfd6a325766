"""Pix2Pix-style patch discriminator with optional spectral norm and
keypoint-heatmap conditioning (ref:modules/discriminator.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from eamm_tpu.ops.grid import kp2gaussian
from eamm_tpu.ops.warp import avg_pool_2x


class SNConv(nn.Module):
    """Conv with torch-style spectral normalization (one power iteration per
    training step on the [out, in*kh*kw] reshaped kernel,
    ref:modules/discriminator.py:16-17 via nn.utils.spectral_norm)."""
    features: int
    kernel: int
    padding: int = 0
    use_sn: bool = True
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        k = self.kernel
        in_ch = x.shape[-1]
        kernel = self.param("kernel",
                            nn.initializers.variance_scaling(1 / 3, "fan_in",
                                                             "uniform"),
                            (k, k, in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w = kernel
        if self.use_sn:
            # Power-iteration vector persists across steps in batch_stats
            # and stays f32; the iteration runs in f32 even under bf16
            # mixed-precision compute (norm estimates degrade in bf16),
            # only the final 1/sigma scale is cast back.
            w_mat = kernel.astype(jnp.float32) \
                .transpose(3, 2, 0, 1).reshape(self.features, -1)
            u_var = self.variable(
                "batch_stats", "u",
                lambda: jax.random.normal(jax.random.PRNGKey(0),
                                          (self.features,)))
            u = u_var.value
            v = w_mat.T @ u
            v = v / (jnp.linalg.norm(v) + self.eps)
            u_new = w_mat @ v
            u_new = u_new / (jnp.linalg.norm(u_new) + self.eps)
            if update_stats and not self.is_initializing():
                u_var.value = u_new
            sigma = u_new @ (w_mat @ v)
            w = kernel / sigma.astype(kernel.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        p = self.padding
        out = jax.lax.conv_general_dilated(x, w, (1, 1), [(p, p), (p, p)],
                                           dimension_numbers=dn)
        return out + bias


class _DiscDownBlock(nn.Module):
    """conv(4x4, no pad) -> [InstanceNorm] -> leaky_relu(0.2) -> [avgpool]
    (ref:modules/discriminator.py:7-33)."""
    features: int
    norm: bool = False
    pool: bool = False
    sn: bool = False

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        x = SNConv(self.features, 4, padding=0, use_sn=self.sn,
                   name="conv")(x, update_stats)
        if self.norm:
            # InstanceNorm2d(affine=True): per-sample spatial stats.
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
            scale = self.param("in_scale", nn.initializers.ones, (self.features,))
            bias = self.param("in_bias", nn.initializers.zeros, (self.features,))
            x = x * scale + bias
        x = nn.leaky_relu(x, 0.2)
        if self.pool:
            x = avg_pool_2x(x)
        return x


class Discriminator(nn.Module):
    """ref:modules/discriminator.py:36-71."""
    num_channels: int = 3
    block_expansion: int = 64
    num_blocks: int = 4
    max_features: int = 512
    sn: bool = False
    use_kp: bool = False
    num_kp: int = 10
    kp_variance: float = 0.01

    @nn.compact
    def __call__(self, x, kp=None, update_stats: bool = False):
        if self.use_kp:
            heatmap = kp2gaussian(kp["value"], x.shape[1:3], self.kp_variance)
            x = jnp.concatenate([x, jnp.moveaxis(heatmap, 1, -1)], axis=-1)
        feature_maps = []
        out = x
        for i in range(self.num_blocks):
            f = min(self.max_features, self.block_expansion * (2 ** (i + 1)))
            out = _DiscDownBlock(f, norm=(i != 0),
                                 pool=(i != self.num_blocks - 1),
                                 sn=self.sn, name=f"down{i}")(out, update_stats)
            feature_maps.append(out)
        prediction_map = SNConv(1, 1, padding=0, use_sn=self.sn,
                                name="conv")(out, update_stats)
        return feature_maps, prediction_map


class MultiScaleDiscriminator(nn.Module):
    """One patch discriminator per pyramid scale
    (ref:modules/discriminator.py:74-95)."""
    scales: tuple = (1,)
    num_channels: int = 3
    block_expansion: int = 64
    num_blocks: int = 4
    max_features: int = 512
    sn: bool = False
    use_kp: bool = False
    num_kp: int = 10
    kp_variance: float = 0.01

    @nn.compact
    def __call__(self, pyramid: dict, kp=None, update_stats: bool = False):
        out = {}
        for scale in self.scales:
            disc = Discriminator(self.num_channels, self.block_expansion,
                                 self.num_blocks, self.max_features, self.sn,
                                 self.use_kp, self.num_kp, self.kp_variance,
                                 name=f"disc_{str(scale).replace('.', '-')}")
            feats, pred = disc(pyramid[f"prediction_{scale}"], kp, update_stats)
            out[f"feature_maps_{scale}"] = feats
            out[f"prediction_map_{scale}"] = pred
        return out
