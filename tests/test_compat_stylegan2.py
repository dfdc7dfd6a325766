"""StyleGAN2 synthesis generator parity vs a torch oracle implementing the
vendored module's math (upfirdn2d, equalized linear with lr_mul, modulated /
demodulated conv with blur, fused leaky relu, skip accumulation;
ref:modules/stylegan2.py as modified for EAMM: 35-ch ToRGB, latent constant
input, no noise injection)."""
import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax.numpy as jnp

from eamm_tpu.models.stylegan2 import SynthesisGenerator
from eamm_tpu.compat import convert_stylegan2

torch.manual_seed(5)


def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    B, C, H, W = x.shape
    out = x.view(-1, C, H, 1, W, 1)
    out = F.pad(out, [0, up - 1, 0, 0, 0, up - 1, 0, 0])
    out = out.view(-1, C, H * up, W * up)
    out = F.pad(out, [max(pad[0], 0), max(pad[1], 0),
                      max(pad[0], 0), max(pad[1], 0)])
    kh, kw = kernel.shape
    out = out.reshape(-1, 1, out.shape[2], out.shape[3])
    w = torch.flip(kernel, [0, 1]).view(1, 1, kh, kw)
    out = F.conv2d(out, w)
    out = out.reshape(B, C, out.shape[2], out.shape[3])
    return out[:, :, ::down, ::down]


def make_kernel(k=(1, 3, 3, 1)):
    k = torch.tensor(k, dtype=torch.float32)
    k = k[None, :] * k[:, None]
    return k / k.sum()


def fused_lrelu(x, bias):
    return F.leaky_relu(x + bias.view(1, -1, 1, 1), 0.2) * math.sqrt(2)


class EqualLinear(tnn.Module):
    def __init__(self, in_dim, out_dim, lr_mul=1.0, bias_init=0.0,
                 activation=False):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(out_dim, in_dim) / lr_mul)
        self.bias = tnn.Parameter(torch.full((out_dim,), bias_init))
        self.scale = (1.0 / math.sqrt(in_dim)) * lr_mul
        self.lr_mul = lr_mul
        self.activation = activation

    def forward(self, x):
        if self.activation:
            out = F.linear(x, self.weight * self.scale)
            return F.leaky_relu(out + self.bias * self.lr_mul, 0.2) \
                * math.sqrt(2)
        return F.linear(x, self.weight * self.scale,
                        self.bias * self.lr_mul)


class ModulatedConv(tnn.Module):
    def __init__(self, in_ch, out_ch, k, style_dim=256, demodulate=True,
                 upsample=False):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(1, out_ch, in_ch, k, k))
        self.modulation = EqualLinear(style_dim, in_ch, bias_init=1.0)
        self.scale = 1.0 / math.sqrt(in_ch * k * k)
        self.demodulate = demodulate
        self.upsample = upsample
        self.k = k
        if upsample:
            p = 4 - 2 - (k - 1)
            self.blur_pad = ((p + 1) // 2 + 1, p // 2 + 1)
            self.blur_kernel = make_kernel() * 4

    def forward(self, x, style):
        B, in_ch, H, W = x.shape
        s = self.modulation(style).view(B, 1, in_ch, 1, 1)
        weight = self.scale * self.weight * s
        if self.demodulate:
            demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
            weight = weight * demod.view(B, -1, 1, 1, 1)
        out_ch = weight.shape[1]
        weight = weight.view(B * out_ch, in_ch, self.k, self.k)
        if self.upsample:
            x = x.view(1, B * in_ch, H, W)
            weight = weight.view(B, out_ch, in_ch, self.k, self.k) \
                .transpose(1, 2).reshape(B * in_ch, out_ch, self.k, self.k)
            out = F.conv_transpose2d(x, weight, stride=2, groups=B)
            out = out.view(B, out_ch, out.shape[2], out.shape[3])
            return upfirdn2d(out, self.blur_kernel, pad=self.blur_pad)
        x = x.view(1, B * in_ch, H, W)
        out = F.conv2d(x, weight, padding=self.k // 2, groups=B)
        return out.view(B, out_ch, out.shape[2], out.shape[3])


class TSynthesis(tnn.Module):
    def __init__(self, size=16, style_dim=256, n_mlp=8, out_ch=35):
        super().__init__()
        channels = {4: 256, 8: 256, 16: 128, 32: 64, 64: 32}
        self.style = tnn.ModuleList(
            [EqualLinear(style_dim, style_dim, lr_mul=0.01, activation=True)
             for _ in range(n_mlp)])
        self.conv1 = ModulatedConv(style_dim, channels[4], 3)
        self.bias1 = tnn.Parameter(torch.zeros(channels[4]))
        self.rgb1 = ModulatedConv(channels[4], out_ch, 1, demodulate=False)
        self.rgb1_bias = tnn.Parameter(torch.zeros(out_ch))
        self.ups, self.sames, self.rgbs = (tnn.ModuleList(), tnn.ModuleList(),
                                           tnn.ModuleList())
        self.up_biases = tnn.ParameterList()
        self.same_biases = tnn.ParameterList()
        self.rgb_biases = tnn.ParameterList()
        in_ch = channels[4]
        self.log_size = int(math.log2(size))
        for res in range(3, self.log_size + 1):
            ch = channels[2 ** res]
            self.ups.append(ModulatedConv(in_ch, ch, 3, upsample=True))
            self.up_biases.append(tnn.Parameter(torch.zeros(ch)))
            self.sames.append(ModulatedConv(ch, ch, 3))
            self.same_biases.append(tnn.Parameter(torch.zeros(ch)))
            self.rgbs.append(ModulatedConv(ch, out_ch, 1, demodulate=False))
            self.rgb_biases.append(tnn.Parameter(torch.zeros(out_ch)))
            in_ch = ch
        p = 4 - 2
        self.skip_pad = ((p + 1) // 2 + 1, p // 2)
        self.skip_kernel = make_kernel() * 4

    def forward(self, z):
        s = z * torch.rsqrt(torch.mean(z ** 2, dim=1, keepdim=True) + 1e-8)
        for layer in self.style:
            s = layer(s)
        out = s.unsqueeze(-1).unsqueeze(-1).repeat(1, 1, 4, 4)
        out = fused_lrelu(self.conv1(out, s), self.bias1)
        skip = self.rgb1(out, s) + self.rgb1_bias.view(1, -1, 1, 1)
        for up, ub, same, sb, rgb, rb in zip(self.ups, self.up_biases,
                                             self.sames, self.same_biases,
                                             self.rgbs, self.rgb_biases):
            out = fused_lrelu(up(out, s), ub)
            out = fused_lrelu(same(out, s), sb)
            skip = upfirdn2d(skip, self.skip_kernel, up=2, pad=self.skip_pad)
            skip = rgb(out, s) + rb.view(1, -1, 1, 1) + skip
        return skip


def _oracle_state_dict(oracle):
    """Rename the oracle's params to the vendored module's names."""
    sd = {}
    for i, layer in enumerate(oracle.style):
        sd[f"style.{i + 1}.weight"] = layer.weight.detach().numpy()
        sd[f"style.{i + 1}.bias"] = layer.bias.detach().numpy()

    def mod(prefix, m):
        sd[f"{prefix}.weight"] = m.weight.detach().numpy()
        sd[f"{prefix}.modulation.weight"] = m.modulation.weight.detach().numpy()
        sd[f"{prefix}.modulation.bias"] = m.modulation.bias.detach().numpy()

    mod("conv1.conv", oracle.conv1)
    sd["conv1.activate.bias"] = oracle.bias1.detach().numpy()
    mod("to_rgb1.conv", oracle.rgb1)
    sd["to_rgb1.bias"] = oracle.rgb1_bias.detach().numpy().reshape(1, -1, 1, 1)
    for li in range(oracle.log_size - 2):
        mod(f"convs.{2 * li}.conv", oracle.ups[li])
        sd[f"convs.{2 * li}.activate.bias"] = \
            oracle.up_biases[li].detach().numpy()
        mod(f"convs.{2 * li + 1}.conv", oracle.sames[li])
        sd[f"convs.{2 * li + 1}.activate.bias"] = \
            oracle.same_biases[li].detach().numpy()
        mod(f"to_rgbs.{li}.conv", oracle.rgbs[li])
        sd[f"to_rgbs.{li}.bias"] = \
            oracle.rgb_biases[li].detach().numpy().reshape(1, -1, 1, 1)
    return sd


def test_stylegan2_synthesis_parity():
    size = 16
    oracle = TSynthesis(size=size).eval()
    sd = _oracle_state_dict(oracle)
    params = convert_stylegan2(sd, size=size)

    model = SynthesisGenerator(size=size, style_dim=256, n_mlp=8,
                               out_channels=35)
    z = torch.randn(2, 256)
    with torch.no_grad():
        ref = oracle(z)
    out = model.apply({"params": params}, jnp.asarray(z.numpy()))
    ref_nhwc = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref_nhwc, atol=5e-4,
                               rtol=1e-4)
