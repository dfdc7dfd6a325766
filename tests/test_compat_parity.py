"""End-to-end numerical parity: torch oracle models -> state_dict ->
compat converter -> flax apply, compared on random inputs in eval mode.

The torch oracles are compact re-statements of the documented architectures
(SURVEY.md §2.1-2.2) with state_dict names matching the reference
checkpoints, so these tests validate both the layer semantics (conv
padding, BN eval, ConvTranspose, LSTM gates, flatten orderings) and the
converter's name mapping.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax.numpy as jnp

from eamm_tpu.models import KPDetector, KPDetectorA, ATNet
from eamm_tpu.compat import (convert_kp_detector, convert_kp_detector_a,
                             convert_atnet)

torch.manual_seed(0)


def _randomize_bn_stats(module):
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 2.0)


# ---------------------------------------------------------- torch oracles

class TDown(tnn.Module):
    def __init__(self, i, o, k=3, p=1):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, k, padding=p)
        self.norm = tnn.BatchNorm2d(o)

    def forward(self, x):
        return F.avg_pool2d(F.relu(self.norm(self.conv(x))), 2)


class TUp(tnn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, 3, padding=1)
        self.norm = tnn.BatchNorm2d(o)

    def forward(self, x):
        return F.relu(self.norm(self.conv(F.interpolate(x, scale_factor=2))))


class THourglass(tnn.Module):
    def __init__(self, be, in_f, num_blocks, max_f):
        super().__init__()

        class Enc(tnn.Module):
            def __init__(s):
                super().__init__()
                s.down_blocks = tnn.ModuleList(
                    [TDown(in_f if i == 0 else min(max_f, be * 2 ** i),
                           min(max_f, be * 2 ** (i + 1)))
                     for i in range(num_blocks)])

        class Dec(tnn.Module):
            def __init__(s):
                super().__init__()
                s.up_blocks = tnn.ModuleList(
                    [TUp((1 if i == num_blocks - 1 else 2)
                         * min(max_f, be * 2 ** (i + 1)),
                         min(max_f, be * 2 ** i))
                     for i in range(num_blocks - 1, -1, -1)])

        self.encoder = Enc()
        self.decoder = Dec()

    def forward(self, x):
        skips = [x]
        for d in self.encoder.down_blocks:
            skips.append(d(skips[-1]))
        out = skips.pop()
        for u in self.decoder.up_blocks:
            out = u(out)
            out = torch.cat([out, skips.pop()], dim=1)
        return out


def _gaussian_blur_downsample(x, scale=0.25, sigma=1.5):
    ksize = 2 * round(sigma * 4) + 1
    ka = ksize // 2
    gy, gx = torch.meshgrid(torch.arange(ksize).float(),
                            torch.arange(ksize).float(), indexing="ij")
    mean = (ksize - 1) / 2
    kern = torch.exp(-((gy - mean) ** 2 + (gx - mean) ** 2) / (2 * sigma ** 2))
    kern = (kern / kern.sum()).view(1, 1, ksize, ksize).repeat(x.shape[1], 1, 1, 1)
    out = F.conv2d(F.pad(x, (ka,) * 4), kern, groups=x.shape[1])
    return out[:, :, ::int(1 / scale), ::int(1 / scale)]


class TKPDetector(tnn.Module):
    def __init__(self, num_kp=10, be=32, max_f=256, num_blocks=5):
        super().__init__()
        self.predictor = THourglass(be, 3, num_blocks, max_f)
        self.kp = tnn.Conv2d(be + 3, num_kp, 7)
        self.jacobian = tnn.Conv2d(be + 3, 4 * num_kp, 7)
        self.num_kp = num_kp

    def forward(self, x):
        x = _gaussian_blur_downsample(x)
        fmap = self.predictor(x)
        pred = self.kp(fmap)
        B, K, h, w = pred.shape
        heat = torch.softmax(pred.view(B, K, -1) / 0.1, dim=2).view(B, K, h, w)
        ax = 2 * torch.arange(w).float() / (w - 1) - 1
        ay = 2 * torch.arange(h).float() / (h - 1) - 1
        grid = torch.stack([ax.view(1, -1).repeat(h, 1),
                            ay.view(-1, 1).repeat(1, w)], -1)
        value = (heat.unsqueeze(-1) * grid).sum(dim=(2, 3))
        jmap = self.jacobian(fmap).view(B, K, 4, h, w)
        jac = (heat.unsqueeze(2) * jmap).sum(dim=(3, 4)).view(B, K, 2, 2)
        return value, heat, jac


@pytest.mark.smoke
def test_kp_detector_parity():
    oracle = TKPDetector().eval()
    _randomize_bn_stats(oracle)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    model = KPDetector(num_kp=10, block_expansion=32, max_features=256,
                       num_blocks=5)
    variables = convert_kp_detector(sd)

    x = torch.rand(2, 3, 256, 256)
    with torch.no_grad():
        t_value, t_heat, t_jac = oracle(x)
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(out["heatmap"]), t_heat.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["value"]), t_value.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["jacobian"]), t_jac.numpy(),
                               atol=1e-4)


class TKPDetectorA(tnn.Module):
    def __init__(self, num_kp=10, in_ch=35):
        super().__init__()
        self.kp = tnn.Conv2d(in_ch, num_kp, 7)
        self.jacobian = tnn.Conv2d(in_ch, 4 * num_kp, 7)

    def forward(self, fmap):
        pred = self.kp(fmap)
        B, K, h, w = pred.shape
        heat = torch.softmax(pred.view(B, K, -1) / 0.1, dim=2).view(B, K, h, w)
        jmap = self.jacobian(fmap).view(B, K, 4, h, w)
        jac = (heat.unsqueeze(2) * jmap).sum(dim=(3, 4)).view(B, K, 2, 2)
        return heat, jac


def test_kp_detector_a_parity():
    oracle = TKPDetectorA().eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    model = KPDetectorA(num_kp=10)
    variables = convert_kp_detector_a(sd)
    fmap = torch.randn(2, 35, 64, 64)
    with torch.no_grad():
        t_heat, t_jac = oracle(fmap)
    out = model.apply(variables, jnp.asarray(fmap.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(out["heatmap"]), t_heat.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["jacobian"]), t_jac.numpy(), atol=2e-5)


class TATNet(tnn.Module):
    """AT_net2 oracle (eval): per-step python loops as in the reference."""

    def __init__(self):
        super().__init__()
        self.down_blocks = tnn.ModuleList(
            [TDown(3 if i == 0 else 2 * 2 ** i, 2 * 2 ** (i + 1))
             for i in range(8)])
        self.pose_encoder = tnn.Sequential(
            tnn.Linear(6, 128), tnn.ReLU(True), tnn.Linear(128, 256), tnn.ReLU(True))

        def cb(i, o):
            return tnn.Sequential(tnn.Conv2d(i, o, 3, 1, 1, bias=False),
                                  tnn.BatchNorm2d(o), tnn.ReLU())
        self.audio_eocder = tnn.Sequential(
            cb(1, 64), cb(64, 128), tnn.MaxPool2d(3, stride=(1, 2)),
            cb(128, 256), cb(256, 256), cb(256, 512),
            tnn.MaxPool2d(3, stride=(2, 2)))
        self.audio_eocder_fc = tnn.Sequential(
            tnn.Linear(1024 * 12, 2048), tnn.ReLU(True),
            tnn.Linear(2048, 256), tnn.ReLU(True))
        self.lstm = tnn.LSTM(1024, 256, 3, batch_first=True)
        self.decon = tnn.Sequential(
            tnn.ConvTranspose2d(256, 256, 6, 2, 1), tnn.BatchNorm2d(256), tnn.ReLU(True),
            tnn.ConvTranspose2d(256, 128, 4, 2, 1), tnn.BatchNorm2d(128), tnn.ReLU(True),
            tnn.ConvTranspose2d(128, 128, 4, 2, 1), tnn.BatchNorm2d(128), tnn.ReLU(True),
            tnn.ConvTranspose2d(128, 128, 4, 2, 1), tnn.BatchNorm2d(128), tnn.ReLU(True),
            tnn.ConvTranspose2d(128, 35, 4, 2, 1))

    def forward(self, example_image, audio, pose, weight):
        h0 = (torch.zeros(3, audio.size(0), 256), torch.zeros(3, audio.size(0), 256))
        outs = example_image
        for d in self.down_blocks:
            outs = d(outs)
        image_feature = outs.view(outs.shape[0], -1)
        feats = []
        for t in range(audio.size(1)):
            cur = self.audio_eocder(audio[:, t].unsqueeze(1))
            cur = self.audio_eocder_fc(cur.view(cur.size(0), -1)) * weight
            pf = self.pose_encoder(pose[:, t])
            feats.append(torch.cat([image_feature, cur, pf], 1))
        lstm_out, _ = self.lstm(torch.stack(feats, dim=1), h0)
        deco = [self.decon(lstm_out[:, t].unsqueeze(2).unsqueeze(3))
                for t in range(audio.size(1))]
        return torch.stack(deco, dim=1)


def test_atnet_parity():
    oracle = TATNet().eval()
    _randomize_bn_stats(oracle)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    model = ATNet(jaco_net="cnn")
    variables = convert_atnet(sd)

    img = torch.rand(1, 3, 256, 256)
    audio = torch.randn(1, 3, 28, 12)
    pose = torch.randn(1, 3, 6)
    with torch.no_grad():
        ref = oracle(img, audio, pose, 1.6)           # [B,T,35,64,64]
    out = model.apply(variables, jnp.asarray(img.permute(0, 2, 3, 1).numpy()),
                      jnp.asarray(audio.numpy()), jnp.asarray(pose.numpy()),
                      audio_weight=1.6)               # [B,T,64,64,35]
    ref_nhwc = ref.permute(0, 1, 3, 4, 2).numpy()
    np.testing.assert_allclose(np.asarray(out), ref_nhwc, atol=5e-4)
