"""Auxiliary-net oracle parity (SURVEY §2.2 inventory): CtEncoder /
EmotionNet / AF2F / AF2F_s / A2I / NA_net / Audio_Feature vs compact
torch oracles written from the documented reference semantics
(ref:modules/util.py:175-201,618-813; ref:modules/keypoint_detector.py:
208-228), through the compat converters (eval mode)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as tnn

from eamm_tpu import compat
from eamm_tpu.models.aux import (A2I, AF2F, AF2FS, AudioFeature, CtEncoder,
                                 EmotionNet, NANet)
from tests.test_compat_parity import _randomize_bn_stats


def _cb(i, o):
    """conv2d helper: Conv(3x3, pad 1, no bias) + BN + ReLU."""
    return tnn.Sequential(tnn.Conv2d(i, o, 3, 1, 1, bias=False),
                          tnn.BatchNorm2d(o), tnn.ReLU())


class TCtEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.audio_eocder = tnn.Sequential(
            _cb(1, 64), _cb(64, 128), tnn.MaxPool2d(3, stride=(1, 2)),
            _cb(128, 256), _cb(256, 256), _cb(256, 512),
            tnn.MaxPool2d(3, stride=(2, 2)))
        self.audio_eocder_fc = tnn.Sequential(
            tnn.Linear(1024 * 12, 2048), tnn.ReLU(True),
            tnn.Linear(2048, 256), tnn.ReLU(True))

    def forward(self, x):                     # [B, 1, 28, 12]
        h = self.audio_eocder(x)
        return self.audio_eocder_fc(h.view(h.size(0), -1))


class TEmotionNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.emotion_eocder = tnn.Sequential(
            _cb(1, 64), tnn.MaxPool2d((1, 3), stride=(1, 2)),
            _cb(64, 128), _cb(128, 256),
            tnn.MaxPool2d((12, 1), stride=(12, 1)),
            _cb(256, 512), tnn.MaxPool2d((1, 2), stride=(1, 2)))
        self.emotion_eocder_fc = tnn.Sequential(
            tnn.Linear(512 * 6, 2048), tnn.ReLU(True),
            tnn.Linear(2048, 128), tnn.ReLU(True))

    def forward(self, x):                     # [B, 1, 28, 12]
        h = self.emotion_eocder(torch.transpose(x, 2, 3))
        return self.emotion_eocder_fc(h.view(h.size(0), -1))


def _tdecon(chans, final_relu):
    """reference decon Sequential: ConvT(+BN+ReLU between), first kernel 6."""
    layers = []
    for j, (i, o) in enumerate(zip(chans[:-1], chans[1:])):
        layers.append(tnn.ConvTranspose2d(i, o, 6 if j == 0 else 4, 2, 1))
        if j < len(chans) - 2:
            layers += [tnn.BatchNorm2d(o), tnn.ReLU(True)]
    if final_relu:
        layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


class TAF2F(tnn.Module):
    def __init__(self, in_ch=384, final_relu=False):
        super().__init__()
        self.decon = _tdecon([in_ch, 256, 128, 64, 64, 35], final_relu)

    def forward(self, *feats):
        h = torch.cat(feats, 1)[:, :, None, None]
        return self.decon(h)


class TA2I(tnn.Module):
    def __init__(self):
        super().__init__()
        self.audio_eocder = tnn.Sequential(
            _cb(1, 64), _cb(64, 128), tnn.MaxPool2d((1, 5), stride=(1, 2)),
            _cb(128, 256), _cb(256, 256), tnn.MaxPool2d((5, 5), stride=(2, 2)))
        self.decon = tnn.Sequential(
            tnn.ConvTranspose2d(256, 128, 4, 2, 1), tnn.BatchNorm2d(128),
            tnn.ReLU(True),
            tnn.ConvTranspose2d(128, 64, 4, 2, 1), tnn.BatchNorm2d(64),
            tnn.ReLU(True),
            tnn.ConvTranspose2d(64, 32, 4, 2, 1), tnn.BatchNorm2d(32),
            tnn.ReLU(True),
            tnn.ConvTranspose2d(32, 2, 4, 2, 1), tnn.ReLU())

    def forward(self, mfcc):                  # [B, 28, 12]
        x = torch.transpose(mfcc.unsqueeze(1), 2, 3)
        return self.decon(self.audio_eocder(x))


class TNANet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.decon = tnn.Sequential(
            tnn.ConvTranspose2d(1, 16, (2, 3), 2, (2, 1)),
            tnn.BatchNorm2d(16), tnn.ReLU(True),
            tnn.ConvTranspose2d(16, 32, 4, 2, 1),
            tnn.BatchNorm2d(32), tnn.ReLU(True),
            tnn.ConvTranspose2d(32, 35, 4, 2, 1))

    def forward(self, neutral):               # [B, H, W]
        return self.decon(neutral.unsqueeze(1))


class TAudioFeature(tnn.Module):
    def __init__(self):
        super().__init__()
        self.con_encoder = TCtEncoder()
        self.emo_encoder = TEmotionNet()
        self.decoder = TAF2F(in_ch=256, final_relu=True)

    def forward(self, x):                     # [B, 28, 12]
        x = x.unsqueeze(1)
        c = self.con_encoder(x)
        self.emo_encoder(x)                   # computed, unused (ref)
        return self.decoder.decon(c[:, :, None, None])


def _sd(oracle):
    torch.manual_seed(7)
    oracle = oracle.eval()
    _randomize_bn_stats(oracle)
    return oracle, {k: v.numpy() for k, v in oracle.state_dict().items()}


def _close(ours, ref_nchw, atol=5e-4):
    """ours NHWC vs torch NCHW (or matching 2-d features)."""
    ref = ref_nchw.detach().numpy()
    if ref.ndim == 4:
        ref = ref.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=atol)


def test_ct_encoder_parity():
    oracle, sd = _sd(TCtEncoder())
    x = torch.randn(2, 28, 12)
    with torch.no_grad():
        ref = oracle(x.unsqueeze(1))
    out = CtEncoder().apply(compat.convert_ct_encoder(sd),
                            jnp.asarray(x.numpy()))
    _close(out, ref)


def test_emotion_net_parity():
    oracle, sd = _sd(TEmotionNet())
    x = torch.randn(2, 28, 12)
    with torch.no_grad():
        ref = oracle(x.unsqueeze(1))
    out = EmotionNet().apply(compat.convert_emotion_net(sd),
                             jnp.asarray(x.numpy()))
    _close(out, ref)


def test_af2f_parity():
    oracle, sd = _sd(TAF2F())
    c, e = torch.randn(2, 256), torch.randn(2, 128)
    with torch.no_grad():
        ref = oracle(c, e)
    out = AF2F().apply(compat.convert_af2f(sd), jnp.asarray(c.numpy()),
                       jnp.asarray(e.numpy()))
    _close(out, ref)


def test_af2f_s_parity():
    oracle, sd = _sd(TAF2F(in_ch=256, final_relu=True))
    c = torch.randn(2, 256)
    with torch.no_grad():
        ref = oracle(c)
    out = AF2FS().apply(compat.convert_af2f_s(sd), jnp.asarray(c.numpy()))
    _close(out, ref)


def test_a2i_parity():
    oracle, sd = _sd(TA2I())
    x = torch.randn(2, 28, 12)
    with torch.no_grad():
        ref = oracle(x)
    out = A2I().apply(compat.convert_a2i(sd), jnp.asarray(x.numpy()))
    _close(out, ref)


def test_na_net_parity():
    oracle, sd = _sd(TNANet())
    x = torch.randn(2, 8, 8)
    with torch.no_grad():
        ref = oracle(x)
    out = NANet().apply(compat.convert_na_net(sd), jnp.asarray(x.numpy()))
    _close(out, ref)


def test_audio_feature_parity():
    oracle, sd = _sd(TAudioFeature())
    x = torch.randn(2, 28, 12)
    with torch.no_grad():
        ref = oracle(x)
    out = AudioFeature().apply(compat.convert_audio_feature(sd),
                               jnp.asarray(x.numpy()))
    _close(out, ref)


def test_em_detector_parity():
    """EmDetector == the oracle-tested Emotion_k trunk + classifier
    (ref:modules/util.py:1139-1216 vs :1316-1331 — identical stacks),
    through convert_em_detector."""
    from eamm_tpu.models.aux import EmDetector
    from tests.test_compat_emotion import TEmotionK
    oracle, sd = _sd(TEmotionK(be=32, max_f=128, blocks=5))
    x = torch.rand(2, 3, 256, 256)
    with torch.no_grad():
        out = oracle.trunk(x)
        fake = oracle.classify(out)
    model = EmDetector(block_expansion=32, max_features=128, num_blocks=5)
    feat, cls = model.apply(compat.convert_em_detector(sd),
                            jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(feat), out.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(cls), fake.numpy(), atol=5e-4)
