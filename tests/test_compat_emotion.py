"""EmotionK eval parity against a torch oracle through the converter
(hourglass + ResNet trunk + positional embedding + Conv1d displacement
heads, ref:modules/util.py:1223-1527)."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax.numpy as jnp

from eamm_tpu.models import EmotionK
from eamm_tpu.compat import convert_emotion_k
from tests.test_compat_parity import (THourglass, _gaussian_blur_downsample,
                                      _randomize_bn_stats)

torch.manual_seed(2)


class TBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))
        else:
            self.downsample = None

    def forward(self, x):
        residual = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + residual)


def t_embed(x, num_freqs=10):
    outs = [x]
    for i in range(num_freqs):
        outs.append(torch.sin(x * 2.0 ** i))
        outs.append(torch.cos(x * 2.0 ** i))
    return torch.cat(outs, -1)


class TEmotionK(tnn.Module):
    def __init__(self, be=32, max_f=128, blocks=5):
        super().__init__()
        self.predictor = THourglass(be, 3, blocks, max_f)
        self.conv1 = tnn.Conv2d(be + 3, 64, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.layer1 = tnn.Sequential(TBasicBlock(64, 64), TBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(TBasicBlock(64, 128, 2, True),
                                     TBasicBlock(128, 128))
        self.layer3 = tnn.Sequential(TBasicBlock(128, 256, 2, True),
                                     TBasicBlock(256, 256))
        self.layer4 = tnn.Sequential(TBasicBlock(256, 512, 2, True),
                                     TBasicBlock(512, 512))
        self.fc_p = tnn.Sequential(tnn.Linear(10 * 126, 1024), tnn.ReLU(True),
                                   tnn.Linear(1024, 512), tnn.ReLU(True))
        self.fc_n = tnn.Sequential(tnn.Linear(10 * 6, 128), tnn.ReLU(True),
                                   tnn.Linear(128, 512), tnn.ReLU(True))
        self.fc_all = tnn.Sequential(tnn.Linear(1024, 512), tnn.ReLU(True),
                                     tnn.Linear(512, 256), tnn.ReLU(True),
                                     tnn.Linear(256, 64), tnn.ReLU(True))
        self.final = tnn.Sequential(
            tnn.Conv1d(1, 2, 4, 2, 1), tnn.MaxPool1d(2, stride=2),
            tnn.ReLU(True), tnn.Conv1d(2, 4, 4, 2, 1), tnn.ReLU(True),
            tnn.Conv1d(4, 4, 3))
        self.final_10 = tnn.Sequential(
            tnn.Conv1d(4, 8, 3, 1, 1), tnn.MaxPool1d(2, stride=2),
            tnn.ReLU(True), tnn.Conv1d(8, 10, 3))

        class Classify(tnn.Module):
            def __init__(s):
                super().__init__()
                s.last_fc = tnn.Linear(512, 8)

            def forward(s, x):
                return s.last_fc(x)

        self.classify = Classify()

    def trunk(self, x):
        fm = self.predictor(_gaussian_blur_downsample(x))
        f = F.max_pool2d(F.relu(self.bn1(self.conv1(fm))), 3, 2, 1)
        f = self.layer4(self.layer3(self.layer2(self.layer1(f))))
        return F.adaptive_avg_pool2d(f, 1).squeeze(3).squeeze(2)

    def forward(self, x, value, jacobian):
        out = self.trunk(x)
        fake = self.classify(out)
        neu = torch.cat((value, jacobian.reshape(*jacobian.shape[:2], 4)), 2)
        ner = self.fc_p(t_embed(neu).reshape(neu.shape[0], -1))
        all_fc = self.fc_all(torch.cat((out, ner), 1)).unsqueeze(1)
        result = self.final(all_fc)
        return result[:, :, :2], result[:, :, 2:].reshape(-1, 4, 2, 2), fake

    def linear_10(self, x, value, jacobian):
        out = self.trunk(x)
        fake = self.classify(out)
        neu = torch.cat((value, jacobian.reshape(*jacobian.shape[:2], 4)), 2)
        ner = self.fc_p(t_embed(neu).reshape(neu.shape[0], -1))
        all_fc = self.fc_all(torch.cat((out, ner), 1)).reshape(-1, 4, 16)
        result = self.final_10(all_fc)
        return result[:, :, :2], result[:, :, 2:].reshape(-1, 10, 2, 2), fake


def test_emotion_k_parity():
    oracle = TEmotionK().eval()
    _randomize_bn_stats(oracle)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    model = EmotionK(block_expansion=32, max_features=128, num_blocks=5)
    variables = convert_emotion_k(sd)

    x = torch.rand(2, 3, 256, 256)
    value = torch.rand(2, 10, 2) - 0.5
    jacobian = torch.eye(2).view(1, 1, 2, 2).repeat(2, 10, 1, 1) \
        + 0.1 * torch.randn(2, 10, 2, 2)
    with torch.no_grad():
        t_val, t_jac, t_fake = oracle(x, value, jacobian)
        t_val10, t_jac10, _ = oracle.linear_10(x, value, jacobian)

    args = (jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
            jnp.asarray(value.numpy()), jnp.asarray(jacobian.numpy()))
    kp, fake = model.apply(variables, *args, head="linear")
    np.testing.assert_allclose(np.asarray(fake), t_fake.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(kp["value"]), t_val.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(kp["jacobian"]), t_jac.numpy(),
                               atol=2e-4)
    kp10, _ = model.apply(variables, *args, head="linear_10")
    np.testing.assert_allclose(np.asarray(kp10["value"]), t_val10.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(kp10["jacobian"]), t_jac10.numpy(),
                               atol=2e-4)


def test_emotion_k_np_heads_parity():
    """linear_np_4 / linear_np_10 (ref:modules/util.py:1396-1458): the raw
    (non-positional-embedded) neutral feature through fc_n, then the same
    final conv heads."""
    torch.manual_seed(12)
    oracle = TEmotionK().eval()
    _randomize_bn_stats(oracle)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    model = EmotionK(block_expansion=32, max_features=128, num_blocks=5)
    variables = convert_emotion_k(sd)

    x = torch.rand(2, 3, 256, 256)
    value = torch.rand(2, 10, 2) - 0.5
    jacobian = torch.eye(2).view(1, 1, 2, 2).repeat(2, 10, 1, 1) \
        + 0.1 * torch.randn(2, 10, 2, 2)
    with torch.no_grad():
        out = oracle.trunk(x)
        t_fake = oracle.classify(out)
        neu = torch.cat((value, jacobian.reshape(*jacobian.shape[:2], 4)), 2)
        ner = oracle.fc_n(neu.reshape(neu.shape[0], -1))
        fc = oracle.fc_all(torch.cat((out, ner), 1))
        r4 = oracle.final(fc.unsqueeze(1))
        t4 = (r4[:, :, :2], r4[:, :, 2:].reshape(-1, 4, 2, 2))
        r10 = oracle.final_10(fc.reshape(-1, 4, 16))
        t10 = (r10[:, :, :2], r10[:, :, 2:].reshape(-1, 10, 2, 2))

    args = (jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
            jnp.asarray(value.numpy()), jnp.asarray(jacobian.numpy()))
    for head, (tv, tj) in (("linear_np_4", t4), ("linear_np_10", t10)):
        kp, fake = model.apply(variables, *args, head=head)
        np.testing.assert_allclose(np.asarray(fake), t_fake.numpy(),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(kp["value"]), tv.numpy(),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(kp["jacobian"]), tj.numpy(),
                                   atol=2e-4)


def test_emotion_k_feature_methods_parity():
    """`feature` (image -> 512-d trunk, ref:modules/util.py:1477-1496) and
    `emotion_feature` (precomputed feature -> 4-kp head, ref::1459-1475)."""
    torch.manual_seed(13)
    oracle = TEmotionK().eval()
    _randomize_bn_stats(oracle)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    model = EmotionK(block_expansion=32, max_features=128, num_blocks=5)
    variables = convert_emotion_k(sd)

    x = torch.rand(2, 3, 256, 256)
    value = torch.rand(2, 10, 2) - 0.5
    jacobian = torch.eye(2).view(1, 1, 2, 2).repeat(2, 10, 1, 1) \
        + 0.1 * torch.randn(2, 10, 2, 2)
    with torch.no_grad():
        t_feat = oracle.trunk(x)
        t_fake = oracle.classify(t_feat)
        neu = torch.cat((value, jacobian.reshape(*jacobian.shape[:2], 4)), 2)
        ner = oracle.fc_p(t_embed(neu).reshape(neu.shape[0], -1))
        r = oracle.final(
            oracle.fc_all(torch.cat((t_feat, ner), 1)).unsqueeze(1))
        t_val, t_jac = r[:, :, :2], r[:, :, 2:].reshape(-1, 4, 2, 2)

    feat = model.apply(variables,
                       jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
                       method=EmotionK.feature)
    np.testing.assert_allclose(np.asarray(feat), t_feat.numpy(), atol=2e-4)

    kp, fake = model.apply(variables, feat, jnp.asarray(value.numpy()),
                           jnp.asarray(jacobian.numpy()),
                           method=EmotionK.emotion_feature)
    np.testing.assert_allclose(np.asarray(fake), t_fake.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(kp["value"]), t_val.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(kp["jacobian"]), t_jac.numpy(),
                               atol=2e-4)
