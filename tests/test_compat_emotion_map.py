"""EmotionMap eval parity vs torch oracle (trunk + fc_all NCHW reshape +
deconv decoder + conv kp heads, ref:modules/util.py:1529-1737)."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax.numpy as jnp

from eamm_tpu.models import EmotionMap
from eamm_tpu.compat import convert_emotion_map
from tests.test_compat_parity import THourglass, _gaussian_blur_downsample, \
    _randomize_bn_stats
from tests.test_compat_emotion import TBasicBlock, t_embed

torch.manual_seed(4)


class TEmotionMap(tnn.Module):
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
        self.fc_all = tnn.Sequential(tnn.Linear(1024, 2048), tnn.ReLU(True))
        self.final = tnn.Sequential(
            tnn.ConvTranspose2d(128, 128, 4, 2, 1), tnn.BatchNorm2d(128),
            tnn.ReLU(True),
            tnn.ConvTranspose2d(128, 64, 4, 2, 1), tnn.BatchNorm2d(64),
            tnn.ReLU(True),
            tnn.ConvTranspose2d(64, 64, 4, 2, 1), tnn.BatchNorm2d(64),
            tnn.ReLU(True),
            tnn.ConvTranspose2d(64, 35, 4, 2, 1))
        self.kp = tnn.Conv2d(35, 10, 7)
        self.jacobian = tnn.Conv2d(35, 40, 7)
        self.kp_4 = tnn.Conv2d(35, 4, 7)
        self.jacobian_4 = tnn.Conv2d(35, 16, 7)

        class Classify(tnn.Module):
            def __init__(s):
                super().__init__()
                s.last_fc = tnn.Linear(512, 8)

            def forward(s, x):
                return s.last_fc(x)

        self.classify = Classify()

    def forward(self, x, value, jacobian):
        fm = self.predictor(_gaussian_blur_downsample(x))
        f = F.max_pool2d(F.relu(self.bn1(self.conv1(fm))), 3, 2, 1)
        f = self.layer4(self.layer3(self.layer2(self.layer1(f))))
        out = F.adaptive_avg_pool2d(f, 1).squeeze(3).squeeze(2)
        fake = self.classify(out)
        neu = torch.cat((value, jacobian.reshape(*jacobian.shape[:2], 4)), 2)
        ner = self.fc_p(t_embed(neu).reshape(neu.shape[0], -1))
        all_fc = self.fc_all(torch.cat((out, ner), 1)).reshape(-1, 128, 4, 4)
        fmap = self.final(all_fc)
        pred = self.kp(fmap)
        B, K, h, w = pred.shape
        heat = torch.softmax(pred.view(B, K, -1) / 0.1, dim=2).view(B, K, h, w)
        jmap = self.jacobian(fmap).view(B, K, 4, h, w)
        jac = (heat.unsqueeze(2) * jmap).sum(dim=(3, 4)).view(B, K, 2, 2)
        ax = 2 * torch.arange(w).float() / (w - 1) - 1
        grid = torch.stack([ax.view(1, -1).repeat(h, 1),
                            ax.view(-1, 1).repeat(1, w)], -1)
        val = (heat.unsqueeze(-1) * grid).sum(dim=(2, 3))
        return val, jac, heat, fake


def test_emotion_map_parity():
    oracle = TEmotionMap().eval()
    _randomize_bn_stats(oracle)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    model = EmotionMap(block_expansion=32, max_features=128, num_blocks=5)
    variables = convert_emotion_map(sd)

    x = torch.rand(2, 3, 256, 256)
    value = torch.rand(2, 10, 2) - 0.5
    jacobian = torch.eye(2).view(1, 1, 2, 2).repeat(2, 10, 1, 1) \
        + 0.1 * torch.randn(2, 10, 2, 2)
    with torch.no_grad():
        t_val, t_jac, t_heat, t_fake = oracle(x, value, jacobian)

    kp, fake = model.apply(
        variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(value.numpy()), jnp.asarray(jacobian.numpy()), head="map")
    np.testing.assert_allclose(np.asarray(fake), t_fake.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(kp["heatmap"]), t_heat.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(kp["value"]), t_val.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(kp["jacobian"]), t_jac.numpy(),
                               atol=2e-4)


def test_emotion_map_4_parity():
    """map_4 head (ref:modules/util.py:1636-1690): same trunk/decoder,
    kp_4/jacobian_4 conv heads with K=4."""
    torch.manual_seed(9)
    oracle = TEmotionMap().eval()
    _randomize_bn_stats(oracle)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    model = EmotionMap(block_expansion=32, max_features=128, num_blocks=5)
    variables = convert_emotion_map(sd)

    x = torch.rand(2, 3, 256, 256)
    value = torch.rand(2, 10, 2) - 0.5
    jacobian = torch.eye(2).view(1, 1, 2, 2).repeat(2, 10, 1, 1) \
        + 0.1 * torch.randn(2, 10, 2, 2)
    with torch.no_grad():
        # oracle map_4: identical to forward with the 4-kp conv heads
        fm = oracle.predictor(_gaussian_blur_downsample(x))
        f = F.max_pool2d(F.relu(oracle.bn1(oracle.conv1(fm))), 3, 2, 1)
        f = oracle.layer4(oracle.layer3(oracle.layer2(oracle.layer1(f))))
        out = F.adaptive_avg_pool2d(f, 1).squeeze(3).squeeze(2)
        t_fake = oracle.classify(out)
        neu = torch.cat((value, jacobian.reshape(*jacobian.shape[:2], 4)), 2)
        ner = oracle.fc_p(t_embed(neu).reshape(neu.shape[0], -1))
        all_fc = oracle.fc_all(torch.cat((out, ner), 1)).reshape(-1, 128, 4, 4)
        fmap = oracle.final(all_fc)
        pred = oracle.kp_4(fmap)
        B, K, h, w = pred.shape
        heat = torch.softmax(pred.view(B, K, -1) / 0.1, dim=2).view(B, K, h, w)
        jmap = oracle.jacobian_4(fmap).view(B, K, 4, h, w)
        t_jac = (heat.unsqueeze(2) * jmap).sum(dim=(3, 4)).view(B, K, 2, 2)
        ax = 2 * torch.arange(w).float() / (w - 1) - 1
        grid = torch.stack([ax.view(1, -1).repeat(h, 1),
                            ax.view(-1, 1).repeat(1, w)], -1)
        t_val = (heat.unsqueeze(-1) * grid).sum(dim=(2, 3))

    kp, fake = model.apply(
        variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(value.numpy()), jnp.asarray(jacobian.numpy()),
        head="map_4")
    np.testing.assert_allclose(np.asarray(fake), t_fake.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(kp["value"]), t_val.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(kp["jacobian"]), t_jac.numpy(),
                               atol=2e-4)
