"""TF_net 'concat' forward oracle parity (ref:modules/util.py:321-511):
the AT_net trunk plus the emotion-concat LSTM (lstm_two, 1536->256),
through convert_tfnet.  The AdaIN branches are excluded by design — the
reference applies InstanceNorm to 1x1 spatial maps there (degenerate,
zeroes the features); see PARITY.md "Known deviations"."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as tnn

from eamm_tpu.compat import convert_tfnet
from eamm_tpu.models.aux import TFNet
from tests.test_compat_parity import TATNet, _randomize_bn_stats


class TTFNet(TATNet):
    """Oracle: the TATNet stacks plus lstm_two; forward matches the
    reference TF_net.forward concat semantics (eval, cpu)."""

    def __init__(self):
        super().__init__()
        self.lstm_two = tnn.LSTM(256 * 6, 256, 3, batch_first=True)

    def forward(self, example_image, audio, pose, emo_features):
        # emo_features: [T, B, 512] (the reference indexes time first)
        h0 = (torch.zeros(3, audio.size(0), 256),
              torch.zeros(3, audio.size(0), 256))
        outs = example_image
        for d in self.down_blocks:
            outs = d(outs)
        image_feature = outs.view(outs.shape[0], -1)
        feats = []
        for t in range(audio.size(1)):
            cur = self.audio_eocder(audio[:, t].unsqueeze(1))
            cur = self.audio_eocder_fc(cur.view(cur.size(0), -1))
            pf = self.pose_encoder(pose[:, t])
            feats.append(torch.cat([image_feature, cur, pf,
                                    emo_features[t]], 1))
        lstm_out, _ = self.lstm_two(torch.stack(feats, dim=1), h0)
        deco = [self.decon(lstm_out[:, t].unsqueeze(2).unsqueeze(3))
                for t in range(audio.size(1))]
        return torch.stack(deco, dim=1)


def test_tfnet_concat_parity():
    torch.manual_seed(3)
    oracle = TTFNet().eval()
    _randomize_bn_stats(oracle)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    model = TFNet(mode="concat")
    variables = convert_tfnet(sd)

    img = torch.rand(1, 3, 256, 256)
    audio = torch.randn(1, 3, 28, 12)
    pose = torch.randn(1, 3, 6)
    emo = torch.randn(3, 1, 512)                     # [T, B, 512]
    with torch.no_grad():
        ref = oracle(img, audio, pose, emo)          # [B,T,35,64,64]
    out = model.apply(variables,
                      jnp.asarray(img.permute(0, 2, 3, 1).numpy()),
                      jnp.asarray(audio.numpy()), jnp.asarray(pose.numpy()),
                      jnp.asarray(emo.permute(1, 0, 2).numpy()))
    ref_nhwc = ref.permute(0, 1, 3, 4, 2).numpy()
    np.testing.assert_allclose(np.asarray(out), ref_nhwc, atol=5e-4)
