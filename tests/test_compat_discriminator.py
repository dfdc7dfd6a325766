"""convert_discriminator parity vs a torch oracle (fresh restatement of
ref:modules/discriminator.py semantics, incl. spectral norm: one power
iteration per forward on the [O, I*k*k] matrix — identical to SNConv's).
The reference FOMM checkpoint carries the discriminator, which GAN
fine-tune resumes (ref:logger.py:60-73)."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax.numpy as jnp

from eamm_tpu.models.discriminator import MultiScaleDiscriminator
from eamm_tpu.compat import convert_discriminator

torch.manual_seed(5)


class TDown(tnn.Module):
    def __init__(self, i, o, norm, pool, sn):
        super().__init__()
        conv = tnn.Conv2d(i, o, 4)
        self.conv = tnn.utils.spectral_norm(conv) if sn else conv
        self.norm = tnn.InstanceNorm2d(o, affine=True) if norm else None
        self.pool = pool

    def forward(self, x):
        x = self.conv(x)
        if self.norm is not None:
            x = self.norm(x)
        x = F.leaky_relu(x, 0.2)
        if self.pool:
            x = F.avg_pool2d(x, (2, 2))
        return x


class TDisc(tnn.Module):
    def __init__(self, be=32, max_f=128, blocks=4, sn=True):
        super().__init__()
        self.down_blocks = tnn.ModuleList([
            TDown(3 if i == 0 else min(max_f, be * (2 ** i)),
                  min(max_f, be * (2 ** (i + 1))),
                  norm=(i != 0), pool=(i != blocks - 1), sn=sn)
            for i in range(blocks)])
        conv = tnn.Conv2d(min(max_f, be * (2 ** blocks)), 1, 1)
        self.conv = tnn.utils.spectral_norm(conv) if sn else conv

    def forward(self, x):
        feats = []
        out = x
        for d in self.down_blocks:
            out = d(out)
            feats.append(out)
        return feats, self.conv(out)


class TMulti(tnn.Module):
    def __init__(self, scales=(1,), **kw):
        super().__init__()
        self.discs = tnn.ModuleDict(
            {str(s).replace(".", "-"): TDisc(**kw) for s in scales})


def test_discriminator_conversion_parity():
    tm = TMulti(scales=(1,), be=32, max_f=128, blocks=4, sn=True)
    tm.train()   # spectral-norm power iteration runs per forward
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_discriminator(sd)

    ours = MultiScaleDiscriminator(scales=(1,), block_expansion=32,
                                   max_features=128, num_blocks=4, sn=True)
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    out = ours.apply(variables, {"prediction_1": jnp.asarray(x)})

    with torch.no_grad():
        feats, pred = tm.discs["1"](torch.from_numpy(x).permute(0, 3, 1, 2))

    np.testing.assert_allclose(
        np.asarray(out["prediction_map_1"]),
        pred.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=2e-4)
    for a, b in zip(out["feature_maps_1"], feats):
        np.testing.assert_allclose(np.asarray(a),
                                   b.permute(0, 2, 3, 1).numpy(),
                                   atol=2e-4, rtol=2e-4)


def test_discriminator_conversion_no_sn():
    tm = TMulti(scales=(1,), be=16, max_f=64, blocks=4, sn=False)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_discriminator(sd)
    variables.setdefault("batch_stats", {})
    ours = MultiScaleDiscriminator(scales=(1,), block_expansion=16,
                                   max_features=64, num_blocks=4, sn=False)
    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    out = ours.apply(variables, {"prediction_1": jnp.asarray(x)})
    with torch.no_grad():
        _, pred = tm.discs["1"](torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(out["prediction_map_1"]),
                               pred.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4, rtol=2e-4)
