"""Full OcclusionAwareGenerator + DenseMotionNetwork eval parity against a
torch oracle through the checkpoint converter — the demo.py hot path, so
this is the test that underwrites the per-frame L1 < 1e-2 north star."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax.numpy as jnp

from eamm_tpu.models import OcclusionAwareGenerator
from eamm_tpu.compat import convert_generator
from tests.test_compat_parity import (TDown, TUp, THourglass,
                                      _gaussian_blur_downsample,
                                      _randomize_bn_stats)

torch.manual_seed(1)


class TSame(tnn.Module):
    def __init__(self, i, o, k=7, p=3):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, k, padding=p)
        self.norm = tnn.BatchNorm2d(o)

    def forward(self, x):
        return F.relu(self.norm(self.conv(x)))


class TRes(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = tnn.Conv2d(f, f, 3, padding=1)
        self.conv2 = tnn.Conv2d(f, f, 3, padding=1)
        self.norm1 = tnn.BatchNorm2d(f)
        self.norm2 = tnn.BatchNorm2d(f)

    def forward(self, x):
        out = self.conv1(F.relu(self.norm1(x)))
        out = self.conv2(F.relu(self.norm2(out)))
        return out + x


def t_coord_grid(h, w):
    x = 2 * torch.arange(w).float() / (w - 1) - 1
    y = 2 * torch.arange(h).float() / (h - 1) - 1
    return torch.stack([x.view(1, -1).repeat(h, 1),
                        y.view(-1, 1).repeat(1, w)], -1)


def t_kp2gaussian(value, h, w, var=0.01):
    grid = t_coord_grid(h, w).view(1, 1, h, w, 2)
    mean = value.view(*value.shape[:2], 1, 1, 2)
    return torch.exp(-0.5 * ((grid - mean) ** 2).sum(-1) / var)


class TDenseMotion(tnn.Module):
    def __init__(self, num_kp=10, be=64, max_f=256, blocks=5):
        super().__init__()
        self.hourglass = THourglass(be, (num_kp + 1) * 4, blocks, max_f)
        self.mask = tnn.Conv2d(be + (num_kp + 1) * 4, num_kp + 1, 7, padding=3)
        self.occlusion = tnn.Conv2d(be + (num_kp + 1) * 4, 1, 7, padding=3)
        self.num_kp = num_kp

    def forward(self, source_image, kp_d, kp_s):
        src = _gaussian_blur_downsample(source_image)
        B, C, h, w = src.shape
        K = self.num_kp
        heat = t_kp2gaussian(kp_d["value"], h, w) - t_kp2gaussian(kp_s["value"], h, w)
        heat = torch.cat([torch.zeros(B, 1, h, w), heat], 1).unsqueeze(2)

        identity = t_coord_grid(h, w).view(1, 1, h, w, 2)
        coord = identity - kp_d["value"].view(B, K, 1, 1, 2)
        jac = torch.matmul(kp_s["jacobian"], torch.inverse(kp_d["jacobian"]))
        jac = jac.unsqueeze(-3).unsqueeze(-3).repeat(1, 1, h, w, 1, 1)
        coord = torch.matmul(jac, coord.unsqueeze(-1)).squeeze(-1)
        d2s = coord + kp_s["value"].view(B, K, 1, 1, 2)
        motions = torch.cat([identity.repeat(B, 1, 1, 1, 1), d2s], 1)

        rep = src.unsqueeze(1).repeat(1, K + 1, 1, 1, 1).view(B * (K + 1), C, h, w)
        deformed = F.grid_sample(rep, motions.view(B * (K + 1), h, w, 2))
        deformed = deformed.view(B, K + 1, C, h, w)

        hg_in = torch.cat([heat, deformed], 2).view(B, -1, h, w)
        pred = self.hourglass(hg_in)
        mask = torch.softmax(self.mask(pred), dim=1)
        deformation = (motions.permute(0, 1, 4, 2, 3) * mask.unsqueeze(2)) \
            .sum(1).permute(0, 2, 3, 1)
        occ = torch.sigmoid(self.occlusion(pred))
        return deformation, occ


class TGenerator(tnn.Module):
    def __init__(self, be=64, max_f=128, bottleneck=2):
        super().__init__()
        self.dense_motion_network = TDenseMotion()
        self.first = TSame(3, be)
        self.down_blocks = tnn.ModuleList(
            [TDown(be, min(max_f, be * 2), 3, 1),
             TDown(min(max_f, be * 2), min(max_f, be * 4), 3, 1)])
        f = min(max_f, be * 4)
        self.bottleneck = tnn.ModuleDict(
            {f"r{i}": TRes(f) for i in range(bottleneck)})
        self.up_blocks = tnn.ModuleList(
            [TUp(f, min(max_f, be * 2)), TUp(min(max_f, be * 2), be)])
        self.final = tnn.Conv2d(be, 3, 7, padding=3)

    def forward(self, src, kp_d, kp_s):
        out = self.first(src)
        for d in self.down_blocks:
            out = d(out)
        deformation, occ = self.dense_motion_network(src, kp_d, kp_s)
        out = F.grid_sample(out, deformation)
        out = out * occ
        for r in self.bottleneck.values():
            out = r(out)
        for u in self.up_blocks:
            out = u(out)
        return torch.sigmoid(self.final(out))


def _rename_bottleneck(sd):
    """torch ModuleDict names 'bottleneck.r0.conv1...' match converter."""
    return sd


def test_generator_full_parity():
    oracle = TGenerator().eval()
    _randomize_bn_stats(oracle)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    model = OcclusionAwareGenerator(
        num_channels=3, num_kp=10, block_expansion=64, max_features=128,
        num_down_blocks=2, num_bottleneck_blocks=2, estimate_occlusion_map=True,
        dense_motion_params=dict(block_expansion=64, max_features=256,
                                 num_blocks=5, scale_factor=0.25))
    variables = convert_generator(sd, num_down_blocks=2,
                                  num_bottleneck_blocks=2, dense_num_blocks=5)

    rng = np.random.RandomState(0)
    src = torch.rand(1, 3, 256, 256)
    kp_d = {"value": torch.rand(1, 10, 2) - 0.5,
            "jacobian": torch.eye(2).view(1, 1, 2, 2).repeat(1, 10, 1, 1)
            + 0.1 * torch.randn(1, 10, 2, 2)}
    kp_s = {"value": torch.rand(1, 10, 2) - 0.5,
            "jacobian": torch.eye(2).view(1, 1, 2, 2).repeat(1, 10, 1, 1)
            + 0.1 * torch.randn(1, 10, 2, 2)}
    with torch.no_grad():
        ref = oracle(src, kp_d, kp_s)

    out = model.apply(
        variables, jnp.asarray(src.permute(0, 2, 3, 1).numpy()),
        {"value": jnp.asarray(kp_d["value"].numpy()),
         "jacobian": jnp.asarray(kp_d["jacobian"].numpy())},
        {"value": jnp.asarray(kp_s["value"].numpy()),
         "jacobian": jnp.asarray(kp_s["jacobian"].numpy())})

    ref_nhwc = ref.permute(0, 2, 3, 1).numpy()
    err = np.abs(np.asarray(out["prediction"]) - ref_nhwc)
    assert err.max() < 1e-3, err.max()
    assert err.mean() < 1e-4, err.mean()


def test_decode_shared_source_one_batch_matches_broadcast():
    """decode(shared_source=True) with 1-batch source/features must equal
    the broadcasted-batch decode (the inference pipeline's no-broadcast
    path; on CPU/f32 this exercises the dense-motion 1-batch handling and
    the generator's broadcast fallback branch)."""
    import jax
    import jax.numpy as jnp
    from eamm_tpu.models.generator import OcclusionAwareGenerator

    gen = OcclusionAwareGenerator(
        block_expansion=32, max_features=128, num_down_blocks=2,
        num_bottleneck_blocks=1,
        dense_motion_params=dict(block_expansion=16, max_features=64,
                                 num_blocks=3, scale_factor=0.25))
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    F = 3
    kp_d = {"value": jnp.asarray(rng.uniform(-1, 1, (F, 10, 2)), jnp.float32),
            "jacobian": jnp.asarray(
                np.tile(np.eye(2), (F, 10, 1, 1)), jnp.float32)}
    kp_s1 = {"value": jnp.asarray(rng.uniform(-1, 1, (1, 10, 2)), jnp.float32),
             "jacobian": jnp.asarray(
                 np.tile(np.eye(2), (1, 10, 1, 1)), jnp.float32)}
    variables = gen.init(jax.random.PRNGKey(0), src, 
                         {k: v[:1] for k, v in kp_d.items()},
                         kp_s1)
    feats = gen.apply(variables, src, method=gen.encode_source)

    kp_sF = {k: jnp.broadcast_to(v, (F,) + v.shape[1:])
             for k, v in kp_s1.items()}
    shared = gen.apply(variables, src, feats, kp_d, kp_sF,
                       method=gen.decode, want_aux=False, shared_source=True)
    srcF = jnp.broadcast_to(src, (F,) + src.shape[1:])
    featF = jnp.broadcast_to(feats, (F,) + feats.shape[1:])
    full = gen.apply(variables, srcF, featF, kp_d, kp_sF,
                     method=gen.decode, want_aux=False)
    np.testing.assert_allclose(np.asarray(shared["prediction"]),
                               np.asarray(full["prediction"]), atol=1e-6)


def test_decode_shared_source_want_aux():
    """shared_source + want_aux: the full-resolution aux 'deformed' warp
    must repeat the 1-batch source to the keypoint batch."""
    import jax
    import jax.numpy as jnp
    from eamm_tpu.models.generator import OcclusionAwareGenerator

    gen = OcclusionAwareGenerator(
        block_expansion=32, max_features=128, num_down_blocks=2,
        num_bottleneck_blocks=1,
        dense_motion_params=dict(block_expansion=16, max_features=64,
                                 num_blocks=3, scale_factor=0.25))
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    F = 2
    kp_d = {"value": jnp.asarray(rng.uniform(-1, 1, (F, 10, 2)), jnp.float32),
            "jacobian": jnp.asarray(
                np.tile(np.eye(2), (F, 10, 1, 1)), jnp.float32)}
    kp_s = {"value": jnp.asarray(rng.uniform(-1, 1, (1, 10, 2)), jnp.float32),
            "jacobian": jnp.asarray(
                np.tile(np.eye(2), (1, 10, 1, 1)), jnp.float32)}
    variables = gen.init(jax.random.PRNGKey(0), src,
                         {k: v[:1] for k, v in kp_d.items()}, kp_s)
    feats = gen.apply(variables, src, method=gen.encode_source)
    kp_sF = {k: jnp.broadcast_to(v, (F,) + v.shape[1:]) for k, v in kp_s.items()}
    out = gen.apply(variables, src, feats, kp_d, kp_sF,
                    method=gen.decode, want_aux=True, shared_source=True)
    assert out["deformed"].shape == (F, 64, 64, 3)
    assert out["prediction"].shape[0] == F
