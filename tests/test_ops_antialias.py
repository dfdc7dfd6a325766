"""Golden test for anti-aliased downsampling vs the torch construction
(fixed sigma=1.5 depthwise Gaussian blur + strided slice,
ref:modules/util.py:1005-1052)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from eamm_tpu.ops import antialias_downsample


pytestmark = pytest.mark.smoke

def torch_antialias(x, scale, sigma=1.5):
    ksize = 2 * round(sigma * 4) + 1
    ka = ksize // 2
    grid_y, grid_x = torch.meshgrid(torch.arange(ksize).float(),
                                    torch.arange(ksize).float(), indexing="ij")
    mean = (ksize - 1) / 2
    kernel = torch.exp(-((grid_y - mean) ** 2 + (grid_x - mean) ** 2) / (2 * sigma ** 2))
    kernel = kernel / kernel.sum()
    C = x.shape[1]
    kernel = kernel.view(1, 1, ksize, ksize).repeat(C, 1, 1, 1)
    out = F.pad(x, (ka, ka, ka, ka))
    out = F.conv2d(out, weight=kernel, groups=C)
    step = int(1 / scale)
    return out[:, :, ::step, ::step]


@pytest.mark.parametrize("scale", [0.25, 0.5, 0.125])
def test_antialias_downsample(scale):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    ours = np.asarray(antialias_downsample(jnp.asarray(x), scale))
    ref = torch_antialias(torch.from_numpy(x).permute(0, 3, 1, 2), scale)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5, rtol=1e-5)


def test_antialias_identity():
    x = jnp.ones((1, 8, 8, 1))
    assert antialias_downsample(x, 1.0) is x
