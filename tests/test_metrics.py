"""Quality metrics (PSNR / SSIM / AKD) used by the reconstruction protocol."""
import numpy as np
import pytest

from eamm_tpu.utils.metrics import (psnr, ssim, average_keypoint_distance,
                                    clip_metrics, _gaussian_window)


pytestmark = pytest.mark.smoke

def _np_ssim(pred, target, max_val=1.0, size=11, sigma=1.5):
    """Straight-line numpy SSIM (valid padding, separable Gaussian) as an
    independent oracle for the jax implementation."""
    win = _gaussian_window(size, sigma).astype(np.float64)

    def filt(x):  # x: [T,H,W,C]
        # separable valid convolution along H then W
        T, H, W, C = x.shape
        outh = np.zeros((T, H - size + 1, W, C))
        for i in range(size):
            outh += win[i] * x[:, i:i + H - size + 1]
        out = np.zeros((T, H - size + 1, W - size + 1, C))
        for i in range(size):
            out += win[i] * outh[:, :, i:i + W - size + 1]
        return out

    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    mp, mt = filt(pred), filt(target)
    sp = filt(pred * pred) - mp * mp
    st = filt(target * target) - mt * mt
    spt = filt(pred * target) - mp * mt
    num = (2 * mp * mt + c1) * (2 * spt + c2)
    den = (mp * mp + mt * mt + c1) * (sp + st + c2)
    return float(np.mean(num / den))


def test_psnr_known_value():
    t = np.zeros((2, 16, 16, 3), np.float32)
    p = t + 0.1  # mse = 0.01 -> psnr = 20 dB
    assert abs(float(psnr(p, t)) - 20.0) < 1e-4


def test_ssim_identity_and_degradation():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 24, 24, 3).astype(np.float32)
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    noisy = np.clip(x + rng.randn(*x.shape).astype(np.float32) * 0.2, 0, 1)
    s = float(ssim(noisy, x))
    assert 0.0 < s < 0.9


def test_ssim_matches_numpy_oracle():
    rng = np.random.RandomState(1)
    t = rng.rand(2, 32, 32, 3).astype(np.float32)
    p = np.clip(t + rng.randn(*t.shape).astype(np.float32) * 0.05, 0, 1)
    got = float(ssim(p, t))
    want = _np_ssim(p.astype(np.float64), t.astype(np.float64))
    assert got == pytest.approx(want, abs=2e-4)


def test_akd():
    a = np.zeros((4, 10, 2), np.float32)
    b = np.zeros((4, 10, 2), np.float32)
    b[..., 0] = 0.3  # every kp displaced 0.3 in x
    assert float(average_keypoint_distance(a, b)) == pytest.approx(0.3,
                                                                   abs=1e-6)


def test_clip_metrics_keys():
    rng = np.random.RandomState(2)
    t = rng.rand(1, 16, 16, 3).astype(np.float32)
    m = clip_metrics(t, t, kp_pred=np.zeros((1, 10, 2)),
                     kp_target=np.zeros((1, 10, 2)))
    assert set(m) == {"l1", "psnr", "ssim", "akd"}
    assert m["l1"] == 0.0 and m["ssim"] == pytest.approx(1.0, abs=1e-5)
    assert m["akd"] == 0.0
