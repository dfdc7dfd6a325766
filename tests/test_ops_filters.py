"""One-Euro filter scan vs a stateful numpy oracle implementing the
published One-Euro algorithm with the reference's conventions
(ref:filter1.py)."""
import numpy as np
import jax.numpy as jnp

from eamm_tpu.ops import one_euro_filter, one_euro_filter_np
import pytest


pytestmark = pytest.mark.smoke

class _NpLowPass:
    def __init__(self):
        self.prev_raw = None
        self.prev_filtered = None

    def process(self, value, alpha):
        if self.prev_raw is None:
            s = value
        else:
            s = alpha * value + (1.0 - alpha) * self.prev_filtered
        self.prev_raw = value
        self.prev_filtered = s
        return s


class _NpOneEuro:
    def __init__(self, mincutoff=1.0, beta=0.0, dcutoff=1.0, freq=30):
        self.freq = freq
        self.mincutoff = mincutoff
        self.beta = beta
        self.dcutoff = dcutoff
        self.x_filter = _NpLowPass()
        self.dx_filter = _NpLowPass()

    def _alpha(self, cutoff):
        te = 1.0 / self.freq
        tau = 1.0 / (2 * np.pi * cutoff)
        return 1.0 / (1.0 + tau / te)

    def process(self, x):
        prev_x = self.x_filter.prev_raw
        dx = 0.0 if prev_x is None else (x - prev_x) * self.freq
        edx = self.dx_filter.process(dx, self._alpha(self.dcutoff))
        cutoff = self.mincutoff + self.beta * np.abs(edx)
        return self.x_filter.process(x, self._alpha(cutoff))


def _run_case(mincutoff, beta, freq, scale, shape=(20, 3, 2), seed=0):
    rng = np.random.RandomState(seed)
    xs = rng.randn(*shape).astype(np.float32)

    ref_filter = _NpOneEuro(mincutoff=mincutoff, beta=beta, freq=freq)
    ref = np.stack([ref_filter.process(x * scale) / scale for x in xs])

    ours = np.asarray(one_euro_filter(jnp.asarray(xs), mincutoff=mincutoff,
                                      beta=beta, freq=freq, scale=scale))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_one_euro_pose_settings():
    # pose smoothing settings (ref:demo.py:302)
    _run_case(mincutoff=0.004, beta=0.7, freq=100, scale=1.0, shape=(30, 6))


def test_one_euro_audio_kp_settings():
    # audio keypoints: x10 scaling (ref:demo.py:241-248)
    _run_case(mincutoff=0.05, beta=8.0, freq=100, scale=10.0, shape=(25, 10, 2))


def test_one_euro_emotion_settings():
    # emotion displacements: x100 scaling (ref:demo.py:231-238)
    _run_case(mincutoff=1.0, beta=0.2, freq=100, scale=100.0, shape=(25, 4, 2))


def test_one_euro_np_matches_scan():
    """Host numpy variant (used by data loaders / pose prep, which must
    never dispatch to the device) == the lax.scan op at every setting."""
    from eamm_tpu.ops.filters import one_euro_filter, one_euro_filter_np
    rng = np.random.RandomState(3)
    for kw, shape in [
            (dict(mincutoff=0.01, beta=0.7, freq=100), (30, 7)),
            (dict(mincutoff=0.004, beta=0.7, freq=100), (25, 6)),
            (dict(mincutoff=0.05, beta=8.0, freq=100, scale=10.0),
             (25, 10, 2)),
            (dict(mincutoff=1.0, beta=0.2, freq=100, scale=100.0),
             (25, 4, 2))]:
        x = rng.randn(*shape).astype(np.float32)
        dev = np.asarray(one_euro_filter(jnp.asarray(x), **kw))
        host = one_euro_filter_np(x, **kw)
        np.testing.assert_allclose(host, dev, atol=2e-5, rtol=2e-5)


def test_one_euro_np_preserves_dtype():
    x32 = np.random.RandomState(1).randn(10, 3).astype(np.float32)
    assert one_euro_filter_np(x32, mincutoff=0.01, beta=0.7,
                              freq=100).dtype == np.float32
    x64 = x32.astype(np.float64)
    assert one_euro_filter_np(x64, mincutoff=0.01, beta=0.7,
                              freq=100).dtype == np.float64
