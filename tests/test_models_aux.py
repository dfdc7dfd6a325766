"""Shape tests for the auxiliary networks (SURVEY.md §2.2 inventory)."""
import jax
import jax.numpy as jnp
import numpy as np

from eamm_tpu.models.aux import (CtEncoder, EmotionNet, AF2F, AF2FS, A2I,
                                 NANet, EmDetector, AudioFeature, TFNet)
from eamm_tpu.ops.adain import adaptive_instance_normalization, coral

KEY = jax.random.PRNGKey(0)


def test_ct_encoder():
    m = CtEncoder()
    x = jnp.zeros((2, 28, 12))
    v = m.init(KEY, x)
    assert m.apply(v, x).shape == (2, 256)


def test_emotion_net():
    m = EmotionNet()
    x = jnp.zeros((2, 28, 12))
    v = m.init(KEY, x)
    assert m.apply(v, x).shape == (2, 128)


def test_af2f_decoders():
    m = AF2F()
    v = m.init(KEY, jnp.zeros((2, 256)), jnp.zeros((2, 128)))
    assert m.apply(v, jnp.zeros((2, 256)), jnp.zeros((2, 128))).shape \
        == (2, 64, 64, 35)
    m2 = AF2FS()
    v2 = m2.init(KEY, jnp.zeros((2, 256)))
    out = m2.apply(v2, jnp.zeros((2, 256)))
    assert out.shape == (2, 64, 64, 35)
    assert float(jnp.min(out)) >= 0.0        # final ReLU


def test_a2i():
    m = A2I()
    v = m.init(KEY, jnp.zeros((2, 28, 12)))
    assert m.apply(v, jnp.zeros((2, 28, 12))).shape == (2, 64, 64, 2)


def test_nanet():
    m = NANet()
    v = m.init(KEY, jnp.zeros((2, 8, 8)))
    out = m.apply(v, jnp.zeros((2, 8, 8)))
    assert out.shape[0] == 2 and out.shape[-1] == 35


def test_em_detector():
    m = EmDetector(max_features=64)
    v = m.init(KEY, jnp.zeros((1, 256, 256, 3)))
    feat, fake = m.apply(v, jnp.zeros((1, 256, 256, 3)))
    assert feat.shape == (1, 512)
    assert fake.shape == (1, 8)


def test_audio_feature_wrapper():
    m = AudioFeature()
    v = m.init(KEY, jnp.zeros((2, 28, 12)))
    assert m.apply(v, jnp.zeros((2, 28, 12))).shape == (2, 64, 64, 35)


def test_tfnet_modes():
    img = jnp.zeros((1, 256, 256, 3))
    audio = jnp.zeros((1, 2, 28, 12))
    pose = jnp.zeros((1, 2, 6))
    emo = jnp.zeros((1, 2, 512))
    for mode in ("concat", "adain_input", "adain_output"):
        m = TFNet(mode=mode)
        v = m.init(KEY, img, audio, pose, emo)
        assert m.apply(v, img, audio, pose, emo).shape == (1, 2, 64, 64, 35), mode


def test_adain():
    rng = np.random.RandomState(0)
    c = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
    s = jnp.asarray(rng.randn(2, 8, 8, 4) * 2 + 1, jnp.float32)
    out = adaptive_instance_normalization(c, s)
    np.testing.assert_allclose(np.asarray(out.mean(axis=(1, 2))),
                               np.asarray(s.mean(axis=(1, 2))), atol=1e-4)


def test_coral_matches_target_stats():
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.rand(16, 16, 3), jnp.float32)
    tgt = jnp.asarray(rng.rand(16, 16, 3) * 0.5 + 0.2, jnp.float32)
    out = coral(src, tgt)
    np.testing.assert_allclose(np.asarray(out).mean((0, 1)),
                               np.asarray(tgt).mean((0, 1)), atol=0.05)
