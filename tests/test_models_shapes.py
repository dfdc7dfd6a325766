"""Structural (init + forward shape) tests for every network module.

Shape contracts come from the reference architecture (SURVEY.md §2.1-2.2):
256x256 inputs, x0.25 internal scale, 58x58 heatmaps, 10 kp + 2x2 jacobians,
35-channel 64x64 audio feature maps.  Smaller spatial sizes are used where
the architecture allows it to keep CPU tests fast.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eamm_tpu.models import (KPDetector, KPDetectorA, DenseMotionNetwork,
                             OcclusionAwareGenerator, MultiScaleDiscriminator,
                             ATNet, EmotionK, EmotionMap)

KEY = jax.random.PRNGKey(0)


def test_kp_detector_shapes():
    model = KPDetector(num_kp=10, block_expansion=32, max_features=256,
                       num_blocks=5, temperature=0.1, estimate_jacobian=True,
                       scale_factor=0.25)
    x = jnp.zeros((2, 256, 256, 3))
    variables = model.init(KEY, x)
    out = model.apply(variables, x)
    assert out["value"].shape == (2, 10, 2)
    assert out["heatmap"].shape == (2, 10, 58, 58)
    assert out["jacobian"].shape == (2, 10, 2, 2)
    # zero-initialized jacobian head -> exact identity jacobians at init
    np.testing.assert_allclose(np.asarray(out["jacobian"]),
                               np.broadcast_to(np.eye(2), (2, 10, 2, 2)),
                               atol=1e-5)


def test_kp_detector_a_shapes():
    model = KPDetectorA(num_kp=10, temperature=0.1, estimate_jacobian=True)
    fmap = jax.random.normal(KEY, (3, 64, 64, 35))
    variables = model.init(KEY, fmap)
    out = model.apply(variables, fmap)
    assert out["value"].shape == (3, 10, 2)
    assert out["heatmap"].shape == (3, 10, 58, 58)
    assert out["jacobian"].shape == (3, 10, 2, 2)


def _kp(b, k, seed=0):
    rng = np.random.RandomState(seed)
    return {"value": jnp.asarray(rng.uniform(-0.5, 0.5, (b, k, 2)), jnp.float32),
            "jacobian": jnp.asarray(
                np.eye(2)[None, None] + 0.1 * rng.randn(b, k, 2, 2), jnp.float32)}


def test_dense_motion_shapes():
    model = DenseMotionNetwork(num_kp=10, block_expansion=64, max_features=256,
                               num_blocks=5, scale_factor=0.25)
    src = jnp.zeros((2, 256, 256, 3))
    kp_d, kp_s = _kp(2, 10, 0), _kp(2, 10, 1)
    variables = model.init(KEY, src, kp_d, kp_s)
    out = model.apply(variables, src, kp_d, kp_s)
    assert out["deformation"].shape == (2, 64, 64, 2)
    assert out["occlusion_map"].shape == (2, 64, 64, 1)
    assert out["mask"].shape == (2, 64, 64, 11)
    assert out["sparse_deformed"].shape == (2, 11, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(jnp.sum(out["mask"], -1)), 1.0,
                               atol=1e-5)


def test_generator_shapes():
    model = OcclusionAwareGenerator(
        num_channels=3, num_kp=10, block_expansion=64, max_features=512,
        num_down_blocks=2, num_bottleneck_blocks=2, estimate_occlusion_map=True,
        dense_motion_params=dict(block_expansion=64, max_features=256,
                                 num_blocks=5, scale_factor=0.25))
    src = jax.random.uniform(KEY, (1, 256, 256, 3))
    kp_d, kp_s = _kp(1, 10, 2), _kp(1, 10, 3)
    variables = model.init(KEY, src, kp_d, kp_s)
    out = model.apply(variables, src, kp_d, kp_s)
    assert out["prediction"].shape == (1, 256, 256, 3)
    assert out["deformed"].shape == (1, 256, 256, 3)
    assert out["occlusion_map"].shape == (1, 64, 64, 1)
    assert float(jnp.min(out["prediction"])) >= 0.0
    assert float(jnp.max(out["prediction"])) <= 1.0

    # encode once / decode per frame must equal the fused call
    feats = model.apply(variables, src, method=model.encode_source)
    out2 = model.apply(variables, src, feats, kp_d, kp_s, method=model.decode)
    np.testing.assert_allclose(np.asarray(out["prediction"]),
                               np.asarray(out2["prediction"]), atol=1e-6)


def test_discriminator_shapes():
    model = MultiScaleDiscriminator(scales=(1,), block_expansion=32,
                                    max_features=512, num_blocks=4, sn=True)
    pyr = {"prediction_1": jax.random.uniform(KEY, (2, 256, 256, 3))}
    variables = model.init(KEY, pyr)
    out = model.apply(variables, pyr)
    assert out["prediction_map_1"].shape[0] == 2
    assert len(out["feature_maps_1"]) == 4


def test_atnet_shapes():
    model = ATNet(jaco_net="cnn")
    img = jnp.zeros((2, 256, 256, 3))
    audio = jnp.zeros((2, 4, 28, 12))
    pose = jnp.zeros((2, 4, 6))
    variables = model.init(KEY, img, audio, pose)
    out = model.apply(variables, img, audio, pose, audio_weight=1.6)
    assert out.shape == (2, 4, 64, 64, 35)


@pytest.mark.slow
def test_atnet_gan_decoder_shapes():
    model = ATNet(jaco_net="gan")
    img = jnp.zeros((1, 256, 256, 3))
    audio = jnp.zeros((1, 2, 28, 12))
    pose = jnp.zeros((1, 2, 6))
    variables = model.init(KEY, img, audio, pose)
    out = model.apply(variables, img, audio, pose)
    assert out.shape == (1, 2, 64, 64, 35)


def test_emotion_k_shapes():
    model = EmotionK(block_expansion=32, max_features=256, num_blocks=5)
    x = jnp.zeros((2, 256, 256, 3))
    kp = _kp(2, 10, 4)
    variables = model.init(KEY, x, kp["value"], kp["jacobian"], head="all")
    for head, nkp in [("linear", 4), ("linear_10", 10), ("linear_4", 4),
                      ("linear_np_4", 4), ("linear_np_10", 10)]:
        out, fake = model.apply(variables, x, kp["value"], kp["jacobian"],
                                head=head)
        assert out["value"].shape == (2, nkp, 2), head
        assert out["jacobian"].shape == (2, nkp, 2, 2), head
        assert fake.shape == (2, 8)


def test_emotion_feature_decomposition_matches_forward():
    """feature() -> emotion_feature() must equal the fused 'linear' head
    (the inference fast path computes the trunk only on unique frames)."""
    model = EmotionK(block_expansion=32, max_features=128, num_blocks=5)
    x = jax.random.uniform(KEY, (2, 256, 256, 3))
    kp = _kp(2, 10, 6)
    variables = model.init(KEY, x, kp["value"], kp["jacobian"], head="all")
    full, fake_full = model.apply(variables, x, kp["value"], kp["jacobian"],
                                  head="linear")
    feats = model.apply(variables, x, method=model.feature)
    split, fake_split = model.apply(variables, feats, kp["value"],
                                    kp["jacobian"],
                                    method=model.emotion_feature)
    np.testing.assert_allclose(np.asarray(full["value"]),
                               np.asarray(split["value"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(full["jacobian"]),
                               np.asarray(split["jacobian"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fake_full), np.asarray(fake_split),
                               atol=1e-6)


def test_emotion_map_shapes():
    model = EmotionMap(block_expansion=32, max_features=256, num_blocks=5)
    x = jnp.zeros((2, 256, 256, 3))
    kp = _kp(2, 10, 5)
    variables = model.init(KEY, x, kp["value"], kp["jacobian"], head="all")
    out, fake = model.apply(variables, x, kp["value"], kp["jacobian"], head="map")
    assert out["value"].shape == (2, 10, 2)
    assert out["heatmap"].shape == (2, 10, 58, 58)
    out4, _ = model.apply(variables, x, kp["value"], kp["jacobian"], head="map_4")
    assert out4["value"].shape == (2, 4, 2)
    assert fake.shape == (2, 8)


@pytest.mark.smoke
def test_model_family_smoke():
    """One narrow forward through each core model family at 128^2 (cheap
    cold compile): import/init/wiring regressions surface here; the
    full-size contract shapes (58x58 heatmaps at 256^2, SURVEY §2.1) are
    asserted by the unmarked tests above."""
    x = jnp.zeros((1, 128, 128, 3))
    kp_model = KPDetector(num_kp=10, block_expansion=8, max_features=32,
                          num_blocks=3, temperature=0.1,
                          estimate_jacobian=True, scale_factor=0.25)
    out = kp_model.apply(kp_model.init(KEY, x), x)
    assert out["value"].shape == (1, 10, 2)
    assert out["jacobian"].shape == (1, 10, 2, 2)

    gen = OcclusionAwareGenerator(
        num_channels=3, num_kp=10, block_expansion=8, max_features=32,
        num_down_blocks=2, num_bottleneck_blocks=1,
        estimate_occlusion_map=True,
        dense_motion_params=dict(block_expansion=8, max_features=32,
                                 num_blocks=3, scale_factor=0.25))
    kp_d, kp_s = _kp(1, 10, 2), _kp(1, 10, 3)
    gout = gen.apply(gen.init(KEY, x, kp_d, kp_s), x, kp_d, kp_s)
    assert gout["prediction"].shape == (1, 128, 128, 3)

    emo = EmotionK(block_expansion=8, max_features=32, num_blocks=3)
    evars = emo.init(KEY, x, kp_d["value"], kp_d["jacobian"], head="linear_4")
    eout, fake = emo.apply(evars, x, kp_d["value"], kp_d["jacobian"],
                           head="linear_4")
    assert eout["value"].shape == (1, 4, 2)
    assert fake.shape == (1, 8)

    disc = MultiScaleDiscriminator(scales=(1,), block_expansion=8,
                                   max_features=32, num_blocks=3, sn=True)
    pyr = {"prediction_1": jax.random.uniform(KEY, (1, 128, 128, 3))}
    dout = disc.apply(disc.init(KEY, pyr), pyr)
    assert dout["prediction_map_1"].shape[0] == 1
