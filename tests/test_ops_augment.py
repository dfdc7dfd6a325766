"""Device-side augmentation vs the host pipeline (exact-semantics tests)."""
import numpy as np
import jax.numpy as jnp
import pytest

from eamm_tpu.data.augmentation import ColorJitter, AllAugmentationTransform
from eamm_tpu.ops.augment import color_jitter, decode_and_augment


@pytest.mark.smoke
def test_color_jitter_matches_host():
    rng = np.random.RandomState(0)
    clip = rng.rand(3, 32, 32, 3).astype(np.float32)
    for b, c, s, h in [(1.1, 0.95, 1.05, 0.05), (0.9, 1.08, 0.92, -0.08),
                       (1.0, 1.0, 1.0, 0.0)]:
        host = ColorJitter.apply_factors(clip, b, c, s, h)
        dev = np.asarray(color_jitter(jnp.asarray(clip), b, c, s, h))
        np.testing.assert_allclose(dev, host, atol=1e-4)


def test_color_jitter_per_sample_factors():
    """[B] factor vectors broadcast over a [B, T, H, W, 3] batch."""
    rng = np.random.RandomState(1)
    batch = rng.rand(2, 2, 16, 16, 3).astype(np.float32)
    fac = np.array([[1.1, 0.9, 1.2, 0.03], [0.8, 1.1, 0.9, -0.06]],
                   np.float32)
    bc = (slice(None),) + (None,) * 4
    out = np.asarray(color_jitter(jnp.asarray(batch),
                                  fac[:, 0][bc], fac[:, 1][bc],
                                  fac[:, 2][bc], fac[:, 3][bc]))
    for i in range(2):
        host = ColorJitter.apply_factors(batch[i], *fac[i])
        np.testing.assert_allclose(out[i], host, atol=1e-4)


def test_decode_and_augment_uint8_and_flags():
    rng = np.random.RandomState(2)
    drive_u8 = rng.randint(0, 256, (2, 2, 8, 8, 3), np.uint8)
    ex_u8 = rng.randint(0, 256, (2, 8, 8, 3), np.uint8)
    batch = {
        "example_image": jnp.asarray(ex_u8),
        "driving": jnp.asarray(drive_u8),
        "driving_audio": jnp.zeros((2, 2, 28, 12)),
        "flip_time": jnp.asarray([1, 0], jnp.uint8),
        "flip_h": jnp.asarray([0, 1], jnp.uint8),
        "jitter_factors": jnp.asarray([[1, 1, 1, 0], [1, 1, 1, 0]],
                                      jnp.float32),
    }
    out = decode_and_augment(batch)
    assert "jitter_factors" not in out and "flip_h" not in out
    np.testing.assert_allclose(np.asarray(out["example_image"]),
                               ex_u8.astype(np.float32) / 255.0)
    d = np.asarray(out["driving"])
    f = drive_u8.astype(np.float32) / 255.0
    # identity jitter still runs the (numerically exact-at-f32) pass-through
    np.testing.assert_allclose(d[0], f[0, ::-1], atol=2e-6)        # time flip
    np.testing.assert_allclose(d[1], f[1, :, :, ::-1], atol=2e-6)  # h flip

    # a plain float batch passes through untouched
    plain = {"driving": jnp.asarray(f), "driving_audio": batch["driving_audio"]}
    out2 = decode_and_augment(plain)
    np.testing.assert_array_equal(np.asarray(out2["driving"]), f)


def test_device_pipeline_matches_host_pipeline():
    """Same RNG stream: host AllAugmentationTransform(flip+jitter) on f32
    frames == device decode_and_augment on the uint8 frames + sampled
    decisions.  Pixels are uint8-exact before augmentation, so the only
    difference is f32-vs-f64 jitter math."""
    import random as pyrandom
    from eamm_tpu.data.datasets import (_make_device_aug, _sample_device_aug)

    rng = np.random.RandomState(3)
    frames_u8 = rng.randint(0, 256, (4, 32, 32, 3), np.uint8)
    frames = frames_u8.astype(np.float32) / 255.0
    params = {"flip_param": {"time_flip": True, "horizontal_flip": True},
              "jitter_param": {"brightness": 0.1, "contrast": 0.1,
                               "saturation": 0.1, "hue": 0.1}}

    for seed in range(6):           # cover flip branches
        pyrandom.seed(seed)
        host = AllAugmentationTransform(**params)(frames)

        pyrandom.seed(seed)
        flip, jitter = _make_device_aug(params)
        dec = _sample_device_aug(flip, jitter)
        batch = {"driving": jnp.asarray(frames_u8[None]),
                 "flip_time": jnp.asarray([dec["flip_time"]]),
                 "flip_h": jnp.asarray([dec["flip_h"]]),
                 "jitter_factors": jnp.asarray(dec["jitter_factors"][None])}
        dev = np.asarray(decode_and_augment(batch)["driving"])[0]
        np.testing.assert_allclose(dev, np.asarray(host, np.float32),
                                   atol=2e-4)


def test_device_aug_rejects_geometric_params():
    from eamm_tpu.data.datasets import _make_device_aug
    with pytest.raises(ValueError, match="flip_param/jitter_param"):
        _make_device_aug({"rotation_param": {"degrees": 30},
                          "jitter_param": {"brightness": 0.1}})


MEAD_AUG = {
    "crop_mouth_param": {"center_x": 135, "center_y": 190,
                         "mask_width": 100, "mask_height": 60},
    "flip_param": {"horizontal_flip": True, "time_flip": True},
    "rotation_param": {"degrees": 30},
    "perspective_param": {"pers_num": 30, "enlarge_num": 40},
    "jitter_param": {"brightness": 0.1, "contrast": 0.1,
                     "saturation": 0.1, "hue": 0.1},
}


def test_mead_device_pipeline_matches_host():
    """Same RNG stream: host MEAD pipeline (mouth-mask -> flip -> rotation
    -> perspective -> jitter) == device construction of transformed_driving
    from the clean uint8 stream + sampled decisions.  Differences: uint8
    noise quantization (1/510) and f32 warp coordinates vs f64."""
    import random as pyrandom
    from eamm_tpu.data.datasets import (_make_mead_device_aug,
                                        _sample_mead_device_aug)

    rng = np.random.RandomState(7)
    frames_u8 = rng.randint(0, 256, (4, 256, 256, 3), np.uint8)
    frames = frames_u8.astype(np.float32) / 255.0

    for seed in range(4):
        pyrandom.seed(seed)
        np.random.seed(seed)
        host = AllAugmentationTransform(**MEAD_AUG)(frames)

        pyrandom.seed(seed)
        np.random.seed(seed)
        samplers = _make_mead_device_aug(MEAD_AUG)
        dec = _sample_mead_device_aug(samplers, 4, 256, 256)
        batch = {"driving": jnp.asarray(frames_u8[None])}
        batch.update({k: jnp.asarray(np.asarray(v)[None])
                      for k, v in dec.items()})
        out = decode_and_augment(batch)
        dev = np.asarray(out["transformed_driving"])[0]
        # driving itself stays clean
        np.testing.assert_allclose(np.asarray(out["driving"])[0], frames)
        host = np.asarray(host, np.float32)
        assert dev.shape == host.shape
        err = np.abs(dev - host)
        assert err.mean() < 2e-3, (seed, err.mean())
        assert np.percentile(err, 99.9) < 0.03, (seed,
                                                 np.percentile(err, 99.9))


def test_mead_device_pipeline_partial_params_matches_host():
    """Host/device RNG-stream parity when some transforms are absent: an
    unconfigured transform must consume zero draws (review finding)."""
    import random as pyrandom
    from eamm_tpu.data.datasets import (_make_mead_device_aug,
                                        _sample_mead_device_aug)
    aug = {"crop_mouth_param": MEAD_AUG["crop_mouth_param"],
           "rotation_param": {"degrees": 30}}        # no flip/pers/jitter
    rng = np.random.RandomState(11)
    frames_u8 = rng.randint(0, 256, (3, 256, 256, 3), np.uint8)
    frames = frames_u8.astype(np.float32) / 255.0
    for seed in range(3):
        pyrandom.seed(seed)
        np.random.seed(seed)
        host = np.asarray(AllAugmentationTransform(**aug)(frames),
                          np.float32)
        pyrandom.seed(seed)
        np.random.seed(seed)
        samplers = _make_mead_device_aug(aug)
        dec = _sample_mead_device_aug(samplers, 3, 256, 256)
        assert "tdrv_flip_time" not in dec and "tdrv_jitter" not in dec
        batch = {"driving": jnp.asarray(frames_u8[None])}
        batch.update({k: jnp.asarray(np.asarray(v)[None])
                      for k, v in dec.items()})
        dev = np.asarray(decode_and_augment(batch)["transformed_driving"])[0]
        assert np.abs(dev - host).mean() < 2e-3


def test_mead_device_perspective_output_is_256():
    """The perspective warp emits a fixed 256x256 regardless of input size
    (host RandomPerspective / reference hardcode 256)."""
    import random as pyrandom
    from eamm_tpu.data.datasets import (_make_mead_device_aug,
                                        _sample_mead_device_aug)
    aug = {"perspective_param": {"pers_num": 30, "enlarge_num": 40}}
    rng = np.random.RandomState(12)
    frames_u8 = rng.randint(0, 256, (2, 64, 64, 3), np.uint8)
    frames = frames_u8.astype(np.float32) / 255.0
    pyrandom.seed(5)
    np.random.seed(5)
    host = np.asarray(AllAugmentationTransform(**aug)(frames), np.float32)
    assert host.shape == (2, 256, 256, 3)
    pyrandom.seed(5)
    np.random.seed(5)
    samplers = _make_mead_device_aug(aug)
    dec = _sample_mead_device_aug(samplers, 2, 64, 64)
    batch = {"driving": jnp.asarray(frames_u8[None])}
    batch.update({k: jnp.asarray(np.asarray(v)[None])
                  for k, v in dec.items()})
    out = decode_and_augment(batch)
    dev = np.asarray(out["transformed_driving"])[0]
    assert dev.shape == (2, 256, 256, 3)
    assert out["driving"].shape == (1, 2, 64, 64, 3)   # clean stream native
    assert np.abs(dev - host).mean() < 2e-2            # 64->256 upsampling
