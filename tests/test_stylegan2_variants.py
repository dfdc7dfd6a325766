"""Shape/behavior tests for the non-synthesis StyleGAN2 modules
(ref:modules/stylegan2.py:704-922 — dead upstream, implemented for full
component coverage; VERDICT r1 item 9)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eamm_tpu.models.stylegan2 import (
    StyleGAN2Discriminator, TileStyleGAN2Discriminator, StyleGAN2Encoder,
    StyleGAN2Decoder, StyleGAN2ImageGenerator, DResBlock, ConvLayer)

RNG = jax.random.PRNGKey(0)


def test_conv_layer_downsample_shape():
    m = ConvLayer(8, 3, downsample=True)
    x = jnp.ones((2, 32, 32, 4))
    v = m.init(RNG, x)
    out = m.apply(v, x)
    assert out.shape == (2, 16, 16, 8)


def test_dresblock_shapes():
    x = jnp.ones((2, 32, 32, 8))
    down = DResBlock(16)
    v = down.init(RNG, x)
    assert down.apply(v, x).shape == (2, 16, 16, 16)
    same = DResBlock(8, downsample=False)
    v = same.init(RNG, x)
    assert same.apply(v, x).shape == x.shape


@pytest.mark.parametrize("variant,expect_spatial",
                         [("global", None), ("patch", 8), ("smallpatch", 16)])
def test_discriminator_variants(variant, expect_spatial):
    d = StyleGAN2Discriminator(size=64, ndf=32, variant=variant)
    x = jax.random.uniform(RNG, (2, 64, 64, 3))
    v = d.init(RNG, x)
    out = d.apply(v, x)
    if expect_spatial is None:
        assert out.shape == (2, 1)
    else:
        assert out.shape == (2, expect_spatial, expect_spatial, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_tile_discriminator():
    d = TileStyleGAN2Discriminator(patch_size=32, ndf=32)
    x = jax.random.uniform(RNG, (2, 64, 64, 3))
    v = d.init(RNG, x)
    out = d.apply(v, x)                    # 2 images x 4 tiles each
    assert out.shape == (8, 1)


def test_encoder_decoder_generator_roundtrip():
    gen = StyleGAN2ImageGenerator(size=64, ngf=32, n_blocks=4,
                                  num_downsampling=2)
    x = jax.random.uniform(RNG, (2, 64, 64, 3))
    v = gen.init(RNG, x)
    fake = gen.apply(v, x)
    assert fake.shape == (2, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(fake)))

    # encode_only taps features at requested layers (CUT-style usage)
    feats = gen.apply(v, x, layers=(0, 1, 2, -1), encode_only=True)
    assert len(feats) == 4
    assert feats[0].shape == x.shape                    # identity tap
    assert feats[-1].shape[1:3] == (16, 16)             # after 2 downsamples

    fake2, feats2 = gen.apply(v, x, layers=(1,))
    assert fake2.shape == (2, 64, 64, 3) and len(feats2) == 1


def test_encoder_standalone_matches_generator_encoder():
    gen = StyleGAN2ImageGenerator(size=64, ngf=32, n_blocks=4,
                                  num_downsampling=1)
    x = jax.random.uniform(RNG, (1, 64, 64, 3))
    v = gen.init(RNG, x)
    feat = gen.apply(v, x, method=lambda m, x: m.encoder(x))
    enc = StyleGAN2Encoder(size=64, ngf=32, n_blocks=4, num_downsampling=1)
    feat2 = enc.apply({"params": v["params"]["encoder"]}, x)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(feat2), atol=1e-6)

    dec = StyleGAN2Decoder(size=64, ngf=32, n_blocks=4, num_downsampling=1)
    out = dec.apply({"params": v["params"]["decoder"]}, feat2)
    assert out.shape == (1, 64, 64, 3)
