"""Native C++ batch decoder vs imageio golden."""
import numpy as np
import pytest

from eamm_tpu.data import native


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    import imageio.v2 as imageio
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.RandomState(0)
    paths, images = [], []
    for i in range(6):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        p = str(d / f"{i}.png")
        imageio.imwrite(p, img)
        paths.append(p)
        images.append(img)
    return paths, np.array(images)


def test_native_available():
    assert native.native_available(), "native library failed to build/load"


def test_decode_batch_matches_imageio(pngs):
    paths, images = pngs
    out = native.decode_batch(paths, 64, 64, n_threads=3)
    np.testing.assert_allclose(out, images.astype(np.float32) / 255.0,
                               atol=1e-6)


def test_decode_batch_resize(pngs):
    paths, _ = pngs
    out = native.decode_batch(paths[:2], 32, 32)
    assert out.shape == (2, 32, 32, 3)
    assert out.min() >= 0 and out.max() <= 1


def test_decode_missing_file_raises(pngs):
    paths, _ = pngs
    if not native.native_available():
        pytest.skip("no native lib")
    with pytest.raises(IOError):
        native.decode_batch(["/nonexistent/x.png"] + paths, 64, 64)
