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


def _parse_avi(path):
    """Minimal RIFF/AVI parser: returns (header dict, list of frame bytes)."""
    import struct
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    pos, hdr, frames = 12, {}, []
    def walk(pos, end):
        while pos < end:
            cc = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            body = pos + 8
            if cc == b"LIST":
                walk(body + 4, body + size)
            elif cc == b"avih":
                (hdr["usec"], _, _, hdr["flags"], hdr["frames"], _,
                 hdr["streams"], _, hdr["w"], hdr["h"]) = struct.unpack(
                    "<10I", data[body:body + 40])
            elif cc == b"strh":
                hdr["fcc_type"] = data[body:body + 4]
                hdr["handler"] = data[body + 4:body + 8]
                hdr["scale"], hdr["rate"] = struct.unpack(
                    "<2I", data[body + 20:body + 28])
            elif cc == b"strf":
                hdr["bits"], = struct.unpack("<H", data[body + 14:body + 16])
                hdr["compression"] = data[body + 16:body + 20]
            elif cc == b"00db":
                frames.append(data[body:body + size])
            pos = body + size + (size & 1)
        return pos
    walk(pos, len(data))
    return hdr, frames


def test_avi_rgb_native_roundtrip(tmp_path):
    from eamm_tpu.data import native
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (5, 16, 12, 3), dtype=np.uint8)
    path = str(tmp_path / "out.avi")
    native.write_avi_rgb(path, frames, fps=30.0)
    hdr, chunks = _parse_avi(path)
    assert hdr["frames"] == 5 and (hdr["w"], hdr["h"]) == (12, 16)
    assert hdr["fcc_type"] == b"vids" and hdr["bits"] == 24
    assert hdr["rate"] / hdr["scale"] == 30.0
    assert len(chunks) == 5
    stride = (12 * 3 + 3) & ~3
    got = np.frombuffer(chunks[2], np.uint8).reshape(16, stride)
    # bottom-up BGR rows -> top-down RGB
    rgb = got[::-1, :36].reshape(16, 12, 3)[:, :, ::-1]
    np.testing.assert_array_equal(rgb, frames[2])


def test_avi_i420_roundtrip(tmp_path):
    from eamm_tpu.data import native
    rng = np.random.RandomState(1)
    y = rng.randint(0, 256, (4, 16, 16), dtype=np.uint8)
    u = rng.randint(0, 256, (4, 8, 8), dtype=np.uint8)
    v = rng.randint(0, 256, (4, 8, 8), dtype=np.uint8)
    path = str(tmp_path / "out_i420.avi")
    native.write_avi_i420(path, y, u, v, fps=25.0)
    hdr, chunks = _parse_avi(path)
    assert hdr["compression"] == b"I420" and hdr["bits"] == 12
    assert len(chunks) == 4 and len(chunks[0]) == 16 * 16 * 3 // 2
    np.testing.assert_array_equal(
        np.frombuffer(chunks[1][:256], np.uint8).reshape(16, 16), y[1])
    np.testing.assert_array_equal(
        np.frombuffer(chunks[1][256:320], np.uint8).reshape(8, 8), u[1])


def test_avi_python_fallback_byte_identical(tmp_path, monkeypatch):
    """The pure-python muxer must emit the exact bytes of the C++ one."""
    from eamm_tpu.data import native
    if not native.native_available():
        pytest.skip("native lib unavailable; nothing to compare")
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 256, (3, 8, 10, 3), dtype=np.uint8)
    y = rng.randint(0, 256, (3, 8, 8), dtype=np.uint8)
    u = rng.randint(0, 256, (3, 4, 4), dtype=np.uint8)
    v = rng.randint(0, 256, (3, 4, 4), dtype=np.uint8)
    a, b = str(tmp_path / "nat.avi"), str(tmp_path / "py.avi")
    a2, b2 = str(tmp_path / "nat420.avi"), str(tmp_path / "py420.avi")
    native.write_avi_rgb(a, frames, fps=29.97)
    native.write_avi_i420(a2, y, u, v, fps=29.97)
    monkeypatch.setattr(native, "_load_avi", lambda: None)
    native.write_avi_rgb(b, frames, fps=29.97)
    native.write_avi_i420(b2, y, u, v, fps=29.97)
    assert open(a, "rb").read() == open(b, "rb").read()
    assert open(a2, "rb").read() == open(b2, "rb").read()
