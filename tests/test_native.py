"""Native C++ batch decoder vs imageio golden."""
import numpy as np
import pytest

from eamm_tpu.data import native


pytestmark = pytest.mark.smoke

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
    """Minimal RIFF/AVI parser: returns (header dict, list of frame bytes).

    Stream 0 (video) headers land in the top-level dict (legacy layout);
    every stream also gets a dict in ``hdr["strl"]`` and audio ('01wb')
    chunk payloads collect in ``hdr["audio_chunks"]`` in file order — used
    by the audio tests to verify interleaving and sample counts."""
    import struct
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    pos, hdr, frames = 12, {"strl": [], "audio_chunks": [], "order": []}, []
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
                s = {"fcc_type": data[body:body + 4],
                     "handler": data[body + 4:body + 8]}
                (s["scale"], s["rate"], _, s["length"], s["bufsize"], _,
                 s["sample_size"]) = struct.unpack(
                    "<7I", data[body + 20:body + 48])
                hdr["strl"].append(s)
                if len(hdr["strl"]) == 1:
                    hdr.update({k: v for k, v in s.items()
                                if k in ("fcc_type", "handler", "scale",
                                         "rate")})
            elif cc == b"strf":
                s = hdr["strl"][-1]
                if s["fcc_type"] == b"auds":
                    (s["format_tag"], s["channels"], s["samples_per_sec"],
                     s["avg_bytes"], s["block_align"],
                     s["bits"]) = struct.unpack(
                        "<2H2I2H", data[body:body + 16])
                else:
                    s["bits"], = struct.unpack(
                        "<H", data[body + 14:body + 16])
                    s["compression"] = data[body + 16:body + 20]
                    hdr["bits"] = s["bits"]
                    hdr["compression"] = s["compression"]
            elif cc == b"00db":
                frames.append(data[body:body + size])
                hdr["order"].append("v")
            elif cc == b"01wb":
                hdr["audio_chunks"].append(data[body:body + size])
                hdr["order"].append("a")
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


def test_avi_rgb_pcm_audio(tmp_path):
    """The delivered talking face has SOUND: a second 'auds' PCM stream,
    interleaved per frame, with every input sample present and in order
    (ref:demo.py:427-431 — the ffmpeg remux this muxer replaces)."""
    from eamm_tpu.data import native
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, (5, 16, 12, 3), dtype=np.uint8)
    # 5 frames @ 25 fps = 0.2 s -> 3200 samples @16k, plus a 137-sample tail
    pcm = rng.randint(-32768, 32767, 3200 + 137, dtype=np.int16)
    path = str(tmp_path / "sound.avi")
    native.write_avi_rgb(path, frames, fps=25.0, audio=pcm,
                         sample_rate=16000)
    hdr, chunks = _parse_avi(path)
    assert hdr["streams"] == 2 and len(hdr["strl"]) == 2
    aud = hdr["strl"][1]
    assert aud["fcc_type"] == b"auds"
    assert aud["format_tag"] == 1 and aud["bits"] == 16    # PCM s16
    assert aud["channels"] == 1 and aud["samples_per_sec"] == 16000
    assert aud["length"] == 3200 + 137                     # every sample
    got = np.frombuffer(b"".join(hdr["audio_chunks"]), np.int16)
    np.testing.assert_array_equal(got, pcm)
    # interleaved: video and audio chunks alternate (audio tail rides the
    # final chunk), starting with frame 0's video
    assert len(chunks) == 5
    assert hdr["order"] == ["v", "a"] * 5
    # frame i's audio chunk spans samples [i*640, (i+1)*640)
    assert [len(c) // 2 for c in hdr["audio_chunks"]] == [640] * 4 + [777]


def test_avi_audio_float_waveform_and_tuple(tmp_path):
    """Float [-1,1] waveforms (load_audio output) and (array, rate) tuples
    are accepted and converted to s16 PCM."""
    from eamm_tpu.data import native
    wave = np.sin(np.linspace(0, 40, 8000)).astype(np.float32)
    frames = np.zeros((2, 8, 8, 3), np.uint8)
    path = str(tmp_path / "wave.avi")
    native.write_avi_rgb(path, frames, fps=25.0, audio=(wave, 8000))
    hdr, _ = _parse_avi(path)
    aud = hdr["strl"][1]
    assert aud["samples_per_sec"] == 8000 and aud["length"] == 8000
    got = np.frombuffer(b"".join(hdr["audio_chunks"]), np.int16)
    np.testing.assert_allclose(got / 32767.0, wave, atol=1 / 32767.0)


def test_avi_i420_pcm_audio(tmp_path):
    from eamm_tpu.data import native
    rng = np.random.RandomState(4)
    y = rng.randint(0, 256, (3, 8, 8), dtype=np.uint8)
    u = rng.randint(0, 256, (3, 4, 4), dtype=np.uint8)
    v = rng.randint(0, 256, (3, 4, 4), dtype=np.uint8)
    pcm = rng.randint(-1000, 1000, (1920, 2), dtype=np.int16)  # stereo
    path = str(tmp_path / "s420.avi")
    native.write_avi_i420(path, y, u, v, fps=25.0, audio=pcm,
                          sample_rate=16000)
    hdr, chunks = _parse_avi(path)
    aud = hdr["strl"][1]
    assert hdr["streams"] == 2 and aud["channels"] == 2
    assert aud["block_align"] == 4 and aud["length"] == 1920
    got = np.frombuffer(b"".join(hdr["audio_chunks"]),
                        np.int16).reshape(-1, 2)
    np.testing.assert_array_equal(got, pcm)
    assert len(chunks) == 3


def test_avi_audio_python_fallback_byte_identical(tmp_path, monkeypatch):
    """The pure-python muxer emits the exact bytes of the C++ one for the
    two-stream (video+PCM) layout too."""
    from eamm_tpu.data import native
    if not native.native_available():
        pytest.skip("native lib unavailable; nothing to compare")
    rng = np.random.RandomState(5)
    frames = rng.randint(0, 256, (4, 8, 10, 3), dtype=np.uint8)
    y = rng.randint(0, 256, (4, 8, 8), dtype=np.uint8)
    u = rng.randint(0, 256, (4, 4, 4), dtype=np.uint8)
    v = rng.randint(0, 256, (4, 4, 4), dtype=np.uint8)
    pcm = rng.randint(-32768, 32767, 2000, dtype=np.int16)
    a, b = str(tmp_path / "nat.avi"), str(tmp_path / "py.avi")
    a2, b2 = str(tmp_path / "nat420.avi"), str(tmp_path / "py420.avi")
    native.write_avi_rgb(a, frames, fps=29.97, audio=pcm)
    native.write_avi_i420(a2, y, u, v, fps=29.97, audio=pcm)
    monkeypatch.setattr(native, "_load_avi", lambda: None)
    native.write_avi_rgb(b, frames, fps=29.97, audio=pcm)
    native.write_avi_i420(b2, y, u, v, fps=29.97, audio=pcm)
    assert open(a, "rb").read() == open(b, "rb").read()
    assert open(a2, "rb").read() == open(b2, "rb").read()


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
