"""Preprocess CLI subcommands end-to-end."""
import os

import numpy as np

from eamm_tpu.cli.preprocess import main
from eamm_tpu.data.preprocess import load_template
from eamm_tpu.data.pose import angle2matrix


def test_crop_with_explicit_landmarks(tmp_path):
    import imageio.v2 as imageio
    rng = np.random.RandomState(0)
    src = str(tmp_path / "face.png")
    imageio.imwrite(src, (rng.rand(300, 300, 3) * 255).astype(np.uint8))
    lm = str(tmp_path / "lm.npy")
    np.save(lm, load_template())
    out = main(["crop", "--image", src, "--out", str(tmp_path / "crop.png"),
                "--landmarks", lm])
    img = imageio.imread(out)
    assert img.shape == (256, 256, 3)


def test_align_with_landmarks(tmp_path):
    rng = np.random.RandomState(1)
    frames = str(tmp_path / "clip.npy")
    np.save(frames, (rng.rand(3, 256, 256, 3) * 255).astype(np.uint8))
    lm = str(tmp_path / "lm.npy")
    np.save(lm, load_template())
    out_dir = main(["align", "--frames", frames,
                    "--out-dir", str(tmp_path / "aligned"),
                    "--landmarks", lm])
    assert len(os.listdir(out_dir)) == 3


def test_mfcc_subcommand(tmp_path):
    from scipy.io import wavfile
    wav = str(tmp_path / "a.wav")
    wavfile.write(wav, 16000,
                  (np.random.RandomState(2).randn(16000) * 3000)
                  .astype(np.int16))
    out = main(["mfcc", "--audio", wav, "--out-dir", str(tmp_path),
                "--name", "clip0"])
    windows = np.load(out)
    assert windows.shape[1:] == (28, 13)


def test_pose_subcommand(tmp_path):
    theta = (0.1, -0.2, 0.3)
    R = angle2matrix(theta)
    P = np.concatenate([0.001 * R, np.array([[1.0], [2.0], [3.0]])], axis=1)
    params = str(tmp_path / "params.npy")
    np.save(params, np.stack([P.reshape(-1)] * 4))
    out = main(["pose", "--params", params, "--out", str(tmp_path / "p.npy")])
    poses = np.load(out)
    assert poses.shape == (4, 7)
    np.testing.assert_allclose(poses[0, :3], np.rad2deg(theta), atol=1e-5)


def test_pose_from_frames_subcommand(tmp_path):
    import pytest
    rng = np.random.RandomState(3)
    frame = rng.randint(0, 60, (96, 96, 3)).astype(np.uint8)
    frame[20:80, 28:68] = [190, 120, 90]
    frames = str(tmp_path / "clip.npy")
    np.save(frames, np.stack([frame, frame]))
    out = main(["pose", "--frames", frames, "--out", str(tmp_path / "p.npy")])
    poses = np.load(out)
    assert poses.shape == (2, 7)
    assert np.isfinite(poses).all()
    with pytest.raises(SystemExit, match="exactly one"):
        main(["pose", "--out", str(tmp_path / "q.npy")])
