"""Preprocessing math tests: Umeyama similarity fit, template warp, pose
decomposition, MFCC export layout."""
import numpy as np
import pytest

from eamm_tpu.data.preprocess import (similarity_transform, warp_to_template,
                                      load_template, crop_image,
                                      export_mfcc_windows)
from eamm_tpu.data.pose import P2sRt, matrix2angle, angle2matrix, pose_from_param


def test_similarity_transform_recovers_known():
    rng = np.random.RandomState(0)
    src = rng.rand(47, 2) * 100
    theta = 0.3
    s = 1.7
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    t = np.array([5.0, -12.0])
    dst = (s * src @ R.T) + t
    M = similarity_transform(src, dst)
    mapped = src @ M[:2, :2].T + M[:2, 2]
    np.testing.assert_allclose(mapped, dst, atol=1e-8)


def test_warp_identity():
    rng = np.random.RandomState(1)
    img = rng.rand(256, 256, 3).astype(np.float32)
    out = warp_to_template(img, np.eye(3))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_crop_image_with_explicit_landmarks():
    rng = np.random.RandomState(2)
    img = rng.rand(300, 300, 3).astype(np.float32)
    template = load_template()
    # landmarks exactly at template positions -> identity-ish warp
    out = crop_image(img, landmarks=template.copy(), template=template)
    assert out.shape == (256, 256, 3)
    np.testing.assert_allclose(out, img[:256, :256], atol=1e-4)


def test_pose_roundtrip():
    theta = (0.2, -0.1, 0.35)   # yaw, pitch, roll (radians)
    R = angle2matrix(theta)
    rec = matrix2angle(R)
    np.testing.assert_allclose(rec, theta, atol=1e-8)


def test_pose_from_param():
    theta = (0.1, -0.3, 0.05)
    R = angle2matrix(theta)
    s = 0.002
    t3d = np.array([10.0, 20.0, 30.0])
    P = np.concatenate([s * R, t3d[:, None]], axis=1)
    pose = pose_from_param(P.reshape(-1))
    np.testing.assert_allclose(pose[:3], np.rad2deg(theta), atol=1e-6)
    np.testing.assert_allclose(pose[3], s, atol=1e-9)
    np.testing.assert_allclose(pose[4:], t3d, atol=1e-9)


def test_export_mfcc_windows(tmp_path):
    from scipy.io import wavfile
    rng = np.random.RandomState(3)
    wav = (rng.randn(16000) * 3000).astype(np.int16)
    path = str(tmp_path / "a.wav")
    wavfile.write(path, 16000, wav)
    out = export_mfcc_windows(path, str(tmp_path), "a")
    windows = np.load(out)
    assert windows.ndim == 3 and windows.shape[1:] == (28, 13)
    # 1 s audio + 2x1920 pad -> ~124 mfcc frames -> ~25 windows
    assert 20 <= windows.shape[0] <= 30
