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


def test_pose_from_landmarks_recovers_known_rotation():
    """Rotate the canonical 3-D landmark template by a known pose, project
    it weak-perspectively, and recover the identical 7-vector — landmark
    acquisition uses the same conventions as 3DDFA-param decomposition."""
    from eamm_tpu.data.pose import (template_3d, pose_from_landmarks,
                                    camera_from_landmarks)
    from eamm_tpu.data.preprocess import load_template

    template = load_template()
    X = template_3d(template)
    assert X.shape == (68, 3)
    for theta, s, t in [((0.3, -0.15, 0.1), 0.8, (120.0, 90.0)),
                        ((-0.5, 0.25, -0.3), 1.3, (-40.0, 15.0)),
                        ((0.0, 0.0, 0.0), 1.0, (0.0, 0.0))]:
        R = angle2matrix(theta)
        lm = (s * (X @ R.T))[:, :2] + np.asarray(t)
        pose = pose_from_landmarks(lm, template)
        np.testing.assert_allclose(pose[:3], np.rad2deg(theta), atol=1e-6)
        np.testing.assert_allclose(pose[3], s, atol=1e-9)
        np.testing.assert_allclose(pose[4:6], t, atol=1e-6)
        assert pose[6] == 0.0   # t3d.z unobservable under weak perspective
        P = camera_from_landmarks(lm, X)
        np.testing.assert_allclose((P[:2, :3] @ X.T).T + P[:2, 3],
                                   lm, atol=1e-8)


def test_estimate_pose_clip_shapes():
    """Frames -> [T, 7] poses through the landmark path (coarse fallback:
    finite values, in-plane-dominant — yaw/pitch stay small because the
    fallback places a rigid template)."""
    from eamm_tpu.data.preprocess import estimate_pose_clip

    rng = np.random.RandomState(0)
    frame = rng.randint(0, 60, (96, 96, 3)).astype(np.uint8)
    frame[20:80, 28:68] = [190, 120, 90]   # skin-colored blob
    frames = np.stack([frame, frame])
    poses = estimate_pose_clip(frames)
    assert poses.shape == (2, 7)
    assert np.isfinite(poses).all()
    assert np.abs(poses[:, :2]).max() < 10.0   # near-frontal by construction
    np.testing.assert_allclose(poses[0], poses[1])


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
