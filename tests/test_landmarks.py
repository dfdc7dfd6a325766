"""Coarse landmark fallback: preprocessing must work without dlib.

The reference crops via dlib 68-point landmarks (ref:process_data.py:44-68,
ref:demo.py:43-44,146-182); dlib is absent in this image, so
eamm_tpu.data.landmarks places the M003 template over a skin-blob face
localization.  Validation: (1) synthetic portrait with known geometry;
(2) the reference's own author-cropped pairs (test/raw_image vs test/image)
when present — the coarse crop must land on the same framing.
"""
import os

import numpy as np
import pytest

from eamm_tpu.data.landmarks import (center_prior_landmarks,
                                     estimate_landmarks_coarse, skin_mask)
from eamm_tpu.data.preprocess import crop_image, detect_landmarks, \
    load_template

REF = "/root/reference/test"


def _synthetic_portrait(h=480, w=400, cx=200, cy=220, rx=80, ry=105):
    """Skin-colored face ellipse + darker eye band on a gray background."""
    img = np.full((h, w, 3), 90, np.uint8)
    ys, xs = np.mgrid[:h, :w]
    face = ((xs - cx) / rx) ** 2 + ((ys - cy) / ry) ** 2 <= 1.0
    img[face] = (205, 140, 110)
    eye_band = face & (np.abs(ys - (cy - 0.35 * ry)) < 6)
    img[eye_band] = (120, 70, 55)
    return img, (cx, cy, rx, ry)


def test_skin_mask_finds_face():
    img, (cx, cy, rx, ry) = _synthetic_portrait()
    m = skin_mask(img)
    assert m.mean() > 0.05
    ys, xs = np.nonzero(m)
    assert abs(xs.mean() - cx) < 10 and abs(ys.mean() - cy) < 15


def test_coarse_landmarks_inside_face():
    img, (cx, cy, rx, ry) = _synthetic_portrait()
    lm = estimate_landmarks_coarse(img, load_template())
    assert lm is not None and lm.shape == (68, 2)
    core = lm[:47]
    # the face-core landmarks must straddle the face ellipse, not wander off
    assert abs(core[:, 0].mean() - cx) < 0.35 * rx
    assert abs(core[:, 1].mean() - cy) < 0.5 * ry
    width = core[:, 0].max() - core[:, 0].min()
    assert 1.0 * rx < width < 3.2 * rx


def test_detect_landmarks_never_none_with_fallback():
    img, _ = _synthetic_portrait()
    assert detect_landmarks(img) is not None
    # even a portrait with no detectable skin falls back to the prior
    gray = np.full((300, 300, 3), 128, np.uint8)
    lm = detect_landmarks(gray)
    assert lm is not None and lm.shape == (68, 2)
    prior = center_prior_landmarks(gray.shape, load_template())
    np.testing.assert_allclose(lm, prior)


def test_crop_image_from_raw_without_dlib():
    img, _ = _synthetic_portrait()
    out = crop_image(img)          # must not raise without dlib
    assert out.shape == (256, 256, 3) and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


def _lum(x):
    return np.asarray(x, np.float64)[..., :3] @ [0.299, 0.587, 0.114]


def _down(x, n):
    h, w = x.shape
    return x[:h // n * n, :w // n * n].reshape(n, h // n, n, w // n).mean((1, 3))


def _shift_ncc(a, b, max_shift=3):
    best = -1.0
    for dy in range(-max_shift, max_shift + 1):
        for dx in range(-max_shift, max_shift + 1):
            aa = a[max(0, dy):a.shape[0] + min(0, dy),
                   max(0, dx):a.shape[1] + min(0, dx)]
            bb = b[max(0, -dy):b.shape[0] + min(0, -dy),
                   max(0, -dx):b.shape[1] + min(0, -dx)]
            x = (aa - aa.mean()) / (aa.std() + 1e-9)
            y = (bb - bb.mean()) / (bb.std() + 1e-9)
            best = max(best, float((x * y).mean()))
    return best


@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "image")),
                    reason="reference test assets not present")
def test_mouth_mask_covers_mouth_under_fallback():
    """The MEAD MouthCrop mask is a FIXED rect in the cropped frame
    (center (135,190), 100x60 — ref:augmentation.py:175-213), so what the
    emotion branch sees masked depends on where the fallback-landmark crop
    puts the mouth.  On every author-cropped reference portrait (where the
    template positions are the ground truth the dlib crop implies), the
    crop induced by the fallback landmarks must keep the full true mouth
    inside the mask rect (benchmarks/landmark_fallback_eval.py reports the
    per-feature error table)."""
    import imageio.v2 as imageio
    from benchmarks.landmark_fallback_eval import eval_image
    tpl = load_template()
    fracs = {}
    for name in sorted(os.listdir(os.path.join(REF, "image"))):
        img = imageio.imread(os.path.join(REF, "image", name))[..., :3]
        row = eval_image(img, tpl)
        assert row is not None, f"no face found in {name}"
        fracs[name] = row["mouth_in_mask_frac"]
    assert min(fracs.values()) >= 0.9, fracs
    assert np.mean(list(fracs.values())) > 0.97, fracs


@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "raw_image")),
                    reason="reference test assets not present")
def test_coarse_crop_matches_author_crops():
    """The coarse crop of each raw portrait must reproduce the author's
    dlib-based framing (shift-tolerant luminance NCC at 32x32)."""
    import imageio.v2 as imageio
    pairs = [("brade2.jpg", "brade2.jpg"), ("dune_1.png", "dune_1.jpg"),
             ("dune_2.jpg", "dune_2.jpg"), ("scarlett.jpg", "scarlett.jpg")]
    tpl = load_template()
    scores = []
    for raw_name, crop_name in pairs:
        raw = imageio.imread(os.path.join(REF, "raw_image", raw_name))[..., :3]
        ref = imageio.imread(os.path.join(REF, "image", crop_name))[..., :3]
        lm = estimate_landmarks_coarse(raw, tpl)
        assert lm is not None, raw_name
        mine = crop_image(raw, landmarks=lm)
        score = _shift_ncc(_down(_lum(mine * 255), 32),
                           _down(_lum(ref.astype(np.float64)), 32))
        scores.append(score)
        assert score > 0.55, f"{raw_name}: framing NCC {score:.3f}"
    assert np.mean(scores) > 0.75, scores
