"""Per-feature accuracy of the coarse landmark fallback (VERDICT r4 #7).

The reference's crop/align and MEAD mouth-masking assume dlib's 68-point
per-feature accuracy (ref:process_data.py:21-22,44-68; the MouthCrop mask
is a FIXED rect in the cropped frame, ref:augmentation.py:175-213, so what
matters is where the crop puts the mouth).  dlib is absent here; the
in-env fallback (eamm_tpu/data/landmarks.py) places the M003 template on
a skin-blob localization.

Ground truth: the 12 author-cropped portraits in /root/reference/test/image
were produced by the reference's dlib+template crop, which by construction
places the subject's landmarks at (approximately) the template positions —
so on those images the template IS the per-feature ground truth the crop
implies.  This script runs the fallback on each author crop and reports:

- per-feature error (px of the 256^2 crop): eye centers, mouth corners,
  face-core mean (the 47 points the crop warp consumes);
- mouth-in-mask coverage: the similarity warp the fallback landmarks would
  induce (crop_image's template->landmarks fit) is applied to the true
  mouth points; the fraction landing inside the fixed MEAD MouthCrop rect
  (center (135,190), 100x60) is the fraction of the mouth the emotion
  branch would actually see masked.

Run: python benchmarks/landmark_fallback_eval.py  -> markdown table +
one JSON line.  CPU-only, a few seconds.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_IMAGES = "/root/reference/test/image"

# MEAD MouthCrop rect (ref:config/train_part2.yaml crop_mouth_param):
# center (135, 190), 100x60 -> x in [85, 185), y in [160, 220)
MASK_X0, MASK_X1 = 135 - 50, 135 + 50
MASK_Y0, MASK_Y1 = 190 - 30, 190 + 30


def eval_image(img_uint8, tpl):
    from eamm_tpu.data.landmarks import estimate_landmarks_coarse
    from eamm_tpu.data.preprocess import similarity_transform
    lm = estimate_landmarks_coarse(img_uint8, tpl)
    if lm is None:
        return None
    t = tpl.astype(np.float64)
    L = lm.astype(np.float64)

    def d(a, b):
        return float(np.linalg.norm(np.asarray(a) - np.asarray(b)))

    row = {
        "eye_l_px": d(L[36:42].mean(0), t[36:42].mean(0)),
        "eye_r_px": d(L[42:48].mean(0), t[42:48].mean(0)),
        "mouth_corner_l_px": d(L[48], t[48]),
        "mouth_corner_r_px": d(L[54], t[54]),
        "core47_mean_px": float(
            np.linalg.norm(L[:47] - t[:47], axis=1).mean()),
    }
    # Where would a crop driven by these landmarks put the TRUE mouth?
    # crop_image fits template[:47] -> landmarks[:47] (tform maps output
    # coords to input coords), so input point q lands at inv(tform) @ q.
    tform = similarity_transform(t[:47], L[:47])
    inv = np.linalg.inv(tform)
    mouth_true = np.c_[t[48:68], np.ones(20)] @ inv.T
    mx, my = mouth_true[:, 0], mouth_true[:, 1]
    inside = ((mx >= MASK_X0) & (mx < MASK_X1)
              & (my >= MASK_Y0) & (my < MASK_Y1))
    row["mouth_in_mask_frac"] = float(inside.mean())
    row["mouth_center_dx_px"] = float(mx.mean() - 136.5)  # template center
    row["mouth_center_dy_px"] = float(my.mean() - 181.0)
    return row


def main():
    import imageio.v2 as imageio
    from eamm_tpu.data.preprocess import load_template
    tpl = load_template()
    rows = {}
    for name in sorted(os.listdir(REF_IMAGES)):
        img = imageio.imread(os.path.join(REF_IMAGES, name))[..., :3]
        r = eval_image(img, tpl)
        if r is None:
            rows[name] = {"error": "no face found"}
            continue
        rows[name] = r

    cols = ["eye_l_px", "eye_r_px", "mouth_corner_l_px",
            "mouth_corner_r_px", "core47_mean_px", "mouth_in_mask_frac"]
    print("| image | " + " | ".join(cols) + " |")
    print("|" + "---|" * (len(cols) + 1))
    ok = [r for r in rows.values() if "error" not in r]
    for name, r in rows.items():
        if "error" in r:
            print(f"| {name} | {r['error']} |" + " |" * (len(cols) - 1))
        else:
            print(f"| {name} | " + " | ".join(
                f"{r[c]:.1f}" if c != "mouth_in_mask_frac"
                else f"{r[c]:.2f}" for c in cols) + " |")
    summary = {c: round(float(np.mean([r[c] for r in ok])), 2)
               for c in cols}
    summary["min_mouth_in_mask_frac"] = round(
        min(r["mouth_in_mask_frac"] for r in ok), 2)
    summary["images"] = len(rows)
    summary["detected"] = len(ok)
    print(json.dumps({"check": "landmark_fallback_per_feature",
                      "mean": summary}))


if __name__ == "__main__":
    main()
