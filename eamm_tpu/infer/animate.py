"""Reconstruction / animation evaluation.

The reference's run.py imports ``reconstruction`` and ``animate`` modules
that do not exist in the repo (SURVEY.md §5.1) — they are the standard FOMM
evaluation protocols.  Implemented here properly:

- **reconstruction**: drive each clip's first frame with the clip's own
  per-frame keypoints; report per-frame L1 against the ground-truth frames.
- **animate**: drive a source clip's example frame with another clip's
  keypoint trajectory (PairedDataset), optionally with relative keypoint
  transfer.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from eamm_tpu.ops.motion import normalize_kp


def _make_render(models, variables):
    gen = models["generator"]

    @jax.jit
    def kp_fn(frames):
        return models["kp_detector"].apply(variables["kp_detector"], frames)

    @jax.jit
    def render_fn(source, kp_driving_value, kp_driving_jacobian,
                  kp_source_value, kp_source_jacobian):
        T = kp_driving_value.shape[0]
        feats = gen.apply(variables["generator"], source,
                          method=gen.encode_source)
        srcT = jnp.broadcast_to(source, (T,) + source.shape[1:])
        featT = jnp.broadcast_to(feats, (T,) + feats.shape[1:])
        kp_s = {"value": jnp.broadcast_to(kp_source_value,
                                          (T,) + kp_source_value.shape[1:]),
                "jacobian": jnp.broadcast_to(
                    kp_source_jacobian, (T,) + kp_source_jacobian.shape[1:])}
        out = gen.apply(variables["generator"], srcT, featT,
                        {"value": kp_driving_value,
                         "jacobian": kp_driving_jacobian}, kp_s,
                        method=gen.decode, want_aux=False)
        return out["prediction"]

    return kp_fn, render_fn


def reconstruction(models, variables, dataset, num_videos: int = 10,
                   emotion_feature_fn=None) -> dict:
    """Self-reconstruction over ``num_videos`` clips (FOMM evaluation
    protocol): per-frame L1 plus PSNR / SSIM / AKD (keypoints re-detected on
    the reconstruction and compared to the ground-truth frames' keypoints).

    ``emotion_feature_fn`` ([T,H,W,3] -> [T,D] embedding, e.g. the jitted
    ``EmotionK.feature`` trunk) additionally reports AED — the mean L2
    distance between the embeddings of the reconstruction and the ground
    truth, the standard companion metric to AKD in this literature."""
    from eamm_tpu.utils.metrics import clip_metrics
    kp_fn, render_fn = _make_render(models, variables)
    per_clip = []
    for i in range(min(num_videos, len(dataset))):
        sample = dataset[i]
        driving = jnp.asarray(sample["driving"])            # [T,H,W,3]
        source = driving[:1]
        kp_d = kp_fn(driving)
        kp_s = kp_fn(source)
        pred = render_fn(source, kp_d["value"], kp_d["jacobian"],
                         kp_s["value"], kp_s["jacobian"])
        kp_pred = kp_fn(pred)
        m = clip_metrics(pred, driving,
                         kp_pred=kp_pred["value"],
                         kp_target=kp_d["value"])
        if emotion_feature_fn is not None:
            m["aed"] = float(jnp.mean(jnp.linalg.norm(
                emotion_feature_fn(pred) - emotion_feature_fn(driving),
                axis=-1)))
        per_clip.append(m)
    out = {"reconstruction_" + k: float(np.mean([m[k] for m in per_clip]))
           for k in (per_clip[0] if per_clip else {})}
    out["videos"] = len(per_clip)
    if "reconstruction_l1" not in out:
        out["reconstruction_l1"] = float("nan")
    return out


def animate(models, variables, paired_dataset, relative: bool = True,
            adapt_scale: bool = False) -> list[np.ndarray]:
    """Cross-identity animation over a PairedDataset; returns the generated
    clips (one [T,H,W,3] array per pair)."""
    kp_fn, render_fn = _make_render(models, variables)
    outputs = []
    for i in range(len(paired_dataset)):
        pair = paired_dataset[i]
        driving = jnp.asarray(pair["driving_driving"])
        source = jnp.asarray(pair["source_example_image"])[None]
        kp_d = kp_fn(driving)
        kp_s = kp_fn(source)
        kp_initial = {k: v[:1] for k, v in kp_d.items()}
        scale = 1.0
        if adapt_scale:
            from eamm_tpu.ops.motion import convex_hull_area
            scale = float(np.sqrt(convex_hull_area(np.asarray(kp_s["value"][0])))
                          / np.sqrt(convex_hull_area(
                              np.asarray(kp_initial["value"][0]))))
        kp_norm = normalize_kp(
            {k: v[0] for k, v in kp_s.items() if k != "heatmap"},
            {k: v for k, v in kp_d.items() if k != "heatmap"},
            {k: v[0] for k, v in kp_initial.items()},
            use_relative_movement=relative, use_relative_jacobian=relative,
            adapt_movement_scale=scale)
        pred = render_fn(source, kp_norm["value"], kp_norm["jacobian"],
                         kp_s["value"], kp_s["jacobian"])
        outputs.append(np.asarray(pred))
    return outputs
