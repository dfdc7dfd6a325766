"""Loss library: kp-mimic (part1), emotion residual (part2), perceptual
pyramid, LSGAN + feature matching.

Semantics mirror the reference loss composition (ref:modules/model.py:187-279
for part1, :312-413 for part2, :557-591 for the discriminator), vectorized
over the 16-frame window instead of Python loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from eamm_tpu.ops.antialias import antialias_downsample


def image_pyramid(x: jnp.ndarray, scales) -> dict:
    """Anti-aliased pyramid {'prediction_<scale>': [B,h,w,C]}
    (ref:modules/model.py:53-68)."""
    return {f"prediction_{scale}": antialias_downsample(x, scale)
            for scale in scales}


def mean_abs(a, b):
    return jnp.mean(jnp.abs(a - b))


def kp_mimic_loss(kp_vis: dict, kp_audio: dict, weight: float) -> dict:
    """Part-1 losses between visual and audio keypoints over all frames.

    kp_* trees have leading [B*T] (time folded).  The value target is
    detached (ref:modules/model.py:210-221); the heatmap term carries the
    historical x100 factor.
    """
    return {
        "loss_value": weight * mean_abs(
            jax.lax.stop_gradient(kp_vis["value"]), kp_audio["value"]),
        "loss_heatmap": weight * 100.0 * mean_abs(
            kp_vis["heatmap"], kp_audio["heatmap"]),
        "loss_jacobian": weight * mean_abs(
            kp_vis["jacobian"], kp_audio["jacobian"]),
    }


# keypoint indices receiving emotion displacement, and their order in the
# 4-kp emotion head output (ref:modules/model.py:374-392)
EMO_KP_INDICES = (1, 4, 6, 8)


def emotion_residual_loss(kp_vis: dict, kp_audio: dict, kp_emo: dict,
                          logits: jnp.ndarray, labels: jnp.ndarray,
                          weight: float, ten_kp: bool,
                          classify: bool = True) -> dict:
    """Part-2 residual |kp_vis - kp_audio - kp_emo| on the emotion keypoints
    + cross-entropy emotion classification (ref:modules/model.py:365-407).

    labels has leading [B*T] (repeated over frames).
    """
    if ten_kp:
        loss_value = mean_abs(
            jax.lax.stop_gradient(kp_vis["value"]) ,
            kp_audio["value"] + kp_emo["value"]) * weight
        loss_jac = mean_abs(kp_vis["jacobian"],
                            kp_audio["jacobian"] + kp_emo["jacobian"]) * weight
    else:
        idx = jnp.asarray(EMO_KP_INDICES)
        loss_value = 0.0
        loss_jac = 0.0
        for j, i in enumerate(EMO_KP_INDICES):
            loss_value += mean_abs(
                jax.lax.stop_gradient(kp_vis["value"][:, i]),
                kp_audio["value"][:, i] + kp_emo["value"][:, j]) * weight
            loss_jac += mean_abs(
                kp_vis["jacobian"][:, i],
                kp_audio["jacobian"][:, i] + kp_emo["jacobian"][:, j]) * weight
    out = {"loss_value": loss_value, "loss_jacobian": loss_jac}
    if classify:
        out["loss_classify"] = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels))
    else:
        out["loss_classify"] = jnp.zeros(())
    return out


def perceptual_loss(vgg_apply, pyramid_real: dict, pyramid_generated: dict,
                    scales, layer_weights) -> jnp.ndarray:
    """Multi-scale VGG19 perceptual L1 (ref:modules/model.py:239-248)."""
    total = 0.0
    for scale in scales:
        x_feats = vgg_apply(pyramid_generated[f"prediction_{scale}"])
        y_feats = vgg_apply(pyramid_real[f"prediction_{scale}"])
        for w, xf, yf in zip(layer_weights, x_feats, y_feats):
            total += w * mean_abs(xf, jax.lax.stop_gradient(yf))
    return total


def lsgan_generator_loss(disc_out: dict, scales, weight: float) -> jnp.ndarray:
    """(1 - D(G))^2 (ref:modules/model.py:505-513)."""
    total = 0.0
    for scale in scales:
        total += weight * jnp.mean(
            (1.0 - disc_out[f"prediction_map_{scale}"]) ** 2)
    return total


def lsgan_discriminator_loss(disc_real: dict, disc_fake: dict, scales,
                             weight: float) -> jnp.ndarray:
    """(1 - D(x))^2 + D(G)^2 (ref:modules/model.py:583-589)."""
    total = 0.0
    for scale in scales:
        total += weight * jnp.mean(
            (1.0 - disc_real[f"prediction_map_{scale}"]) ** 2
            + disc_fake[f"prediction_map_{scale}"] ** 2)
    return total


def feature_matching_loss(disc_real: dict, disc_fake: dict, scales,
                          layer_weights) -> jnp.ndarray:
    """L1 between discriminator feature maps (ref:modules/model.py:515-524)."""
    total = 0.0
    for scale in scales:
        reals = disc_real[f"feature_maps_{scale}"]
        fakes = disc_fake[f"feature_maps_{scale}"]
        for w, a, b in zip(layer_weights, reals, fakes):
            if w == 0:
                continue
            total += w * mean_abs(a, b)
    return total
