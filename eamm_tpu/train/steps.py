"""pjit-able training steps.

Each step is a pure function ``(state, batch, rng) -> (state, metrics)``
meant to be ``jax.jit``-ed with the batch sharded over the mesh's ``data``
axis and the state replicated: batch reductions (loss means, BatchNorm
statistics) then lower to ICI collectives, which reproduces the reference's
DataParallel + SyncBN training semantics (ref:train.py:53-63) with no
custom communication code.

Stage composition mirrors ref:run.py / ref:train.py:

- part1 (``train_part1``): optimize audio_feature + kp_detector_a against a
  frozen FOMM kp_detector/generator with kp-mimic losses.
- part1 fine-tune (``train_part1_fine_tune``): same, plus the generator is
  trained with a VGG perceptual pyramid on every 4th frame
  (``generator='audio'``) and optional LSGAN terms.
- part2 (``train_part2``): optimize emo_detector only with residual
  keypoint losses + emotion cross-entropy.

Design deviation from the reference (documented): the reference runs its
per-frame submodules in a Python loop, giving BatchNorm per-frame batch
statistics; here the 16-frame window folds into the batch axis, so BN
statistics average over B*T.  Inference parity is unaffected (eval BN uses
running stats).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from eamm_tpu.ops.augment import decode_and_augment
from eamm_tpu.train import losses as L


class Part1State(NamedTuple):
    trainable: dict           # {'audio_feature': params, 'kp_detector_a': params, ['generator']}
    frozen: dict              # {'kp_detector': params, ['generator'], ['vgg']}
    batch_stats: dict         # {module: stats tree}
    opt_state: Any
    step: jnp.ndarray


class Part2State(NamedTuple):
    trainable: dict           # {'emo_detector': params}
    frozen: dict              # {'kp_detector', 'audio_feature', 'kp_detector_a'}
    batch_stats: dict
    opt_state: Any
    step: jnp.ndarray


def _fold(x):
    """[B, T, ...] -> [B*T, ...]"""
    return x.reshape((-1,) + x.shape[2:])


def _compute_dtype(train_params: dict):
    """Mixed-precision policy: ``train_params['compute_dtype']``
    ('float32' default | 'bfloat16').

    The v5e fine-tune step is HBM-bandwidth-bound (352 GB accessed/step =
    ~100% of 819 GB/s at f32), so halving activation bytes is the lever
    that matters.  bf16 casts apply to *compute* only: master params,
    optimizer state and BatchNorm running statistics stay f32 (flax
    computes BN batch statistics in f32 regardless of input dtype), and
    gradients arrive back in f32 through the cast.  bf16 needs no loss
    scaling (same exponent range as f32)."""
    name = train_params.get("compute_dtype", "float32")
    return jnp.dtype(name)


def _metrics_f32(tree):
    """Report scalars in f32 regardless of the compute dtype."""
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def _cast_floating(tree, dt):
    """Cast f32 floating leaves to the compute dtype (no-op for f32)."""
    if dt == jnp.float32:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dt)
        if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 else x,
        tree)


def _apply_kp_detector(model, params, stats, images, train):
    variables = {"params": params, "batch_stats": stats}
    return model.apply(variables, images, train=train)


def init_part1_state(rng, models: dict, batch: dict, optimizer,
                     train_generator: bool = False,
                     vgg_params: dict | None = None,
                     discriminator_vars: dict | None = None) -> Part1State:
    """Initialize all module variables from a (host-shaped) example batch.

    discriminator_vars (params+batch_stats) are stored frozen — the
    discriminator trains in its own alternating step (see
    make_discriminator_step); the generator step only reads it.
    """
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    batch = decode_and_augment(batch)
    ex, drv = batch["example_image"], batch["driving"]
    v_kp = models["kp_detector"].init(k1, ex, train=True)
    v_gen = models["generator"].init(
        k2, ex,
        {"value": jnp.zeros((ex.shape[0], models["generator"].num_kp, 2)),
         "jacobian": jnp.broadcast_to(
             jnp.eye(2), (ex.shape[0], models["generator"].num_kp, 2, 2))},
        {"value": jnp.zeros((ex.shape[0], models["generator"].num_kp, 2)),
         "jacobian": jnp.broadcast_to(
             jnp.eye(2), (ex.shape[0], models["generator"].num_kp, 2, 2))},
        train=True)
    v_audio = models["audio_feature"].init(
        k3, ex, batch["driving_audio"], batch["driving_pose"], train=True)
    fmap = jnp.zeros((1, 64, 64, 35))
    v_kpa = models["kp_detector_a"].init(k4, fmap, train=True)

    trainable = {"audio_feature": v_audio["params"],
                 "kp_detector_a": v_kpa["params"]}
    frozen = {"kp_detector": v_kp["params"]}
    if train_generator:
        trainable["generator"] = v_gen["params"]
    else:
        frozen["generator"] = v_gen["params"]
    if vgg_params is not None:
        frozen["vgg"] = vgg_params
    batch_stats = {"kp_detector": v_kp["batch_stats"],
                   "generator": v_gen["batch_stats"],
                   "audio_feature": v_audio["batch_stats"]}
    if discriminator_vars is not None:
        frozen["discriminator"] = discriminator_vars["params"]
        batch_stats["discriminator"] = discriminator_vars["batch_stats"]
    return Part1State(trainable, frozen, batch_stats,
                      optimizer.init(trainable), jnp.zeros((), jnp.int32))


def _make_part1_loss(models: dict, train_params: dict) -> Callable:
    """Shared part1/fine-tune loss: ``(trainable, frozen, batch_stats,
    batch) -> (total, (metrics, new_stats, gen_out))`` where ``gen_out``
    (generated frame-0 prediction + its driving kp) feeds the alternating
    discriminator step when GAN weights are on, else None."""
    weights = train_params["loss_weights"]
    gen_mode = train_params.get("generator", "not")
    scales = tuple(train_params.get("scales", (1, 0.5, 0.25, 0.125)))
    perceptual_w = tuple(weights.get("perceptual", ()))
    use_perceptual = gen_mode in ("visual", "audio") and sum(perceptual_w) != 0
    gan_w = weights.get("generator_gan", 0)
    fm_w = tuple(weights.get("feature_matching", ()))
    use_gan = gen_mode in ("visual", "audio") and gan_w != 0
    dt = _compute_dtype(train_params)

    def loss_fn(trainable, frozen, batch_stats, batch):
        trainable = _cast_floating(trainable, dt)
        frozen = _cast_floating(frozen, dt)
        batch = _cast_floating(batch, dt)
        params = {**frozen, **trainable}
        B, T = batch["driving"].shape[:2]
        gen_out = None
        driving = _fold(batch["driving"])

        kp_driving = _apply_kp_detector(
            models["kp_detector"], params["kp_detector"],
            batch_stats["kp_detector"], driving, train=True)

        deco, audio_updates = models["audio_feature"].apply(
            {"params": params["audio_feature"],
             "batch_stats": batch_stats["audio_feature"]},
            batch["example_image"], batch["driving_audio"],
            batch["driving_pose"], train=True, mutable=["batch_stats"])

        kp_audio = models["kp_detector_a"].apply(
            {"params": params["kp_detector_a"]}, _fold(deco), train=True)

        metrics = L.kp_mimic_loss(kp_driving, kp_audio, weights["audio"])
        total = sum(metrics.values())
        new_stats = dict(batch_stats)
        new_stats["audio_feature"] = audio_updates["batch_stats"]

        if use_perceptual:
            # perceptual supervision on every 4th frame of the window
            # (ref:modules/model.py:231,253).  All supervised frames share
            # one source image, so the generator runs as ONE batched
            # apply: encode the source once, tile the 64^2 feature volume,
            # and decode the F frames as a [F*B] batch (frame-major: row
            # f*B+b).  Every loss below reduces with jnp.mean, so the
            # reduction keeps the reference's per-frame-average semantics
            # exactly; the only numerical difference is train-mode BN
            # normalizing over F*B rows instead of B per frame (same
            # documented deviation class as the folded-window BN stats,
            # PARITY.md "Known deviations") — in exchange XLA sees
            # F-times-larger matmuls and one BN-stat update.
            percep_frames = tuple(range(0, T, 4))
            F = len(percep_frames)
            kp_branch = kp_audio if gen_mode == "audio" else kp_driving
            kp_source = _apply_kp_detector(
                models["kp_detector"], params["kp_detector"],
                batch_stats["kp_detector"], batch["example_image"], train=True)

            # row f*B+b of the folded [B*T] arrays is sample b, frame f
            idx = (jnp.asarray(percep_frames)[:, None]
                   + jnp.arange(B)[None, :] * T).reshape(-1)
            kp_f = {k: v[idx] for k, v in kp_branch.items()
                    if k != "heatmap"}

            def tile_f(v):
                return jnp.tile(v, (F,) + (1,) * (v.ndim - 1))

            kp_s = {k: tile_f(v) for k, v in kp_source.items()
                    if k != "heatmap"}
            src = tile_f(batch["example_image"])

            gvars = {"params": params["generator"],
                     "batch_stats": batch_stats["generator"]}
            feats, enc_updates = models["generator"].apply(
                gvars, batch["example_image"], train=True,
                mutable=["batch_stats"], method="encode_source")
            generated, gen_updates = models["generator"].apply(
                {"params": params["generator"],
                 "batch_stats": enc_updates["batch_stats"]},
                src, tile_f(feats), kp_f, kp_s, train=True, want_aux=False,
                mutable=["batch_stats"], method="decode")
            gen_out = {"prediction": generated["prediction"][:B],
                       "kp_driving": {k: v[:B] for k, v in kp_f.items()}}

            vgg_apply = lambda x: models["vgg"].apply(
                {"params": params["vgg"]}, x)
            pyr_real = L.image_pyramid(driving[idx], scales)
            pyr_gen = L.image_pyramid(generated["prediction"], scales)
            metrics["perceptual"] = L.perceptual_loss(
                vgg_apply, pyr_real, pyr_gen, scales, perceptual_w)
            total = total + metrics["perceptual"]
            if use_gan:
                # LSGAN generator term + feature matching vs real
                # (ref:modules/model.py:505-524); discriminator params
                # are frozen inside the generator step
                disc_scales = tuple(models["discriminator"].scales)
                kp_det = {k: jax.lax.stop_gradient(v)
                          for k, v in kp_f.items()}
                dvars = {"params": params["discriminator"],
                         "batch_stats": batch_stats["discriminator"]}
                pyr_gen_d = {k: pyr_gen[k] for k in
                             (f"prediction_{s}" for s in disc_scales)}
                pyr_real_d = {k: pyr_real[k] for k in
                              (f"prediction_{s}" for s in disc_scales)}
                fake_out = models["discriminator"].apply(
                    dvars, pyr_gen_d, kp_det)
                metrics["gen_gan"] = L.lsgan_generator_loss(
                    fake_out, disc_scales, gan_w)
                metrics["feature_matching"] = 0.0
                if sum(fm_w) != 0:
                    real_out = models["discriminator"].apply(
                        dvars, pyr_real_d, kp_det)
                    metrics["feature_matching"] = L.feature_matching_loss(
                        real_out, fake_out, disc_scales, fm_w)
                total = total + metrics["gen_gan"] + metrics["feature_matching"]
            if "generator" in trainable:
                new_stats["generator"] = gen_updates["batch_stats"]

        return total, (metrics, new_stats, gen_out)

    return loss_fn


def _accum_grads(loss_fn, trainable, frozen, batch_stats, stacked_batch):
    """Gradient accumulation: scan K stacked micro-batches, mean the
    gradients, carry the BatchNorm statistics through (each micro-batch
    sees the previous one's running stats — the same semantics as K
    sequential forward passes).  Memory stays at one micro-batch's
    activations; only the gradient pytree (parameter-sized) accumulates.

    stacked_batch leaves: [K, B_micro, ...].  Returns (mean grads,
    final batch_stats, mean metrics)."""
    gfun = jax.grad(loss_fn, has_aux=True)
    zeros = jax.tree.map(jnp.zeros_like, trainable)

    def micro(carry, mb):
        stats, gsum = carry
        grads, aux = gfun(trainable, frozen, stats, decode_and_augment(mb))
        metrics, new_stats = aux[0], aux[1]
        return (new_stats, jax.tree.map(jnp.add, gsum, grads)), metrics

    (stats, gsum), ms = jax.lax.scan(micro, (batch_stats, zeros),
                                     stacked_batch)
    k = jax.tree.leaves(stacked_batch)[0].shape[0]
    grads = jax.tree.map(lambda g: g / k, gsum)
    return grads, stats, {name: v.mean(0) for name, v in ms.items()}


def make_part1_step(models: dict, train_params: dict,
                    optimizer) -> Callable:
    """Build the part1 / fine-tune step function.

    train_params keys used: loss_weights{audio, perceptual, generator_gan},
    generator ('not'|'visual'|'audio'), scales (ref:config/train_part1.yaml).
    With ``grad_accum: K`` > 1 the step takes a STACKED batch
    ([K, B_micro, ...], `stack_host_batches`) and applies one optimizer
    update from the mean of K micro-batch gradients — K× the effective
    batch at one micro-batch's activation memory.
    """
    loss_fn = _make_part1_loss(models, train_params)
    k_accum = max(1, int(train_params.get("grad_accum", 1)))

    def step(state: Part1State, batch: dict):
        if k_accum > 1:
            grads, new_stats, metrics = _accum_grads(
                loss_fn, state.trainable, state.frozen, state.batch_stats,
                batch)
        else:
            batch = decode_and_augment(batch)
            grads, (metrics, new_stats, _) = jax.grad(
                loss_fn, has_aux=True)(state.trainable, state.frozen,
                                       state.batch_stats, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        metrics = _metrics_f32(metrics)
        metrics["total"] = sum(v for k, v in metrics.items())
        return Part1State(trainable, state.frozen, new_stats, opt_state,
                          state.step + 1), metrics

    return step


class Part1GanState(NamedTuple):
    """Fine-tune state with an alternating LSGAN discriminator: the
    reference keeps separate generator-side and discriminator optimizers
    and steps both every iteration (ref:train.py:136-152,175-185)."""
    trainable: dict           # audio_feature, kp_detector_a, generator
    frozen: dict              # kp_detector, vgg
    batch_stats: dict         # incl. 'discriminator'
    opt_state: Any
    step: jnp.ndarray
    disc_params: dict
    disc_opt_state: Any


def init_part1_gan_state(rng, models: dict, batch: dict, optimizer,
                         disc_optimizer,
                         vgg_params: dict | None = None) -> Part1GanState:
    """Fine-tune state with trainable generator AND discriminator."""
    k1, k2 = jax.random.split(rng)
    batch = decode_and_augment(batch)
    disc_scales = tuple(models["discriminator"].scales)
    ex = batch["example_image"]
    pyr = L.image_pyramid(ex, disc_scales)
    num_kp = models["generator"].num_kp
    kp0 = {"value": jnp.zeros((ex.shape[0], num_kp, 2)),
           "jacobian": jnp.broadcast_to(jnp.eye(2),
                                        (ex.shape[0], num_kp, 2, 2))}
    disc_vars = models["discriminator"].init(
        k2, {f"prediction_{s}": pyr[f"prediction_{s}"] for s in disc_scales},
        kp0)
    base = init_part1_state(k1, models, batch, optimizer,
                            train_generator=True, vgg_params=vgg_params,
                            discriminator_vars=disc_vars)
    frozen = dict(base.frozen)
    disc_params = frozen.pop("discriminator")
    return Part1GanState(base.trainable, frozen, base.batch_stats,
                         base.opt_state, base.step, disc_params,
                         disc_optimizer.init(disc_params))


def make_part1_gan_step(models: dict, train_params: dict, optimizer,
                        disc_optimizer) -> Callable:
    """Fine-tune step with per-iteration generator/discriminator
    alternation (ref:train.py:175-185; ref:modules/model.py:557-591):
    the generator side sees the current discriminator frozen; the
    discriminator then trains on the freshly generated frame."""
    if int(train_params.get("grad_accum", 1)) > 1:
        raise ValueError(
            "grad_accum is not supported for GAN fine-tune: the alternating "
            "discriminator step consumes each micro-batch's generator "
            "output, so accumulation would change the adversarial game")
    loss_fn = _make_part1_loss(models, train_params)
    disc_step = make_discriminator_step(models, train_params, disc_optimizer)

    def step(state: Part1GanState, batch: dict):
        batch = decode_and_augment(batch)
        frozen = dict(state.frozen)
        frozen["discriminator"] = state.disc_params
        grads, (metrics, new_stats, gen_out) = jax.grad(
            loss_fn, has_aux=True)(state.trainable, frozen,
                                   state.batch_stats, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        metrics = _metrics_f32(metrics)
        metrics["total"] = sum(v for k, v in metrics.items())

        disc_params, disc_stats, disc_opt_state, dmetrics = disc_step(
            state.disc_params, new_stats["discriminator"],
            state.disc_opt_state, batch, gen_out)
        new_stats = dict(new_stats)
        new_stats["discriminator"] = disc_stats
        metrics.update(dmetrics)
        return Part1GanState(trainable, state.frozen, new_stats, opt_state,
                             state.step + 1, disc_params,
                             disc_opt_state), metrics

    return step


def make_discriminator_step(models: dict, train_params: dict,
                            optimizer) -> Callable:
    """LSGAN discriminator step (ref:modules/model.py:557-591,
    ref:train.py discriminator optimizer).  The shipped configs set
    ``discriminator_gan: 0`` so this is off by default, but the component
    is first-class for GAN fine-tuning.

    State: NamedTuple-free — ``(disc_params, disc_stats, opt_state)``.
    ``generated`` is a dict with 'prediction' and 'kp_driving'.
    """
    weights = train_params["loss_weights"]
    scales = tuple(models["discriminator"].scales)
    dt = _compute_dtype(train_params)

    def loss_fn(disc_params, disc_stats, batch, generated):
        disc_params = _cast_floating(disc_params, dt)
        batch = _cast_floating(batch, dt)
        generated = _cast_floating(generated, dt)
        pyr_real = L.image_pyramid(batch["driving"][:, 0], scales)
        pyr_fake = L.image_pyramid(
            jax.lax.stop_gradient(generated["prediction"]), scales)
        kp = {k: jax.lax.stop_gradient(v)
              for k, v in generated["kp_driving"].items() if k != "heatmap"}
        variables = {"params": disc_params, "batch_stats": disc_stats}
        real_out, upd = models["discriminator"].apply(
            variables, pyr_real, kp, update_stats=True,
            mutable=["batch_stats"])
        fake_out, _ = models["discriminator"].apply(
            variables, pyr_fake, kp, update_stats=False,
            mutable=["batch_stats"])
        loss = L.lsgan_discriminator_loss(real_out, fake_out, scales,
                                          weights["discriminator_gan"])
        return loss, upd["batch_stats"]

    def step(disc_params, disc_stats, opt_state, batch, generated):
        batch = decode_and_augment(batch)   # no-op for already-decoded
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(disc_params, disc_stats, batch, generated)
        updates, opt_state = optimizer.update(grads, opt_state, disc_params)
        disc_params = optax.apply_updates(disc_params, updates)
        return disc_params, new_stats, opt_state, _metrics_f32({"disc_gan": loss})

    return step


def equivariance_losses(models: dict, kp_params, kp_stats, frames,
                        kp_driving: dict, rng, transform_params: dict,
                        value_weight: float, jacobian_weight: float) -> dict:
    """Equivariance constraints under random affine+TPS warps
    (ref:modules/model.py:526-552).  The shipped configs zero these weights
    (config train_params.loss_weights), but the machinery is complete:
    warp the frames, detect keypoints on the warped frames, and require
    kp == warp(kp_warped) (value) and the chain-rule identity (jacobian).
    """
    from eamm_tpu.ops import tps as T

    B = frames.shape[0]
    params = T.sample_tps(rng, B, transform_params["sigma_affine"],
                          transform_params.get("sigma_tps", 0.0),
                          transform_params.get("points_tps", 5))
    warped = T.transform_frame(params, frames)
    kp_t = models["kp_detector"].apply(
        {"params": kp_params, "batch_stats": kp_stats}, warped, train=True)
    out = {}
    if value_weight:
        rewarped = T.warp_coordinates(params, kp_t["value"])
        out["equivariance_value"] = value_weight * jnp.mean(
            jnp.abs(kp_driving["value"] - rewarped))
    if jacobian_weight:
        from eamm_tpu.ops.motion import inv2x2
        jac_t = jnp.matmul(T.warp_jacobian(params, kp_t["value"]),
                           kp_t["jacobian"])
        value = jnp.matmul(inv2x2(kp_driving["jacobian"]), jac_t)
        eye = jnp.eye(2)
        out["equivariance_jacobian"] = jacobian_weight * jnp.mean(
            jnp.abs(eye - value))
    return out


_HEAD_BY_TYPE = {
    # train_params['type'] -> EmotionK head name (ref:modules/model.py:335-363)
    "linear_4": "linear",
    "linear_4_new": "linear_4",
    "linear_10": "linear_10",
    "linear_np_4": "linear_np_4",
    "linear_np_10": "linear_np_10",
    "map": "map",
    "map_4": "map_4",
}


def init_part2_state(rng, models: dict, batch: dict, optimizer,
                     part1_state: Part1State | None = None) -> Part2State:
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    batch = decode_and_augment(batch)
    ex = batch["example_image"]
    v_kp = models["kp_detector"].init(k1, ex, train=True)
    v_audio = models["audio_feature"].init(
        k2, ex, batch["driving_audio"], batch["driving_pose"], train=True)
    v_kpa = models["kp_detector_a"].init(k3, jnp.zeros((1, 64, 64, 35)),
                                         train=True)
    kp0 = jnp.zeros((1, 10, 2))
    jac0 = jnp.broadcast_to(jnp.eye(2), (1, 10, 2, 2))
    v_emo = models["emo_detector"].init(k4, ex[:1], kp0, jac0, head="all",
                                        train=True)

    trainable = {"emo_detector": v_emo["params"]}
    frozen = {"kp_detector": v_kp["params"],
              "audio_feature": v_audio["params"],
              "kp_detector_a": v_kpa["params"]}
    if part1_state is not None:
        frozen["kp_detector"] = part1_state.frozen["kp_detector"]
        frozen["audio_feature"] = part1_state.trainable["audio_feature"]
        frozen["kp_detector_a"] = part1_state.trainable["kp_detector_a"]
    batch_stats = {"kp_detector": v_kp["batch_stats"],
                   "audio_feature": v_audio["batch_stats"],
                   "emo_detector": v_emo["batch_stats"]}
    if part1_state is not None:
        batch_stats["kp_detector"] = part1_state.batch_stats["kp_detector"]
        batch_stats["audio_feature"] = part1_state.batch_stats["audio_feature"]
    return Part2State(trainable, frozen, batch_stats,
                      optimizer.init(trainable), jnp.zeros((), jnp.int32))


def make_part2_step(models: dict, train_params: dict, optimizer) -> Callable:
    """Part-2 step: emotion displacement training (ref:train.py:273-407)."""
    weights = train_params["loss_weights"]
    head = _HEAD_BY_TYPE[train_params.get("type", "linear_4")]
    ten_kp = "10" in train_params.get("type", "linear_4")
    classify = bool(train_params.get("classify", True))
    smooth = bool(train_params.get("smooth", False))
    dt = _compute_dtype(train_params)

    def loss_fn(trainable, frozen, batch_stats, batch):
        trainable = _cast_floating(trainable, dt)
        frozen = _cast_floating(frozen, dt)
        batch = _cast_floating(batch, dt)
        B, T = batch["driving"].shape[:2]
        driving = _fold(batch["driving"])
        transformed = _fold(batch["transformed_driving"])
        labels = jnp.repeat(batch["emotion"], T)

        kp_driving = _apply_kp_detector(
            models["kp_detector"], frozen["kp_detector"],
            batch_stats["kp_detector"], driving, train=True)
        deco = models["audio_feature"].apply(
            {"params": frozen["audio_feature"],
             "batch_stats": batch_stats["audio_feature"]},
            batch["example_image"], batch["driving_audio"],
            batch["driving_pose"], train=True)
        kp_audio = models["kp_detector_a"].apply(
            {"params": frozen["kp_detector_a"]}, _fold(deco), train=True)

        (kp_emo, logits), emo_updates = models["emo_detector"].apply(
            {"params": trainable["emo_detector"],
             "batch_stats": batch_stats["emo_detector"]},
            transformed, jax.lax.stop_gradient(kp_audio["value"]),
            jax.lax.stop_gradient(kp_audio["jacobian"]),
            head=head, train=True, mutable=["batch_stats"])

        metrics = L.emotion_residual_loss(
            kp_driving, kp_audio, kp_emo, logits, labels,
            weights["emo"], ten_kp, classify)
        total = metrics["loss_value"] + metrics["loss_jacobian"] \
            + metrics["loss_classify"]

        if smooth:
            # temporal second-difference smoothness of the composed
            # (audio + emotion) keypoints, neighbors detached
            # (ref:modules/model_gen.py:275-281)
            def compose(a, e, indices):
                out = a
                for j, i in enumerate(indices):
                    out = out.at[:, i].add(e[:, j])
                return out
            idx = L.EMO_KP_INDICES if not ten_kp else tuple(range(10))
            v_all = compose(kp_audio["value"], kp_emo["value"], idx) \
                .reshape(B, T, -1, 2).swapaxes(0, 1)
            j_all = compose(kp_audio["jacobian"], kp_emo["jacobian"], idx) \
                .reshape(B, T, -1, 2, 2).swapaxes(0, 1)

            def second_diff(x):
                sg = jax.lax.stop_gradient
                return jnp.mean(jnp.abs(x[2:] + sg(x[:-2]) - 2 * sg(x[1:-1])))
            metrics["loss_smooth"] = (second_diff(v_all) + second_diff(j_all)) \
                * weights["emo"] * 100.0 / T
            total = total + metrics["loss_smooth"]
        new_stats = dict(batch_stats)
        new_stats["emo_detector"] = emo_updates["batch_stats"]
        return total, (metrics, new_stats)

    k_accum = max(1, int(train_params.get("grad_accum", 1)))

    def step(state: Part2State, batch: dict):
        if k_accum > 1:
            grads, new_stats, metrics = _accum_grads(
                loss_fn, state.trainable, state.frozen, state.batch_stats,
                batch)
        else:
            batch = decode_and_augment(batch)
            grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
                state.trainable, state.frozen, state.batch_stats, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        metrics = _metrics_f32(metrics)
        metrics["total"] = sum(metrics.values())
        return Part2State(trainable, state.frozen, new_stats, opt_state,
                          state.step + 1), metrics

    return step


# --------------------------------------------------------- multi-step scan

def make_multi_step(step_fn: Callable) -> Callable:
    """Wrap a ``(state, batch) -> (state, metrics)`` step into a
    ``(state, stacked_batches) -> (state, stacked_metrics)`` program that
    runs K optimizer steps in ONE device dispatch via ``lax.scan``.

    The reference (and the naive loop here) pays one host->device dispatch
    round trip per optimizer step; on a remote-dispatch runtime that
    overhead is comparable to the step compute itself (part1: 16.4 ms
    device-busy vs 23.2 ms wall, BASELINE.md).  Scanning K steps per
    dispatch amortizes it K-fold.  Works for every step family (part1,
    GAN fine-tune, part2) because the steps are pure state transitions.

    ``stacked_batches``: the K host batches stacked on a new leading axis
    (``stack_host_batches``), sharded with batch axis 1 on the mesh
    (``shard_stacked_batch``).  Returned metrics leaves have shape [K].
    """

    def multi(state, stacked_batches):
        return jax.lax.scan(step_fn, state, stacked_batches)

    return multi


def stack_host_batches(batches: list) -> dict:
    """Stack K same-shaped host batches -> one [K, ...] pytree."""
    import numpy as np
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def split_stacked_metrics(metrics, k: int) -> list:
    """Stacked [K] metric leaves -> K per-step metric dicts."""
    return [{name: v[i] for name, v in metrics.items()} for i in range(k)]
