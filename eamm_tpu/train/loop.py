"""Training orchestration: the three reference stages end-to-end.

Mirrors ref:train.py (train_part1 :18-130, train_part1_fine_tune :133-270,
train_part2 :273-407): dataset -> repeater -> loader -> per-step optimize ->
periodic checkpoint + visualization + eval-loss loop, with the batch sharded
over the device mesh.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from eamm_tpu import config as cfg
from eamm_tpu.data import (AudioDataset, VoxDataset, MeadDataset,
                           DatasetRepeater, DataLoader)
from eamm_tpu.parallel import (make_mesh_for_batch, shard_batch,
                               shard_stacked_batch, replicated)
from eamm_tpu.train.checkpoint import CheckpointManager
from eamm_tpu.train.logging import MetricsLogger
from eamm_tpu.train.optim import make_optimizer
from eamm_tpu.train import steps as S
from eamm_tpu.train.visualizer import Visualizer

DATASETS = {"LRW": AudioDataset, "Vox": VoxDataset, "MEAD": MeadDataset}


def build_dataset(config: dict, is_train: bool = True):
    dp = dict(config["dataset_params"])
    name = dp.pop("name", "LRW")
    dataset_cls = DATASETS.get(name, AudioDataset)
    return dataset_cls(root_dir=dp.pop("root_dir"),
                       frame_shape=tuple(dp.pop("frame_shape", (256, 256, 3))),
                       id_sampling=dp.pop("id_sampling", False),
                       is_train=is_train,
                       augmentation_params=dp.pop("augmentation_params", {}),
                       **{k: v for k, v in dp.items()
                          if k in ("video_list", "neutral_dict",
                                   "device_augmentation")})


def _example_batch_spec(batch):
    return {k: jnp.asarray(v[:1]) for k, v in batch.items()}


def load_frozen_torch(state, mode: str, fomm_checkpoint: str | None = None,
                      audio_checkpoint: str | None = None):
    """Initialize frozen/pretrained modules from the reference's torch
    checkpoints: part1 freezes the FOMM generator+kp_detector
    (ref:train.py:24-28); part2 additionally loads the trained
    audio_feature+kp_detector_a (ref:train.py:283-308)."""
    from eamm_tpu import compat
    if fomm_checkpoint:
        fomm = compat.load_torch_checkpoint(fomm_checkpoint)
        kp = compat.convert_kp_detector(fomm["kp_detector"])
        gen = compat.convert_generator(fomm["generator"])
        state.frozen["kp_detector"] = kp["params"]
        state.batch_stats["kp_detector"] = kp["batch_stats"]
        target = state.trainable if "generator" in state.trainable \
            else state.frozen
        target["generator"] = gen["params"]
        state.batch_stats["generator"] = gen["batch_stats"]
        if hasattr(state, "disc_params") and "discriminator" in fomm:
            # GAN fine-tune resumes the discriminator from the FOMM
            # checkpoint when present (ref:logger.py:60-73)
            disc = compat.convert_discriminator(fomm["discriminator"])
            state = state._replace(disc_params=disc["params"])
            state.batch_stats["discriminator"] = disc.get(
                "batch_stats", state.batch_stats.get("discriminator", {}))
    if audio_checkpoint:
        audio = compat.load_torch_checkpoint(audio_checkpoint)
        at = compat.convert_atnet(audio["audio_feature"])
        kpa = compat.convert_kp_detector_a(audio["kp_detector_a"])
        target = state.trainable if "audio_feature" in state.trainable \
            else state.frozen
        target["audio_feature"] = at["params"]
        state.batch_stats["audio_feature"] = at["batch_stats"]
        target2 = state.trainable if "kp_detector_a" in state.trainable \
            else state.frozen
        target2["kp_detector_a"] = kpa["params"]
    return state


def train(config: dict, mode: str, log_dir: str, checkpoint: str | None = None,
          max_steps: int | None = None, mesh=None, seed: int = 0,
          vgg_params=None, fomm_checkpoint: str | None = None,
          audio_checkpoint: str | None = None):
    """mode: 'train_part1' | 'train_part1_fine_tune' | 'train_part2'
    (ref:run.py:28-40)."""
    tp = config["train_params"]
    models = cfg.build_all(config, emotion_kind=tp.get("type", "linear")
                           .split("_")[0] if mode == "train_part2" else "linear")
    models["vgg"] = None
    if mode == "train_part1_fine_tune":
        from eamm_tpu.models.vgg import Vgg19
        models["vgg"] = Vgg19()

    dataset = build_dataset(config, is_train=True)
    repeated = DatasetRepeater(dataset, tp.get("num_repeats", 1))
    # multi-host DP: every host runs the identical shuffle (same seed) and
    # serves a disjoint slice of the batch stream; batch_size is per-host
    shard = ((jax.process_index(), jax.process_count())
             if jax.process_count() > 1 else None)
    loader = DataLoader(repeated, batch_size=tp["batch_size"], seed=seed,
                        shard=shard)
    # optimizer steps per epoch: with grad_accum K, K loader micro-batches
    # make ONE optimizer step (the lr schedule counts optimizer steps)
    k_accum = max(1, int(tp.get("grad_accum", 1)))
    steps_per_epoch = max(1, len(loader) // k_accum)

    sched = dict(milestones_epochs=tp.get("epoch_milestones", (60, 90)),
                 steps_per_epoch=steps_per_epoch)
    lr_audio = float(tp.get("lr_audio_feature", 2e-4))
    if mode == "train_part1_fine_tune":
        # separate generator / audio optimizers+schedulers, as the
        # reference fine-tune keeps (ref:train.py:136-163)
        from eamm_tpu.train.optim import make_module_optimizer
        optimizer = make_module_optimizer(
            {"generator": float(tp.get("lr_generator", 2e-4)),
             "audio_feature": lr_audio, "kp_detector_a": lr_audio},
            default_lr=lr_audio, **sched)
    else:
        optimizer = make_optimizer(lr=lr_audio, **sched)

    mesh = mesh or make_mesh_for_batch(tp["batch_size"])
    logger = MetricsLogger(log_dir)
    ckpt = CheckpointManager(os.path.join(log_dir, "checkpoints"))
    viz_params = {k: v for k, v in
                  config.get("visualizer_params", {}).items()
                  if k in ("kp_size", "draw_border", "colormap")}
    visualizer = Visualizer(**viz_params)

    def save_visualization(state, batch_host, step_num):
        """Checkpoint-time diagnostic grid (ref:logger.py:107-222): run the
        generator on the first sample and save the panel image."""
        try:
            params = {**state.frozen, **state.trainable}
            if "generator" not in params or "kp_detector" not in params:
                return
            def as_f32(x):          # device-augmentation batches are uint8
                x = np.asarray(x)
                return x.astype(np.float32) / 255.0 \
                    if x.dtype == np.uint8 else x
            src = jnp.asarray(as_f32(batch_host["example_image"][:1]))
            drv = jnp.asarray(as_f32(batch_host["driving"][:1, 0]))
            kp_s = models["kp_detector"].apply(
                {"params": params["kp_detector"],
                 "batch_stats": state.batch_stats["kp_detector"]},
                src, train=True)
            kp_d = models["kp_detector"].apply(
                {"params": params["kp_detector"],
                 "batch_stats": state.batch_stats["kp_detector"]},
                drv, train=True)
            kp_s = {k: v for k, v in kp_s.items() if k != "heatmap"}
            kp_d = {k: v for k, v in kp_d.items() if k != "heatmap"}
            out = models["generator"].apply(
                {"params": params["generator"],
                 "batch_stats": state.batch_stats["generator"]},
                src, kp_d, kp_s, train=True)
            out.update({"kp_source": kp_s, "kp_driving": kp_d})
            out = jax.tree.map(np.asarray, out)
            visualizer.save(os.path.join(log_dir,
                                         f"{step_num:08d}-viz.png"),
                            np.asarray(drv), np.asarray(src), out)
        except Exception as e:            # viz must never kill training
            print(f"visualization failed: {e}")

    first_batch = next(iter(loader))
    example = _example_batch_spec(first_batch)
    rng = jax.random.PRNGKey(seed)

    # GAN fine-tuning: the reference builds a discriminator optimizer and
    # steps it every iteration during fine-tune (ref:train.py:136-152,
    # 175-185); engaged when both GAN loss weights are nonzero.
    weights = tp.get("loss_weights", {})
    use_gan = (mode == "train_part1_fine_tune"
               and weights.get("discriminator_gan", 0) != 0
               and weights.get("generator_gan", 0) != 0)

    if mode in ("train_part1", "train_part1_fine_tune"):
        if models["vgg"] is not None and vgg_params is None:
            # random VGG features still provide a structural perceptual
            # signal, but reference-parity fine-tune quality needs the
            # pretrained weights (--vgg_checkpoint -> compat.convert_vgg19)
            import warnings
            warnings.warn(
                "fine-tune perceptual loss is using RANDOM VGG19 features; "
                "pass --vgg_checkpoint (torchvision vgg19 state_dict) for "
                "reference-parity quality (ref:modules/model.py:10-24)")
            vgg_params = models["vgg"].init(
                rng, jnp.zeros((1, 64, 64, 3)))["params"]
        if use_gan:
            disc_optimizer = make_optimizer(
                lr=float(tp.get("lr_discriminator",
                                tp.get("lr_audio_feature", 2e-4))),
                milestones_epochs=tp.get("epoch_milestones", (60, 90)),
                steps_per_epoch=steps_per_epoch)
            state = S.init_part1_gan_state(rng, models, example, optimizer,
                                           disc_optimizer,
                                           vgg_params=vgg_params)
            step_fn = S.make_part1_gan_step(models, tp, optimizer,
                                            disc_optimizer)
        else:
            state = S.init_part1_state(
                rng, models, example, optimizer,
                train_generator=(mode == "train_part1_fine_tune"),
                vgg_params=vgg_params)
            step_fn = S.make_part1_step(models, tp, optimizer)
    elif mode == "train_part2":
        state = S.init_part2_state(rng, models, example, optimizer)
        step_fn = S.make_part2_step(models, tp, optimizer)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    if fomm_checkpoint or audio_checkpoint:
        state = load_frozen_torch(state, mode, fomm_checkpoint,
                                  audio_checkpoint)

    if checkpoint:
        restored = ckpt.restore(like=state) if checkpoint == "latest" else None
        if restored is not None:
            state = type(state)(**restored)

    # Per-epoch held-out evaluation (ref:train.py:116-129): same loss, no
    # update — run the step on eval batches and discard the returned state.
    eval_loader = None
    try:
        eval_dataset = build_dataset(config, is_train=False)
        if len(eval_dataset) > 0:
            eval_loader = DataLoader(eval_dataset,
                                     batch_size=tp["batch_size"],
                                     shuffle=False, seed=seed, shard=shard)
    except (FileNotFoundError, OSError):
        pass
    # Gradient accumulation (train_params.grad_accum): each optimizer step
    # consumes K loader micro-batches stacked on a leading axis and applies
    # one update from their mean gradient — K× the effective batch at one
    # micro-batch's activation memory (the fine-tune step is HBM-bound).
    if k_accum > 1 and int(tp.get("steps_per_dispatch", 1)) > 1:
        raise ValueError("grad_accum and steps_per_dispatch cannot be "
                         "combined (pick one dispatch-amortization axis)")
    if k_accum > 1:
        # the eval loop runs on plain (unstacked) batches
        eval_params = dict(tp, grad_accum=1)
        make = S.make_part2_step if mode == "train_part2" \
            else S.make_part1_step
        eval_step = jax.jit(make(models, eval_params, optimizer))
    else:
        eval_step = jax.jit(step_fn)
    # Multi-step dispatch: scan K optimizer steps inside ONE device program
    # (train_params.steps_per_dispatch) — each host->device dispatch round
    # trip otherwise costs as much as a small step's compute (part1:
    # 16.4 ms device-busy vs 23.2 ms wall, BASELINE.md).
    spd = max(1, int(tp.get("steps_per_dispatch", 1)))
    multi_fn = (jax.jit(S.make_multi_step(step_fn), donate_argnums=0)
                if spd > 1 else None)
    step_fn = jax.jit(step_fn, donate_argnums=0)
    checkpoint_freq = tp.get("checkpoint_freq", 1)
    save_every_steps = {"train_part1": 500, "train_part1_fine_tune": 500,
                        "train_part2": 1000}[mode]   # ref:train.py:107,243,377

    num_epochs = tp.get("num_epochs", 300)
    # Reading a metric back to the host every step serializes the pipeline:
    # each readback pays the full dispatch round trip, which on a remote
    # chip costs more than the step's compute (measured: part1 bf16 is
    # 23 ms/step pipelined vs 84 ms/step when the loss is read every step).
    # Buffer the device-scalar metrics and flush every `log_every` steps.
    log_every = max(1, int(tp.get("log_every", 10)))
    start_step = int(state.step)
    total = 0
    pending: list[tuple[int, dict]] = []

    def flush_metrics():
        # one batched device->host fetch for the whole buffer (per-scalar
        # float() reads would pay a round trip each)
        for step_num, m in jax.device_get(pending):
            m = {k: float(v) for k, v in m.items()}
            logger.log_iter(m)
            logger.write_scalars(step_num, m)
        pending.clear()

    # Preemption-signal emergency checkpoint: the reference has an
    # `emergent` save path that nothing ever calls (ref:logger.py:44-50,
    # SURVEY.md §5 failure detection); here SIGTERM/SIGINT request a final
    # checkpoint + clean return at the next step boundary.
    import signal
    preempted = {"sig": None}
    prev_handlers = {}

    def _on_signal(signum, frame):
        preempted["sig"] = signum

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:      # not in the main thread (tests)
            pass

    try:
        import itertools
        with mesh:
            state = jax.device_put(state, replicated(mesh))
            for epoch in range(num_epochs):
                batch_iter = iter(loader)
                if k_accum > 1:
                    def accum_iter(it, k=k_accum):
                        while True:
                            g = list(itertools.islice(it, k))
                            if len(g) < k:      # drop the short tail: a
                                return          # partial mean would change
                            yield S.stack_host_batches(g)   # the step size
                    batch_iter = accum_iter(batch_iter)
                while True:
                    take = spd
                    if max_steps is not None:
                        take = min(take, max_steps - total)
                    group = list(itertools.islice(batch_iter, max(1, take)))
                    if not group:
                        break
                    if len(group) == spd and spd > 1:
                        stacked = S.stack_host_batches(group)
                        state, sm = multi_fn(
                            state, shard_stacked_batch(stacked, mesh))
                        metrics_list = S.split_stacked_metrics(sm, spd)
                    else:
                        # short tail (epoch end / max_steps) runs through the
                        # single-step program — no extra scan-length compiles
                        metrics_list = []
                        for b in group:
                            sharded = (shard_stacked_batch(b, mesh)
                                       if k_accum > 1
                                       else shard_batch(b, mesh))
                            state, m = step_fn(state, sharded)
                            metrics_list.append(m)
                    batch_host = group[-1]
                    if k_accum > 1:     # viz/eval shapes want one micro-batch
                        batch_host = {k: v[0] for k, v in batch_host.items()}
                    prev_total = total
                    total += len(group)
                    step_num = start_step + total
                    for j, m in enumerate(metrics_list):
                        pending.append((start_step + prev_total + 1 + j, m))

                    def crossed(every: int) -> bool:
                        return (total // every) > (prev_total // every)

                    if crossed(log_every):
                        flush_metrics()
                    if crossed(save_every_steps) and epoch % checkpoint_freq == 0:
                        flush_metrics()
                        # non-blocking: the loop pays only the state fetch;
                        # orbax writes on its background thread
                        ckpt.save(step_num, state, blocking=False)
                        save_visualization(state, batch_host, step_num)
                    stop = (max_steps is not None and total >= max_steps)
                    if preempted["sig"] is not None:
                        print(f"signal {preempted['sig']}: emergency "
                              f"checkpoint at step {step_num}", flush=True)
                        stop = True
                    if stop:
                        flush_metrics()
                        logger.log_epoch(epoch)
                        ckpt.save(step_num, state)
                        save_visualization(state, batch_host, step_num)
                        return state
                flush_metrics()
                logger.log_epoch(epoch)
                if eval_loader is not None:
                    eval_metrics = []
                    for batch_host in eval_loader:
                        batch = shard_batch(batch_host, mesh)
                        _, m = eval_step(state, batch)
                        eval_metrics.append(
                            {k: float(v) for k, v in m.items()})
                    if eval_metrics:
                        mean = {k: float(np.mean([m[k] for m in eval_metrics]))
                                for k in eval_metrics[0]}
                        logger.write_scalars(start_step + total, mean,
                                             prefix="eval")
        flush_metrics()
        ckpt.save(start_step + total, state)
        return state
    finally:
        for sig, handler in prev_handlers.items():
            signal.signal(sig, handler)
