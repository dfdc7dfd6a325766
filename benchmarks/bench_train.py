"""Training-step throughput on the real chip: part1 / fine-tune / part2 at
full config with synthetic LRW/MEAD-shaped batches.  Prints one JSON line
per stage.  Select stages with EAMM_BENCH_STAGES=part1,fine_tune,part2
(default: all three — fine-tune is the heaviest: generator training +
VGG perceptual + GAN alternation, ref:train.py:133-270) and the training
compute dtype with EAMM_TRAIN_DTYPE=float32|bfloat16 (mixed precision:
master params/opt state/BN stats stay f32)."""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _models(max_features=1024):
    from eamm_tpu.models import (KPDetector, KPDetectorA, ATNet,
                                 OcclusionAwareGenerator, EmotionK,
                                 MultiScaleDiscriminator)
    from eamm_tpu.models.vgg import Vgg19
    return {
        "kp_detector": KPDetector(num_kp=10, block_expansion=32,
                                  max_features=max_features, num_blocks=5),
        "kp_detector_a": KPDetectorA(num_kp=10),
        "audio_feature": ATNet(),
        "generator": OcclusionAwareGenerator(
            num_down_blocks=2, num_bottleneck_blocks=6, max_features=512,
            dense_motion_params=dict(block_expansion=64,
                                     max_features=max_features,
                                     num_blocks=5, scale_factor=0.25)),
        "emo_detector": EmotionK(block_expansion=32, max_features=1024,
                                 num_blocks=5),
        "discriminator": MultiScaleDiscriminator(
            scales=(1,), block_expansion=32, max_features=512, num_blocks=4,
            sn=True),
        "vgg": Vgg19(),
    }


def _batch(rng, B, T=16, mead=False):
    import jax.numpy as jnp
    batch = {
        "example_image": jnp.asarray(rng.rand(B, 256, 256, 3), jnp.float32),
        "driving": jnp.asarray(rng.rand(B, T, 256, 256, 3), jnp.float32),
        "driving_audio": jnp.asarray(rng.randn(B, T, 28, 12), jnp.float32),
        "driving_pose": jnp.asarray(rng.randn(B, T, 6), jnp.float32),
    }
    if mead:
        batch["transformed_driving"] = jnp.asarray(
            rng.rand(B, T, 256, 256, 3), jnp.float32)
        batch["emotion"] = jnp.asarray(rng.randint(0, 8, (B,)), jnp.int32)
    return batch


def _train_dtype():
    return os.environ.get("EAMM_TRAIN_DTYPE", "float32")


def _perturb(batch):
    # fresh input each step: the remote runtime memoizes identical dispatches
    batch = dict(batch)
    batch["driving_audio"] = batch["driving_audio"] + 1e-6
    return batch


def _run(name, step_raw, state, batch, steps):
    import jax
    from eamm_tpu.utils import StepTimer
    step = jax.jit(step_raw, donate_argnums=0)
    t0 = time.time()
    # compile + warm-up (blocked)
    batch = _perturb(batch)
    state, m = step(state, batch)
    first_loss = float(m["total"])
    compile_sec = time.time() - t0

    # Blocked latency: read the loss back every step — each step pays the
    # full host<->device round trip (the reference's convention: the torch
    # loop reads loss.item() per step, ref:train.py:81-86).
    timer = StepTimer(warmup=0)
    loss = first_loss
    timer.tick()
    for _ in range(steps):
        batch = _perturb(batch)
        state, m = step(state, batch)
        loss = float(m["total"])
        timer.tick()
    blocked = timer.summary()

    # Pipelined throughput: issue all steps back-to-back and block once at
    # the end — the device queue is in-order, so the final readback fences
    # every step.  This is what a real training loop with async logging
    # sees; on this rig it strips the ~40 ms/step tunnel round trip that the
    # blocked number pays (device-busy time for part1 bf16 is ~16 ms/step
    # per the profiler trace).
    t1 = time.time()
    metrics = None
    for _ in range(steps):
        batch = _perturb(batch)
        state, metrics = step(state, batch)
    final_loss = float(metrics["total"])  # fences the whole pipeline
    pipelined_ms = (time.time() - t1) / steps * 1e3

    # Multi-step dispatch (train_params.steps_per_dispatch): K optimizer
    # steps scanned inside one device program — amortizes the per-dispatch
    # round trip that separates the pipelined wall time from device-busy
    # time.  Opt-in: EAMM_STEPS_PER_DISPATCH=K.
    extra = {}
    spd = int(os.environ.get("EAMM_STEPS_PER_DISPATCH", "0"))
    if spd > 1:
        import jax.numpy as jnp
        from eamm_tpu.train.steps import make_multi_step
        multi = jax.jit(make_multi_step(step_raw), donate_argnums=0)

        def stacked_batches(b):
            group = []
            for _ in range(spd):
                b = _perturb(b)
                group.append(b)
            return {k: jnp.stack([g[k] for g in group]) for k in group[0]}, b

        stacked, batch = stacked_batches(batch)
        state, sm = multi(state, stacked)        # compile + warm-up
        float(sm["total"][-1])
        n_disp = max(2, steps // spd + 1)
        t2 = time.time()
        for _ in range(n_disp):
            stacked, batch = stacked_batches(batch)
            state, sm = multi(state, stacked)
        float(sm["total"][-1])
        multi_ms = (time.time() - t2) / (n_disp * spd) * 1e3
        extra = {"steps_per_dispatch": spd,
                 "multi_ms_per_step": round(multi_ms, 1),
                 "multi_steps_per_sec": round(1e3 / multi_ms, 2)}

    print(json.dumps({
        "metric": f"{name}_steps_per_sec",
        "compute_dtype": _train_dtype(),
        "batch_size": int(batch["driving"].shape[0]),
        "steps": steps,
        "steps_per_sec": round(1e3 / pipelined_ms, 2),
        "ms_per_step": round(pipelined_ms, 1),
        "blocked_ms_per_step": round(blocked["mean_ms"], 1),
        "blocked_steps_per_sec": round(blocked["steps_per_sec"], 2),
        "total_incl_compile_sec": round(time.time() - t0, 1),
        "compile_sec": round(compile_sec, 1),
        "final_loss": final_loss,
        **extra,
    }))


def bench_part1(steps=6, batch_size=8):
    """Stage 1 (ref:train.py:18-130): kp-mimic only, bs 8."""
    import jax
    from eamm_tpu.train import (make_optimizer, make_part1_step,
                                init_part1_state)
    models = _models()
    tp = {"loss_weights": {"audio": 10, "perceptual": [0] * 5,
                           "generator_gan": 0},
          "generator": "not", "scales": [1],
          "compute_dtype": _train_dtype()}
    batch = _batch(np.random.RandomState(0), batch_size)
    opt = make_optimizer()
    state = init_part1_state(jax.random.PRNGKey(0), models, batch, opt)
    _run("train_part1", make_part1_step(models, tp, opt), state, batch,
         steps)


def bench_fine_tune(steps=6, batch_size=6):
    """Stage 1.5 (ref:train.py:133-270): trainable generator + VGG
    perceptual on every 4th frame + LSGAN alternation — the heaviest step."""
    import jax
    import jax.numpy as jnp
    from eamm_tpu.train import (make_optimizer, make_part1_gan_step,
                                init_part1_gan_state)
    models = _models()
    tp = {"loss_weights": {"audio": 10,
                           "perceptual": [0.1, 0.1, 0.1, 0.1, 0.1],
                           "generator_gan": 1.0, "discriminator_gan": 1.0,
                           "feature_matching": [10, 10, 10, 10]},
          "generator": "audio", "scales": [1],
          "compute_dtype": _train_dtype()}
    batch = _batch(np.random.RandomState(1), batch_size)
    g_opt, d_opt = make_optimizer(), make_optimizer()
    rng = jax.random.PRNGKey(1)
    vgg_params = models["vgg"].init(rng, jnp.zeros((1, 64, 64, 3)))["params"]
    state = init_part1_gan_state(rng, models, batch, g_opt, d_opt,
                                 vgg_params=vgg_params)
    _run("train_part1_fine_tune", make_part1_gan_step(models, tp, g_opt,
                                                      d_opt),
         state, batch, steps)


def bench_part2(steps=6, batch_size=16):
    """Stage 2 (ref:train.py:273-407): emotion displacement training, bs 16."""
    import jax
    from eamm_tpu.train import (make_optimizer, make_part2_step,
                                init_part2_state)
    models = _models()
    tp = {"loss_weights": {"audio": 10, "emo": 10, "perceptual": [0] * 5,
                           "generator_gan": 0},
          "generator": "not", "scales": [1], "type": "linear_4",
          "classify": True, "compute_dtype": _train_dtype()}
    batch = _batch(np.random.RandomState(2), batch_size, mead=True)
    opt = make_optimizer()
    state = init_part2_state(jax.random.PRNGKey(2), models, batch, opt)
    _run("train_part2", make_part2_step(models, tp, opt), state, batch,
         steps)


def main():
    from eamm_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    stages = os.environ.get("EAMM_BENCH_STAGES",
                            "part1,fine_tune,part2").split(",")
    if "part1" in stages:
        bench_part1()
    if "fine_tune" in stages:
        bench_fine_tune()
    if "part2" in stages:
        bench_part2()


if __name__ == "__main__":
    main()
