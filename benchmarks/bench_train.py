"""Training-step throughput on the real chip: part1, full config, synthetic
LRW-shaped batch.  Prints one JSON line {steps_per_sec, sec_per_step}."""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch_size=8, steps=6, max_features=1024):
    import jax
    cache = os.path.expanduser("~/.cache/eamm_jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from eamm_tpu.models import (KPDetector, KPDetectorA, ATNet,
                                 OcclusionAwareGenerator)
    from eamm_tpu.train import (make_optimizer, make_part1_step,
                                init_part1_state)
    from eamm_tpu.utils import StepTimer

    models = {
        "kp_detector": KPDetector(num_kp=10, block_expansion=32,
                                  max_features=max_features, num_blocks=5),
        "kp_detector_a": KPDetectorA(num_kp=10),
        "audio_feature": ATNet(),
        "generator": OcclusionAwareGenerator(
            num_down_blocks=2, num_bottleneck_blocks=6, max_features=512,
            dense_motion_params=dict(block_expansion=64,
                                     max_features=max_features,
                                     num_blocks=5, scale_factor=0.25)),
    }
    tp = {"loss_weights": {"audio": 10, "perceptual": [0] * 5,
                           "generator_gan": 0},
          "generator": "not", "scales": [1]}
    rng = np.random.RandomState(0)
    B, T = batch_size, 16
    batch = {
        "example_image": jnp.asarray(rng.rand(B, 256, 256, 3), jnp.float32),
        "driving": jnp.asarray(rng.rand(B, T, 256, 256, 3), jnp.float32),
        "driving_audio": jnp.asarray(rng.randn(B, T, 28, 12), jnp.float32),
        "driving_pose": jnp.asarray(rng.randn(B, T, 6), jnp.float32),
    }
    opt = make_optimizer()
    t0 = time.time()
    state = init_part1_state(jax.random.PRNGKey(0), models, batch, opt)
    step = jax.jit(make_part1_step(models, tp, opt), donate_argnums=0)
    timer = StepTimer(warmup=1)
    losses = []
    for i in range(steps):
        batch["driving_audio"] = batch["driving_audio"] + 1e-6
        state, m = step(state, batch)
        losses.append(float(m["total"]))
        timer.tick()
    print(json.dumps({
        "metric": "train_part1_steps_per_sec",
        "batch_size": B,
        **timer.summary(),
        "total_incl_compile_sec": round(time.time() - t0, 1),
        "final_loss": losses[-1],
    }))


if __name__ == "__main__":
    main()
