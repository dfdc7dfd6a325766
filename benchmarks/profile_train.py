"""Device-op attribution for a training step (default: fine-tune, the
heaviest — ref:train.py:133-270).

Captures a ``jax.profiler`` trace of a few already-compiled steps, then
parses the trace.json.gz and aggregates per-op device durations so
optimization targets the measured hot ops.  Prints one JSON line with the
top ops plus a human table on stderr.

Usage:  python benchmarks/profile_train.py [--stage fine_tune|part1|part2]
                                           [--steps 3] [--top 25]
                                           [--dump_hlo PATH]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(stage):
    import jax
    import jax.numpy as jnp
    import bench_train as bt
    from eamm_tpu.train import (make_optimizer, make_part1_step,
                                make_part1_gan_step, make_part2_step,
                                init_part1_state, init_part1_gan_state,
                                init_part2_state)
    models = bt._models()
    dtype = bt._train_dtype()
    if stage == "part1":
        tp = {"loss_weights": {"audio": 10, "perceptual": [0] * 5,
                               "generator_gan": 0},
              "generator": "not", "scales": [1], "compute_dtype": dtype}
        batch = bt._batch(np.random.RandomState(0), 8)
        opt = make_optimizer()
        state = init_part1_state(jax.random.PRNGKey(0), models, batch, opt)
        step = jax.jit(make_part1_step(models, tp, opt), donate_argnums=0)
    elif stage == "fine_tune":
        tp = {"loss_weights": {"audio": 10,
                               "perceptual": [0.1] * 5,
                               "generator_gan": 1.0,
                               "discriminator_gan": 1.0,
                               "feature_matching": [10] * 4},
              "generator": "audio", "scales": [1], "compute_dtype": dtype}
        batch = bt._batch(np.random.RandomState(1), 6)
        g_opt, d_opt = make_optimizer(), make_optimizer()
        rng = jax.random.PRNGKey(1)
        vgg_params = models["vgg"].init(
            rng, jnp.zeros((1, 64, 64, 3)))["params"]
        state = init_part1_gan_state(rng, models, batch, g_opt, d_opt,
                                     vgg_params=vgg_params)
        step = jax.jit(make_part1_gan_step(models, tp, g_opt, d_opt),
                       donate_argnums=0)
    elif stage == "part2":
        tp = {"loss_weights": {"audio": 10, "emo": 10,
                               "perceptual": [0] * 5, "generator_gan": 0},
              "generator": "not", "scales": [1], "type": "linear_4",
              "classify": True, "compute_dtype": dtype}
        batch = bt._batch(np.random.RandomState(2), 16, mead=True)
        opt = make_optimizer()
        state = init_part2_state(jax.random.PRNGKey(2), models, batch, opt)
        step = jax.jit(make_part2_step(models, tp, opt), donate_argnums=0)
    else:
        raise SystemExit(f"unknown stage {stage}")
    return step, state, batch, bt._perturb


def _device_op_durations(trace_dir):
    """Aggregate device-lane event durations by op name from the newest
    trace.json.gz under ``trace_dir``."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # pid/tid metadata: device lanes are named like "/device:TPU:0" or
    # contain "XLA Op" / "Steps"; host python threads we skip.
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, n in names.items()
                   if "TPU" in n or "device" in n.lower()}
    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # microseconds
        agg[name] += dur
        total += dur
    return agg, total, paths[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="fine_tune")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace_dir", default="/tmp/eamm_train_trace")
    ap.add_argument("--dump_hlo", default=None,
                    help="also write the step's compiled HLO text here "
                         "(maps fusion.N names to source ops)")
    args = ap.parse_args()

    import jax
    from eamm_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    step, state, batch, perturb = _build(args.stage)

    if args.dump_hlo:
        lowered = step.lower(state, batch)
        with open(args.dump_hlo, "w") as f:
            f.write(lowered.compile().as_text())
        print(f"# HLO -> {args.dump_hlo}", file=sys.stderr)

    # compile + warm
    batch = perturb(batch)
    state, m = step(state, batch)
    float(m["total"])

    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        batch = perturb(batch)
        state, m = step(state, batch)
    float(m["total"])  # fence
    jax.profiler.stop_trace()

    agg, total, path = _device_op_durations(args.trace_dir)
    per_step_ms = total / 1e3 / args.steps
    rows = agg.most_common(args.top)
    print(f"# trace: {path}", file=sys.stderr)
    print(f"# device-busy: {per_step_ms:.1f} ms/step over {args.steps} steps",
          file=sys.stderr)
    for name, dur in rows:
        print(f"{dur / 1e3 / args.steps:9.2f} ms  {100 * dur / total:5.1f}%"
              f"  {name}", file=sys.stderr)
    print(json.dumps({
        "metric": f"{args.stage}_device_op_profile",
        "device_busy_ms_per_step": round(per_step_ms, 2),
        "steps": args.steps,
        "top_ops": [{"name": n, "ms_per_step": round(d / 1e3 / args.steps, 3),
                     "pct": round(100 * d / total, 2)}
                    for n, d in rows],
    }))


if __name__ == "__main__":
    main()
