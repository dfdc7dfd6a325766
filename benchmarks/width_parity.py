"""Production-width oracle parity on the real TPU (VERDICT r3 item 8).

Every oracle-parity TEST runs at reduced widths (the 1-core host cannot
afford a 512-wide torch forward per test run); this script evidences the
per-frame L1 < 1e-2 north star at the shape the product actually runs:
generator block_expansion=64 / max_features=512 / 6 bottleneck blocks,
dense motion max_features=1024 (ref:config/train_part1.yaml:34-47), one
converted-weights decode frame on the TPU vs the torch-CPU oracle.

Run: python benchmarks/width_parity.py   -> one JSON line.
TPU f32 convs differ from CPU by ~1e-3 (CLAUDE.md), well inside the 1e-2
budget this checks.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import torch
    import jax
    import jax.numpy as jnp
    from eamm_tpu.models import OcclusionAwareGenerator
    from eamm_tpu.compat import convert_generator
    from tests.test_compat_generator import TGenerator, TDenseMotion
    from tests.test_compat_parity import _randomize_bn_stats

    torch.manual_seed(7)
    oracle = TGenerator(be=64, max_f=512, bottleneck=6)
    oracle.dense_motion_network = TDenseMotion(num_kp=10, be=64, max_f=1024,
                                               blocks=5)
    oracle = oracle.eval()
    _randomize_bn_stats(oracle)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    model = OcclusionAwareGenerator(
        num_channels=3, num_kp=10, block_expansion=64, max_features=512,
        num_down_blocks=2, num_bottleneck_blocks=6,
        estimate_occlusion_map=True,
        dense_motion_params=dict(block_expansion=64, max_features=1024,
                                 num_blocks=5, scale_factor=0.25))
    variables = convert_generator(sd, num_down_blocks=2,
                                  num_bottleneck_blocks=6, dense_num_blocks=5)

    src = torch.rand(1, 3, 256, 256)
    kp_d = {"value": torch.rand(1, 10, 2) - 0.5,
            "jacobian": torch.eye(2).view(1, 1, 2, 2).repeat(1, 10, 1, 1)
            + 0.1 * torch.randn(1, 10, 2, 2)}
    kp_s = {"value": torch.rand(1, 10, 2) - 0.5,
            "jacobian": torch.eye(2).view(1, 1, 2, 2).repeat(1, 10, 1, 1)
            + 0.1 * torch.randn(1, 10, 2, 2)}
    t0 = time.time()
    with torch.no_grad():
        ref = oracle(src, kp_d, kp_s).permute(0, 2, 3, 1).numpy()
    torch_s = time.time() - t0

    t0 = time.time()
    out = jax.jit(model.apply)(
        variables, jnp.asarray(src.permute(0, 2, 3, 1).numpy()),
        {k: jnp.asarray(v.numpy()) for k, v in kp_d.items()},
        {k: jnp.asarray(v.numpy()) for k, v in kp_s.items()})
    pred = np.asarray(out["prediction"])
    jax_s = time.time() - t0

    err = np.abs(pred - ref)
    line = {
        "check": "production_width_generator_parity",
        "backend": jax.default_backend(),
        "widths": {"block_expansion": 64, "max_features": 512,
                   "bottleneck": 6, "dense_max_features": 1024},
        "l1_max": float(err.max()),
        "l1_mean": float(err.mean()),
        "north_star_l1_lt_1e2": bool(err.max() < 1e-2),
        "torch_oracle_s": round(torch_s, 1),
        "jax_incl_compile_s": round(jax_s, 1),
    }
    print(json.dumps(line))
    if not line["north_star_l1_lt_1e2"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
