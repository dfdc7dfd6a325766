"""Worker process for the 2-process CPU jax.distributed smoke test
(tests/test_multihost_dp.py).

Each process owns 4 virtual CPU devices (8 global), initializes the
distributed runtime, serves a DISJOINT slice of the batch stream via
``DataLoader(shard=(process_index, process_count))``, assembles the global
sharded batch with ``jax.make_array_from_process_local_data`` (the
``shard_batch`` multi-host path, eamm_tpu/parallel/mesh.py), and runs ONE
part1 training step over the global 8-device mesh — the multi-host DP
wiring of ``train/loop.py:104-107`` exercised end to end.

Invoked: python multihost_worker.py <process_id> <num_processes> <port> <barrier_dir>
Prints one line: MULTIHOST_OK loss=<float> batch=<sha1 of local batch>
"""
import hashlib
import os
import sys
import time


def _file_barrier(barrier_dir: str, name: str, idx: int, n: int,
                  timeout: float = 1200.0) -> None:
    """Rendezvous the n worker processes via marker files.

    Needed because Gloo's context init has a hard ~30 s deadline at the
    FIRST collective execution, while the preceding jit compile takes
    minutes per process on this single-core host (and the two processes
    contend for it, skewing completion by the full compile time). The
    barrier lines the processes up after the compile so the collective
    init window is milliseconds wide.
    """
    open(os.path.join(barrier_dir, f"{name}.{idx}"), "w").close()
    deadline = time.time() + timeout
    while any(not os.path.exists(os.path.join(barrier_dir, f"{name}.{j}"))
              for j in range(n)):
        if time.time() > deadline:
            raise TimeoutError(f"barrier {name}: peers missing")
        time.sleep(0.2)


def main():
    idx, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    barrier_dir = sys.argv[4]
    # replace (not append) any inherited device-count flag: each process
    # owns exactly 4 local devices, 4*n global
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=4")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=n,
                               process_id=idx)
    assert jax.process_count() == n, jax.process_count()
    assert jax.device_count() == 4 * n, jax.device_count()
    assert len(jax.local_devices()) == 4

    cache = os.path.join(repo, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import jax.numpy as jnp
    from eamm_tpu.data.datasets import DataLoader
    from eamm_tpu.models import (KPDetector, KPDetectorA, ATNet,
                                 OcclusionAwareGenerator)
    from eamm_tpu.parallel import make_mesh, shard_batch, replicate_tree
    from eamm_tpu.train import (make_optimizer, make_part1_step,
                                init_part1_state)
    from jax.sharding import NamedSharding, PartitionSpec as P

    T = 2

    class SynthDataset:
        """Deterministic by index: both hosts see the same sample space,
        the loader's shard argument selects disjoint batches."""

        def __len__(self):
            return 16

        def __getitem__(self, i):
            r = np.random.RandomState(100 + i)
            return {
                "example_image": r.rand(256, 256, 3).astype(np.float32),
                "driving": r.rand(T, 256, 256, 3).astype(np.float32),
                "driving_audio": r.randn(T, 28, 12).astype(np.float32),
                "driving_pose": r.randn(T, 6).astype(np.float32),
            }

    # per-host batch 4 -> global batch 8 over the 8-device global mesh
    loader = DataLoader(SynthDataset(), batch_size=4, shuffle=True,
                        num_workers=2, seed=0, shard=(idx, n))
    local_batch = next(iter(loader))
    digest = hashlib.sha1(
        local_batch["example_image"].tobytes()).hexdigest()[:12]

    models = {
        "kp_detector": KPDetector(num_kp=10, block_expansion=16,
                                  max_features=64, num_blocks=5),
        "kp_detector_a": KPDetectorA(num_kp=10),
        "audio_feature": ATNet(),
        "generator": OcclusionAwareGenerator(
            num_down_blocks=2, num_bottleneck_blocks=1, max_features=64,
            block_expansion=16,
            dense_motion_params=dict(block_expansion=16, max_features=64,
                                     num_blocks=5, scale_factor=0.25)),
    }
    train_params = {
        "loss_weights": {"audio": 10, "emo": 10,
                         "perceptual": [0, 0, 0, 0, 0],
                         "generator_gan": 0},
        "generator": "not", "scales": [1],
        "type": "linear_4", "classify": True,
    }
    opt = make_optimizer()
    mesh = make_mesh(jax.devices())
    with mesh:
        batch = shard_batch(local_batch, mesh)   # global [8, ...] from 2x[4]
        assert batch["example_image"].shape[0] == 4 * n   # global batch
        state = init_part1_state(
            jax.random.PRNGKey(0), models,
            {k: jnp.asarray(v) for k, v in local_batch.items()}, opt)
        state = replicate_tree(state, mesh)
        step = jax.jit(
            make_part1_step(models, train_params, opt),
            in_shardings=(jax.tree.map(lambda x: x.sharding, state),
                          jax.tree.map(
                              lambda _: NamedSharding(mesh, P("data")),
                              local_batch)),
        )
        # AOT-compile first, then rendezvous: execution (and with it the
        # 30 s-deadline Gloo context init) must start near-simultaneously
        # on both processes — see _file_barrier.
        compiled = step.lower(state, batch).compile()
        _file_barrier(barrier_dir, "compiled", idx, n)
        state, metrics = compiled(state, batch)
        # metrics are replicated; every process reads the same global loss
        total = float(metrics["total"])
    print(f"MULTIHOST_OK loss={total:.6f} batch={digest}", flush=True)


if __name__ == "__main__":
    main()
