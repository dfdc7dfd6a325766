"""Test configuration.

Tests always run on CPU with a virtual 8-device platform so that mesh /
sharding tests work without TPU hardware (the reference has no distributed
tests at all; see SURVEY.md §4).  These env vars must be set before jax
initializes its backends, hence the top-of-file placement.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The container's sitecustomize registers the TPU PJRT plugin and pins
# jax_platforms before env vars are consulted; override it explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Synchronous dispatch: on this single-core host the async-dispatch
# arrangement (main thread spin-waiting in device_get while a dispatch
# thread + 8 Eigen workers contend for the one core) slowed big train
# programs ~10x (a warm-cache steps_per_dispatch test: 21 min async vs
# ~2 min sync) and could push XLA's in-program rendezvous past its hard
# deadline, aborting the whole pytest process.
jax.config.update("jax_cpu_enable_async_dispatch", False)

# Persistent compilation cache: the suite is compile-dominated (big hourglass
# models at 256^2); repeat runs drop from ~28 min to a few minutes.
# EAMM_TEST_CACHE_DIR overrides the location (e.g. a throwaway dir to time
# the cold-cache smoke tier without disturbing the warm cache).
_CACHE_DIR = os.environ.get("EAMM_TEST_CACHE_DIR",
                            os.path.join(REPO_ROOT, ".jax_cache"))
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------- fixtures
import numpy as np  # noqa: E402
import pytest  # noqa: E402


# Narrow-width config for the smoke tier: same 256^2 product geometry and
# module wiring as SMALL_CONFIG, but ~8x narrower convs and shallower
# hourglasses so the cold-cache compile fits the < 5 min smoke budget
# (SMALL_CONFIG's pipeline fixture alone cold-compiles for ~200 s).
TINY_CONFIG = {
    "model_params": {
        "common_params": {"num_kp": 10, "num_channels": 3,
                          "estimate_jacobian": True},
        "audio_params": {"num_kp": 10, "num_channels": 3, "num_channels_a": 3,
                         "estimate_jacobian": True},
        "kp_detector_params": {"temperature": 0.1, "block_expansion": 8,
                               "max_features": 32, "scale_factor": 0.25,
                               "num_blocks": 3},
        "generator_params": {"block_expansion": 8, "max_features": 32,
                             "num_down_blocks": 2, "num_bottleneck_blocks": 1,
                             "estimate_occlusion_map": True,
                             "dense_motion_params": {
                                 "block_expansion": 8, "max_features": 32,
                                 "num_blocks": 3, "scale_factor": 0.25}},
        "discriminator_params": {"scales": [1], "block_expansion": 8,
                                 "max_features": 32, "num_blocks": 3,
                                 "sn": True},
    },
    "train_params": {"jaco_net": "cnn"},
}


@pytest.fixture()
def one_dev_mesh():
    """One-device mesh for orchestration (loop/CLI) tests.

    Multi-device CPU meshes on this single-core host stall 20 s+ per
    in-program collective in the XLA CPU rendezvous (the device threads
    contend for the one core); a warm-cache 2-device train-loop test
    measured 19 min of pure execution, and a stall crossing XLA's hard
    rendezvous deadline aborts the whole pytest process.  Sharded
    numerics have dedicated multi-device tests (test_train_steps,
    test_sharded_inference, test_multihost_dp)."""
    import jax as _jax
    from eamm_tpu.parallel import make_mesh
    return make_mesh(_jax.devices("cpu")[:1])


@pytest.fixture(scope="session")
def tiny_pipeline():
    """Shared narrow-width pipeline for smoke tests (infer + serve)."""
    from eamm_tpu.infer import EammPipeline, PipelineOptions
    return EammPipeline.from_random(
        TINY_CONFIG, options=PipelineOptions(frame_chunk=8, time_bucket=8))


@pytest.fixture(scope="session")
def lrw_root(tmp_path_factory):
    """Synthetic LRW-layout dataset on disk (Image/MFCC/pose trees)."""
    import imageio.v2 as imageio
    root = tmp_path_factory.mktemp("lrw256")
    rng = np.random.RandomState(0)
    for clip in ["A/c0", "A/c1"]:
        img = root / "Image" / "train_fo" / clip
        mfcc = root / "MFCC" / "train" / clip
        img.mkdir(parents=True)
        mfcc.mkdir(parents=True)
        pose_dir = root / "pose" / "train_fo" / clip.split("/")[0]
        pose_dir.mkdir(parents=True, exist_ok=True)
        for i in range(30):
            imageio.imwrite(str(img / f"{i}.png"),
                            (rng.rand(256, 256, 3) * 255).astype(np.uint8))
            np.save(str(mfcc / f"{i}.npy"), rng.randn(28, 13))
        np.save(str(pose_dir / f"{clip.split('/')[1]}.npy"), rng.randn(30, 7))
    return str(root)
