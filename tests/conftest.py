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

# Persistent compilation cache: the suite is compile-dominated (big hourglass
# models at 256^2); repeat runs drop from ~28 min to a few minutes.
_CACHE_DIR = os.path.join(REPO_ROOT, ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------- fixtures
import numpy as np  # noqa: E402
import pytest  # noqa: E402


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
