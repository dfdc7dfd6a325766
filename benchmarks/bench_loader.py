"""Input-pipeline throughput: can the host feed the TPU training step?

Builds a synthetic LRW-layout dataset on disk (real PNG files), then
measures DataLoader batches/sec for the part1/fine-tune batch shape with
the native C++ decoder (libpng worker threads) and with the imageio
fallback.  The fine-tune step runs at ~3 steps/s (BASELINE.md), i.e. the
loader must sustain ~0.3 GB/s of decoded pixels to keep the chip busy.

Prints one JSON line per variant.  EAMM_LOADER_CLIPS / EAMM_LOADER_STEPS
override the dataset / measurement size.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_synthetic_lrw(root: str, n_clips: int, frames: int = 30,
                        size: int = 256) -> None:
    """LRW layout: Image/train_fo/<word>/<clip>/<N>.png +
    MFCC/train/<word>/<clip>/<N>.npy + pose/train_fo/<word>/<clip>.npy
    (see eamm_tpu/data/datasets.py:5-7)."""
    import imageio.v2 as imageio
    rng = np.random.RandomState(0)
    for c in range(n_clips):
        img = os.path.join(root, "Image", "train_fo", "WORD", f"clip{c:04d}")
        mfcc = os.path.join(root, "MFCC", "train", "WORD", f"clip{c:04d}")
        pose = os.path.join(root, "pose", "train_fo", "WORD")
        os.makedirs(img, exist_ok=True)
        os.makedirs(mfcc, exist_ok=True)
        os.makedirs(pose, exist_ok=True)
        # realistic-entropy frames (uniform noise PNGs are worst-case for
        # libpng; smooth gradients + noise approximates face footage)
        base = rng.rand(size, size, 3) * 0.5
        for i in range(frames):
            frame = np.clip(base + 0.2 * rng.rand(size, size, 3), 0, 1)
            imageio.imwrite(os.path.join(img, f"{i}.png"),
                            (frame * 255).astype(np.uint8))
            np.save(os.path.join(mfcc, f"{i}.npy"), rng.randn(28, 13))
        np.save(os.path.join(pose, f"clip{c:04d}.npy"),
                rng.randn(frames, 7).astype(np.float32))


JITTER = {"jitter_param": {"brightness": 0.1, "contrast": 0.1,
                           "saturation": 0.1, "hue": 0.1}}

# the reference part-2 MEAD pipeline (ref:config/train_part2.yaml:6-22):
# mouth noise-mask + flip + rotation + perspective homographies + jitter
MEAD_AUG = {
    "crop_mouth_param": {"center_x": 135, "center_y": 190,
                         "mask_width": 100, "mask_height": 60},
    "flip_param": {"horizontal_flip": True, "time_flip": False},
    "rotation_param": {"degrees": 30},
    "perspective_param": {"pers_num": 30, "enlarge_num": 40},
    **JITTER,
}


def build_synthetic_mead(root: str, n_clips: int, frames: int = 30,
                         size: int = 256) -> None:
    """MEAD layout: MEAD_fomm_crop/<id>/<emotion_clip>/<N>.png +
    MEAD_MFCC/<id>/<clip>.npy + MEAD_fomm_pose_crop/<id>/<clip>.npy
    (see eamm_tpu/data/datasets.py MeadDataset)."""
    import imageio.v2 as imageio
    rng = np.random.RandomState(0)
    emotions = ["angry", "happy", "neutral", "sad"]
    for c in range(n_clips):
        clip = f"M1/{emotions[c % len(emotions)]}_{c:03d}"
        img = os.path.join(root, "MEAD_fomm_crop", clip)
        os.makedirs(img, exist_ok=True)
        base = rng.rand(size, size, 3) * 0.5
        for i in range(frames):
            frame = np.clip(base + 0.2 * rng.rand(size, size, 3), 0, 1)
            imageio.imwrite(os.path.join(img, f"{i}.png"),
                            (frame * 255).astype(np.uint8))
        for sub in ("MEAD_MFCC", "MEAD_fomm_pose_crop"):
            os.makedirs(os.path.join(root, sub, "M1"), exist_ok=True)
        np.save(os.path.join(root, "MEAD_MFCC", clip + ".npy"),
                rng.randn(frames, 28, 13))
        np.save(os.path.join(root, "MEAD_fomm_pose_crop", clip + ".npy"),
                rng.randn(frames, 7))
    # ensure at least one neutral clip per identity for the reference frame
    assert any("neutral" in e for e in emotions[:min(n_clips, 4)])


def bench(mode: str, root: str, batch_size: int, steps: int,
          num_workers: int) -> None:
    """One loader variant in a fresh process; prints one JSON line."""
    from eamm_tpu.data import native as native_mod
    from eamm_tpu.data.datasets import AudioDataset, DatasetRepeater, DataLoader
    if mode == "imageio":
        native_mod._lib_failed = True            # force imageio fallback
        native_mod._lib = None
    else:
        native_mod._lib_failed = False
        native_mod._lib = None
        if mode == "native" and not native_mod.native_available():
            print(json.dumps({"metric": "loader_batches_per_sec",
                              "mode": mode, "skipped": "no toolchain"}))
            return
    # host_jitter: reference-style host ColorJitter (part1 config jitter);
    # device_aug: uint8 upload + factors, the per-pixel math moves on-chip
    if mode.startswith("mead"):
        from eamm_tpu.data.datasets import MeadDataset
        kwargs = {"augmentation_params": MEAD_AUG,
                  "device_augmentation": mode.endswith("device_aug")}
        ds = DatasetRepeater(MeadDataset(root, is_train=True, **kwargs),
                             100000)
    else:
        kwargs = {}
        if mode.endswith("host_jitter"):
            kwargs = {"augmentation_params": JITTER}
        elif mode.endswith("device_aug"):
            kwargs = {"augmentation_params": JITTER,
                      "device_augmentation": True}
        ds = DatasetRepeater(AudioDataset(root, is_train=True, **kwargs),
                             100000)
    loader = DataLoader(ds, batch_size=batch_size, num_workers=num_workers,
                        prefetch=2)
    it = iter(loader)
    # warm-up: drain the prefetch queue + in-flight decodes so the timed
    # loop measures steady-state production, not pre-decoded batches
    for _ in range(1 + loader.prefetch + num_workers):
        batch = next(it)
    bytes_per_batch = sum(v.nbytes for v in batch.values())
    t0 = time.perf_counter()
    for _ in range(steps):
        batch = next(it)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "loader_batches_per_sec",
        "mode": mode,
        "batch_size": batch_size,
        "num_workers": num_workers,
        "batches_per_sec": round(steps / dt, 2),
        "decoded_MB_per_sec": round(bytes_per_batch * steps / dt / 1e6, 1),
        "MB_per_batch": round(bytes_per_batch / 1e6, 1),
    }), flush=True)
    it.close()                                    # stop the producer thread


def main():
    n_clips = int(os.environ.get("EAMM_LOADER_CLIPS", "24"))
    steps = int(os.environ.get("EAMM_LOADER_STEPS", "20"))
    workers = int(os.environ.get("EAMM_LOADER_WORKERS", str(os.cpu_count() or 4)))
    with tempfile.TemporaryDirectory() as root:
        print(f"building synthetic LRW layout ({n_clips} clips)...",
              file=sys.stderr)
        build_synthetic_lrw(root, n_clips)
        # One fresh subprocess per mode: a mode's allocation churn / page-
        # cache pressure measurably poisons later modes in the same process
        # (measured: packed drops 10.5 -> 3.9 batches/s when the PNG modes
        # run first).
        import subprocess

        def run_mode(mode, root=root, steps=steps, batch_size=6):
            subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--mode", mode, "--root", root,
                            "--steps", str(steps),
                            "--batch_size", str(batch_size),
                            "--workers", str(workers)], check=True)

        for mode in ("native", "imageio"):
            run_mode(mode)
        # decode-free packed format (packs sit next to the PNGs;
        # _read_frames prefers them automatically), then the augmentation
        # variants on the packed tree: host ColorJitter vs uint8 + on-device
        from eamm_tpu.data.packed import pack_tree
        pack_tree(os.path.join(root, "Image"))
        for mode in ("packed", "packed_host_jitter", "packed_device_aug"):
            run_mode(mode)
    # MEAD part-2 (bs 16, ref:config/train_part2.yaml:68): host pipeline
    # pays per-frame numpy homography warps; device_aug uploads the clean
    # uint8 stream + tiny decision arrays and warps on-chip.  The host
    # mode is run for very few steps — it is ~2 orders slower.
    with tempfile.TemporaryDirectory() as root:
        print(f"building synthetic MEAD layout ({n_clips} clips)...",
              file=sys.stderr)
        build_synthetic_mead(root, n_clips)
        from eamm_tpu.data.packed import pack_tree
        pack_tree(os.path.join(root, "MEAD_fomm_crop"))
        run_mode("mead_host", root=root, batch_size=16,
                 steps=max(2, steps // 10))
        run_mode("mead_device_aug", root=root, batch_size=16, steps=steps)


if __name__ == "__main__":
    if "--mode" in sys.argv:
        import argparse
        ap = argparse.ArgumentParser()
        ap.add_argument("--mode", required=True)
        ap.add_argument("--root", required=True)
        ap.add_argument("--steps", type=int, default=20)
        ap.add_argument("--batch_size", type=int, default=6)
        ap.add_argument("--workers", type=int, default=1)
        a = ap.parse_args()
        bench(a.mode, a.root, batch_size=a.batch_size, steps=a.steps,
              num_workers=a.workers)
    else:
        main()
