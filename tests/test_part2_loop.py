"""Part-2 training loop end-to-end on a synthetic MEAD-layout dataset
(neutral-reference example image, transformed_driving + emotion streams)."""
import json
import os

import numpy as np
import pytest

from eamm_tpu.train.loop import train
from tests.test_train_loop import SMALL_CONFIG


@pytest.fixture(scope="module")
def mead_root(tmp_path_factory):
    import imageio.v2 as imageio
    root = tmp_path_factory.mktemp("mead256")
    rng = np.random.RandomState(0)
    for clip in ["M1/angry_001", "M1/neutral_001", "M1/happy_001",
                 "M1/neutral_002"]:
        img = root / "MEAD_fomm_crop" / clip
        img.mkdir(parents=True)
        for i in range(30):
            imageio.imwrite(str(img / f"{i}.png"),
                            (rng.rand(256, 256, 3) * 255).astype(np.uint8))
        (root / "MEAD_MFCC" / clip).parent.mkdir(parents=True, exist_ok=True)
        np.save(str(root / "MEAD_MFCC" / (clip + ".npy")),
                rng.randn(30, 28, 13))
        (root / "MEAD_fomm_pose_crop" / clip).parent.mkdir(parents=True,
                                                           exist_ok=True)
        np.save(str(root / "MEAD_fomm_pose_crop" / (clip + ".npy")),
                rng.randn(30, 7))
    return str(root)


def test_part2_loop(mead_root, tmp_path, one_dev_mesh):
    cfg = json.loads(json.dumps(SMALL_CONFIG))
    cfg["dataset_params"].update({
        "name": "MEAD", "root_dir": mead_root,
        "augmentation_params": {
            "crop_mouth_param": {"center_x": 135, "center_y": 190,
                                 "mask_width": 100, "mask_height": 60},
            "flip_param": {"horizontal_flip": True, "time_flip": False},
        }})
    cfg["train_params"].update({"type": "linear_4", "classify": True,
                                "smooth": True,
                                "loss_weights": {
                                    **cfg["train_params"]["loss_weights"],
                                    "emo": 10}})
    log_dir = str(tmp_path / "log")
    state = train(cfg, "train_part2", log_dir, max_steps=1,
                  mesh=one_dev_mesh)
    assert int(state.step) == 1
    assert "emo_detector" in state.trainable
    scalars_path = os.path.join(log_dir, "scalars.jsonl")
    text = open(scalars_path).read()
    assert "loss_classify" in text and "loss_smooth" in text


def test_part2_loop_device_augmentation(mead_root, tmp_path, one_dev_mesh):
    """Full MEAD pipeline with transformed_driving built on device."""
    cfg = json.loads(json.dumps(SMALL_CONFIG))
    cfg["dataset_params"].update({
        "name": "MEAD", "root_dir": mead_root,
        "device_augmentation": True,
        "augmentation_params": {
            "crop_mouth_param": {"center_x": 135, "center_y": 190,
                                 "mask_width": 100, "mask_height": 60},
            "rotation_param": {"degrees": 30},
            "perspective_param": {"pers_num": 30, "enlarge_num": 40},
            "flip_param": {"horizontal_flip": True, "time_flip": False},
            "jitter_param": {"brightness": 0.1, "contrast": 0.1,
                             "saturation": 0.1, "hue": 0.1},
        }})
    cfg["train_params"].update({"type": "linear_4", "classify": True,
                                "loss_weights": {
                                    **cfg["train_params"]["loss_weights"],
                                    "emo": 10}})
    log_dir = str(tmp_path / "log")
    state = train(cfg, "train_part2", log_dir, max_steps=1,
                  mesh=one_dev_mesh)
    assert int(state.step) == 1
    text = open(os.path.join(log_dir, "scalars.jsonl")).read()
    assert "loss_classify" in text
