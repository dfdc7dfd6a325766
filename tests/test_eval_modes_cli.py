"""run.py --mode reconstruction|animate end-to-end with torch FOMM
checkpoint + synthetic test split."""
import json
import os

import numpy as np
import pytest
import torch
import yaml

from tests.test_compat_parity import TKPDetector, _randomize_bn_stats
from tests.test_compat_generator import TGenerator
from tests.test_demo_cli_e2e import SMALL_MODEL_PARAMS


@pytest.fixture(scope="module")
def eval_env(tmp_path_factory):
    import imageio.v2 as imageio
    d = tmp_path_factory.mktemp("evalcli")
    torch.manual_seed(12)
    kp = TKPDetector(be=32, max_f=128, num_blocks=5)
    gen = TGenerator(be=64, max_f=128, bottleneck=1)
    for m in (kp, gen):
        _randomize_bn_stats(m)
    torch.save({"kp_detector": kp.state_dict(),
                "generator": gen.state_dict()}, str(d / "fomm.pth.tar"))

    rng = np.random.RandomState(0)
    root = d / "data"
    for clip in ["A/c0", "A/c1"]:
        img = root / "Image" / "test_fo" / clip
        mfcc = root / "MFCC" / "test" / clip
        img.mkdir(parents=True)
        mfcc.mkdir(parents=True)
        pose_dir = root / "pose" / "test_fo" / clip.split("/")[0]
        pose_dir.mkdir(parents=True, exist_ok=True)
        for i in range(30):
            imageio.imwrite(str(img / f"{i}.png"),
                            (rng.rand(256, 256, 3) * 255).astype(np.uint8))
            np.save(str(mfcc / f"{i}.npy"), rng.randn(28, 13))
        np.save(str(pose_dir / f"{clip.split('/')[1]}.npy"),
                rng.randn(30, 7))

    from tests.test_compat_emotion import TEmotionK
    emo = TEmotionK(be=32, max_f=128, blocks=5)
    _randomize_bn_stats(emo)
    torch.save({"emo_detector": emo.state_dict()}, str(d / "emo.pth.tar"))

    model_params = dict(SMALL_MODEL_PARAMS)
    model_params["emotion_params"] = {"max_features": 128}
    cfg = {"dataset_params": {"name": "LRW", "root_dir": str(root),
                              "frame_shape": [256, 256, 3],
                              "id_sampling": False,
                              "augmentation_params": {}},
           "model_params": model_params,
           "train_params": {"jaco_net": "cnn", "batch_size": 2},
           "reconstruction_params": {"num_videos": 2},
           "animate_params": {"num_pairs": 2, "normalization_params": {
               "use_relative_movement": True,
               "adapt_movement_scale": False}}}
    with open(str(d / "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    return str(d)


def test_reconstruction_mode(eval_env, tmp_path):
    from eamm_tpu.cli.run import main
    out = main(["--config", f"{eval_env}/config.yaml",
                "--mode", "reconstruction",
                "--fomm_checkpoint", f"{eval_env}/fomm.pth.tar",
                "--log_dir", str(tmp_path), "--num_videos", "2"])
    assert out["videos"] == 2
    assert np.isfinite(out["reconstruction_l1"])
    assert {"reconstruction_psnr", "reconstruction_ssim",
            "reconstruction_akd"} <= set(out)
    assert "reconstruction_aed" not in out      # no emotion checkpoint given


def test_reconstruction_mode_aed(eval_env, tmp_path):
    """--emo_checkpoint adds the AED metric (EmotionK trunk embedding)."""
    from eamm_tpu.cli.run import main
    out = main(["--config", f"{eval_env}/config.yaml",
                "--mode", "reconstruction",
                "--fomm_checkpoint", f"{eval_env}/fomm.pth.tar",
                "--emo_checkpoint", f"{eval_env}/emo.pth.tar",
                "--log_dir", str(tmp_path), "--num_videos", "1"])
    assert np.isfinite(out["reconstruction_aed"])
    assert out["reconstruction_aed"] >= 0.0


def test_animate_mode(eval_env, tmp_path):
    from eamm_tpu.cli.run import main
    clips = main(["--config", f"{eval_env}/config.yaml", "--mode", "animate",
                  "--fomm_checkpoint", f"{eval_env}/fomm.pth.tar",
                  "--log_dir", str(tmp_path), "--num_videos", "2"])
    assert len(clips) == 2
