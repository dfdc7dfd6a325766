"""CLI smoke tests: run.py end-to-end on synthetic data; demo.py parser and
host-side helpers."""
import os

import numpy as np
import pytest

from tests.test_train_loop import SMALL_CONFIG  # noqa: F401


def test_run_cli(lrw_root, tmp_path):  # noqa: F811
    import json
    import yaml
    cfg = json.loads(json.dumps(SMALL_CONFIG))
    cfg["dataset_params"]["root_dir"] = lrw_root
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from eamm_tpu.cli.run import main
    state = main(["--config", cfg_path, "--mode", "train_part1",
                  "--log_dir", str(tmp_path / "log"), "--max_steps", "1"])
    assert int(state.step) == 1
    # provenance copy of the config in the timestamped log dir (ref:run.py:47-56)
    subdirs = os.listdir(str(tmp_path / "log"))
    assert len(subdirs) == 1
    assert "cfg.yaml" in os.listdir(str(tmp_path / "log" / subdirs[0]))


def test_demo_parser_defaults():
    from eamm_tpu.cli.demo import build_parser
    opt = build_parser().parse_args(
        ["--config", "c.yaml", "--checkpoint", "a", "--audio_checkpoint", "b",
         "--emo_checkpoint", "c", "--source_image", "s.png",
         "--in_file", "a.wav", "--pose_file", "p.npy"])
    assert opt.relative is False          # ref:demo.py:558
    assert opt.adapt_scale is False
    assert opt.smooth_pose is True        # ref:demo.py:551
    assert opt.emo_type == "linear_3"
    assert opt.emotion == "disgusted"
    assert opt.weight == 1.6


def test_smooth_pose_graft(tmp_path):
    from eamm_tpu.cli.demo import smooth_pose_graft
    start = np.array([[1, 2, 3, 4, 5, 6, 7]], np.float32)
    long = np.cumsum(np.ones((5, 7), np.float32), axis=0)
    p1 = str(tmp_path / "start.npy")
    p2 = str(tmp_path / "long.npy")
    np.save(p1, start)
    np.save(p2, long)
    out = smooth_pose_graft(p1, p2)
    assert out.shape == (5, 7)
    np.testing.assert_allclose(out[0], start[0])          # starts at source pose
    np.testing.assert_allclose(out[-1] - out[0], long[-1] - long[0])


def test_write_video_png_fallback(tmp_path):
    from eamm_tpu.cli.demo import write_video
    frames = (np.random.rand(3, 32, 32, 3) * 255).astype(np.uint8)
    out = write_video(str(tmp_path / "clip.mp4"), frames)
    assert os.path.exists(out)
