"""VGG19 perceptual-feature parity vs a torch oracle.

The oracle re-states the torchvision vgg19 ``features`` architecture from
its documented config (64,64,M,128,...,512,M) with random weights; the
reference cuts after-relu at indices 2/7/12/21/30 (ref:modules/model.py:10-24).
convert_vgg19 must map a torchvision-keyed state_dict onto our Vgg19 so all
five slices match.
"""
import numpy as np
import torch
import torch.nn as tnn
import jax.numpy as jnp

from eamm_tpu.models.vgg import Vgg19, convert_vgg19

_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
_CUTS = (2, 7, 12, 21, 30)
_MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
_STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)


def _torch_features():
    layers, in_ch = [], 3
    for v in _VGG19_CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, v, 3, padding=1), tnn.ReLU()]
            in_ch = v
    return tnn.Sequential(*layers)


def test_vgg19_slice_parity():
    torch.manual_seed(0)
    features = _torch_features().eval()
    sd = {f"features.{k}": v for k, v in features.state_dict().items()}
    variables = convert_vgg19(sd)

    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    ours = Vgg19().apply(variables, jnp.asarray(x))
    assert len(ours) == 5

    with torch.no_grad():
        h = (torch.from_numpy(x).permute(0, 3, 1, 2) - _MEAN) / _STD
        prev = 0
        for i, cut in enumerate(_CUTS):   # exclusive ends: features[prev:cut]
            h = features[prev:cut](h)
            prev = cut
            ref = h.permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(np.asarray(ours[i]), ref,
                                       atol=2e-4, rtol=2e-4)


def test_convert_vgg19_from_file(tmp_path):
    """--vgg_checkpoint consumes a saved torch state_dict file."""
    torch.manual_seed(1)
    features = _torch_features()
    sd = {f"features.{k}": v for k, v in features.state_dict().items()}
    path = tmp_path / "vgg19.pth"
    torch.save(sd, str(path))

    from eamm_tpu.compat import load_torch_checkpoint
    loaded = load_torch_checkpoint(str(path))
    variables = convert_vgg19(loaded)
    out = Vgg19().apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert len(out) == 5 and all(np.all(np.isfinite(o)) for o in out)


def test_vgg_checkpoint_cli_wiring(lrw_root, tmp_path):
    """run.py --vgg_checkpoint feeds converted weights into fine-tune: the
    random-VGG warning fires without it and is silent with it."""
    import json
    import warnings as W
    import yaml
    from eamm_tpu.cli import run as run_cli
    from tests.test_train_loop import SMALL_CONFIG

    torch.manual_seed(2)
    sd = {f"features.{k}": v for k, v in _torch_features().state_dict().items()}
    vgg_path = str(tmp_path / "vgg19.pth")
    torch.save(sd, vgg_path)

    cfg = json.loads(json.dumps(SMALL_CONFIG))
    cfg["dataset_params"]["root_dir"] = lrw_root
    cfg["train_params"]["generator"] = "audio"
    cfg["train_params"]["scales"] = [0.25]
    cfg["train_params"]["loss_weights"]["perceptual"] = [1, 0, 0, 0, 0]
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        run_cli.main(["--config", cfg_path, "--mode", "train_part1_fine_tune",
                      "--log_dir", str(tmp_path / "log1"), "--max_steps", "1",
                      "--vgg_checkpoint", vgg_path])
    assert not any("RANDOM VGG" in str(w.message) for w in caught)

    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        run_cli.main(["--config", cfg_path, "--mode", "train_part1_fine_tune",
                      "--log_dir", str(tmp_path / "log2"), "--max_steps", "1"])
    assert any("RANDOM VGG" in str(w.message) for w in caught)
