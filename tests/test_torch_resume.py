"""Loading the reference's torch checkpoints as frozen modules in training
(ref:train.py:24-28,283-308 semantics)."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from eamm_tpu.train import make_optimizer
from eamm_tpu.train.steps import init_part1_state, init_part2_state
from eamm_tpu.train.loop import load_frozen_torch
from tests.test_compat_parity import (TKPDetector, TKPDetectorA, TATNet,
                                      _randomize_bn_stats)
from tests.test_compat_generator import TGenerator
from tests.test_train_steps import small_models, part1_batch


def _save_ckpts(tmp_path):
    torch.manual_seed(0)
    kp = TKPDetector(be=32, max_f=128, num_blocks=5)
    gen = TGenerator(be=16, max_f=64, bottleneck=1)
    at = TATNet()
    kpa = TKPDetectorA()
    for m in (kp, gen, at, kpa):
        _randomize_bn_stats(m)
    fomm_path = str(tmp_path / "fomm.pth.tar")
    audio_path = str(tmp_path / "audio.pth.tar")
    torch.save({"kp_detector": kp.state_dict(),
                "generator": gen.state_dict()}, fomm_path)
    torch.save({"audio_feature": at.state_dict(),
                "kp_detector_a": kpa.state_dict()}, audio_path)
    return fomm_path, audio_path, kp, at


def test_part1_loads_frozen_fomm(tmp_path):
    fomm_path, audio_path, kp, at = _save_ckpts(tmp_path)
    models = small_models()
    models["kp_detector"] = models["kp_detector"].clone(max_features=128)
    models["generator"] = models["generator"].clone(
        block_expansion=16, max_features=64,
        dense_motion_params=dict(block_expansion=64, max_features=256,
                                 num_blocks=5, scale_factor=0.25))
    opt = make_optimizer()
    batch = jax.tree.map(jnp.asarray, part1_batch())
    state = init_part1_state(jax.random.PRNGKey(0), models, batch, opt)
    state = load_frozen_torch(state, "train_part1",
                              fomm_checkpoint=fomm_path)
    want = kp.state_dict()["kp.bias"].numpy()
    got = np.asarray(state.frozen["kp_detector"]["head"]["kp"]["bias"])
    np.testing.assert_allclose(got, want)


def test_part2_loads_frozen_audio(tmp_path):
    fomm_path, audio_path, kp, at = _save_ckpts(tmp_path)
    models = small_models()
    opt = make_optimizer()
    rng = np.random.RandomState(0)
    batch = jax.tree.map(jnp.asarray, {
        **part1_batch(),
        "transformed_driving": rng.rand(2, 2, 256, 256, 3).astype(np.float32),
        "emotion": rng.randint(0, 8, size=(2,)).astype(np.int32)})
    state = init_part2_state(jax.random.PRNGKey(0), models, batch, opt)
    state = load_frozen_torch(state, "train_part2",
                              audio_checkpoint=audio_path)
    want = at.state_dict()["lstm.bias_ih_l0"].numpy()
    got = np.asarray(state.frozen["audio_feature"]["lstm"]["b_ih_l0"])
    np.testing.assert_allclose(got, want)
