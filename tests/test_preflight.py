"""Checkpoint pre-flight (eamm_tpu.compat.preflight).

The key inventories in ``FAMILY_KEYS`` must stay in lockstep with the reads
the converters in ``torch_convert.py`` actually perform; the sync tests
here enforce that by recording every ``sd[key]`` read during a real
conversion of an oracle checkpoint and asserting set equality.  torch-free
tests cover family inference, missing/unused detection and report shape.
"""
import numpy as np
import pytest
import torch

from eamm_tpu.compat import preflight
from eamm_tpu.compat import torch_convert as tc

from tests.test_compat_parity import (TKPDetector, TKPDetectorA, TATNet,
                                      _randomize_bn_stats)
from tests.test_compat_generator import TGenerator
from tests.test_compat_emotion import TEmotionK
from tests.test_compat_emotion_map import TEmotionMap
from tests.test_compat_discriminator import TMulti
from tests.test_compat_tfnet import TTFNet
from tests.test_compat_aux import (TCtEncoder, TEmotionNet, TAF2F, TA2I,
                                   TNANet, TAudioFeature)


pytestmark = pytest.mark.smoke

class _Recorder(dict):
    """Pass-through state dict recording every __getitem__ read (not
    __contains__ probes — those are the converters' optionality checks)."""

    def __init__(self, sd):
        super().__init__(sd)
        self.reads = set()

    def __getitem__(self, k):
        self.reads.add(k)
        return super().__getitem__(k)


def _sd(module):
    return {k: v.numpy() for k, v in module.state_dict().items()}


ORACLES = [
    # (family, module factory, converter)
    ("kp_detector", lambda: TKPDetector(be=16, max_f=64, num_blocks=5),
     tc.convert_kp_detector),
    ("kp_detector_a", lambda: TKPDetectorA(), tc.convert_kp_detector_a),
    ("generator", lambda: TGenerator(be=16, max_f=64, bottleneck=1),
     tc.convert_generator),
    ("atnet", lambda: TATNet(), tc.convert_atnet),
    ("tfnet", lambda: TTFNet(), tc.convert_tfnet),
    ("emotion_k", lambda: TEmotionK(be=16, max_f=64, blocks=5),
     tc.convert_emotion_k),
    ("emotion_map", lambda: TEmotionMap(be=16, max_f=64, blocks=5),
     tc.convert_emotion_map),
    ("discriminator",
     lambda: TMulti(scales=(1,), be=16, max_f=64, blocks=4, sn=True),
     tc.convert_discriminator),
    ("ct_encoder", lambda: TCtEncoder(), tc.convert_ct_encoder),
    ("emotion_net", lambda: TEmotionNet(), tc.convert_emotion_net),
    ("af2f", lambda: TAF2F(), tc.convert_af2f),
    ("a2i", lambda: TA2I(), tc.convert_a2i),
    ("na_net", lambda: TNANet(), tc.convert_na_net),
    ("audio_feature_composite", lambda: TAudioFeature(),
     tc.convert_audio_feature),
]


@pytest.mark.parametrize("family,make,convert",
                         ORACLES, ids=[o[0] for o in ORACLES])
def test_expected_keys_match_converter_reads(family, make, convert,
                                             monkeypatch):
    """FAMILY_KEYS[family] == exactly the keys the converter reads.

    Every converter normalizes its input through ``_strip_prefix``; the
    spy wraps that output in a recorder so all subsequent reads are
    captured.  The composite Audio_Feature converter re-strips each
    sub-module with RELATIVE keys — its inventory is by construction the
    prefixed union of the three component inventories, which are each
    sync-tested here, so it is covered by the family-level cases."""
    if family == "audio_feature_composite":
        pytest.skip("covered by ct_encoder + emotion_net + af2f sync tests")
    torch.manual_seed(0)
    module = make()
    recorders = []
    orig = tc._strip_prefix

    def spy(sd):
        r = _Recorder(orig(sd))
        recorders.append(r)
        return r

    monkeypatch.setattr(tc, "_strip_prefix", spy)
    sd = _sd(module)
    convert(sd)
    reads = set().union(*(r.reads for r in recorders))
    expected = preflight.FAMILY_KEYS[family](sd)
    assert reads == expected, (
        f"preflight inventory out of sync with convert for {family}: "
        f"converter-only={sorted(reads - expected)[:5]}, "
        f"preflight-only={sorted(expected - reads)[:5]}")


@pytest.mark.parametrize("family,make,convert",
                         ORACLES, ids=[o[0] for o in ORACLES])
def test_oracle_state_dicts_pass_preflight(family, make, convert):
    torch.manual_seed(0)
    sd = _sd(make())
    report = preflight.check_state_dict(sd, family=family)
    (m,) = report.modules
    assert m.missing == [], m.missing
    assert m.unused == [], m.unused
    assert m.n_matched > 0 and report.ok and not report.fatal


def test_missing_key_detected():
    torch.manual_seed(0)
    sd = _sd(TKPDetectorA())
    del sd["kp.weight"]
    report = preflight.check_state_dict(sd, family="kp_detector_a")
    (m,) = report.modules
    assert "kp.weight" in m.missing
    assert report.fatal and not report.ok
    assert "missing: kp.weight" in str(report)


def test_unused_key_detected_and_num_batches_tracked_ignored():
    torch.manual_seed(0)
    sd = _sd(TKPDetector(be=16, max_f=64, num_blocks=5))
    sd["kp.weigth"] = sd["kp.weight"]          # the classic typo rename
    sd["predictor.encoder.down_blocks.0.norm.num_batches_tracked"] = \
        np.int64(7)
    report = preflight.check_state_dict(sd, family="kp_detector")
    (m,) = report.modules
    assert m.unused == ["kp.weigth"]
    assert not m.fatal                         # unused keys warn, not fail
    assert not report.ok


def test_module_prefix_stripped():
    """DataParallel 'module.' prefixes are stripped before diffing
    (ref:train.py:283-299)."""
    torch.manual_seed(0)
    sd = {f"module.{k}": v for k, v in _sd(TKPDetectorA()).items()}
    report = preflight.check_state_dict(sd, family="kp_detector_a")
    assert report.ok


def test_checkpoint_level_inference_and_skips():
    """A full three-checkpoint-style dict: families inferred from the
    reference save-key names (ref:logger.py:44-50); optimizer/scalar
    entries skipped."""
    torch.manual_seed(0)
    ckpt = {
        "kp_detector": _sd(TKPDetector(be=16, max_f=64, num_blocks=5)),
        "generator": _sd(TGenerator(be=16, max_f=64, bottleneck=1)),
        "kp_detector_a": _sd(TKPDetectorA()),
        "audio_feature": _sd(TATNet()),
        "emo_detector": _sd(TEmotionK(be=16, max_f=64, blocks=5)),
        "discriminator": _sd(TMulti(scales=(1,), be=16, max_f=64,
                                    blocks=4, sn=True)),
        "optimizer_audio_feature": {"state": {}, "param_groups": []},
        "epoch": 3,
        "step": 1500,
    }
    report = preflight.check_state_dict(ckpt)
    fams = {m.name: m.family for m in report.modules}
    assert fams == {"kp_detector": "kp_detector", "generator": "generator",
                    "kp_detector_a": "kp_detector_a",
                    "audio_feature": "atnet", "emo_detector": "emotion_k",
                    "discriminator": "discriminator"}
    assert report.ok
    assert set(report.skipped) == {"optimizer_audio_feature", "epoch",
                                   "step"}


def test_emotion_map_and_composite_inference():
    torch.manual_seed(0)
    ckpt = {"emo_detector": _sd(TEmotionMap(be=16, max_f=64, blocks=5)),
            "audio_feature": _sd(TAudioFeature())}
    report = preflight.check_state_dict(ckpt)
    fams = {m.name: m.family for m in report.modules}
    assert fams == {"emo_detector": "emotion_map",
                    "audio_feature": "audio_feature_composite"}
    assert report.ok


def test_unrecognized_module_reported():
    report = preflight.check_state_dict(
        {"mystery": {"foo.weight": np.zeros((2, 2))}})
    (m,) = report.modules
    assert m.family is None and not report.ok
    assert "UNRECOGNIZED" in str(report)


def test_tolerated_reference_dead_params():
    """Keys real reference checkpoints carry but the converters skip by
    design (AntiAlias buffers, dead heads, KPDetector_a's unused
    hourglass) do not pollute the report."""
    torch.manual_seed(0)
    sd = _sd(TKPDetectorA())
    sd["predictor.encoder.down_blocks.0.conv.weight"] = np.zeros((4, 4, 3, 3))
    sd["down.weight"] = np.zeros((3, 1, 13, 13))
    report = preflight.check_state_dict(sd, family="kp_detector_a")
    assert report.ok

    sd2 = _sd(TEmotionK(be=16, max_f=64, blocks=5))
    sd2["fc.weight"] = np.zeros((8, 512))
    sd2["fc.bias"] = np.zeros((8,))
    sd2["down.weight"] = np.zeros((3, 1, 13, 13))
    report2 = preflight.check_state_dict(sd2, family="emotion_k")
    assert report2.ok


def test_path_roundtrip(tmp_path):
    torch.manual_seed(0)
    kpa = TKPDetectorA()
    path = str(tmp_path / "audio.pth.tar")
    torch.save({"kp_detector_a": kpa.state_dict(), "epoch": 1}, path)
    report = preflight.check_state_dict(path)
    assert report.path == path and report.ok
    assert report.modules[0].family == "kp_detector_a"
