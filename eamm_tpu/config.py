"""Config loading + model factories.

The reference drives everything from 4 YAML files whose sections are
``**``-splatted into module constructors (ref:run.py:60-91, ref:demo.py:54-73).
We keep the same schema so the reference configs load unchanged
(``config/train_part1.yaml`` etc. work verbatim), and expose typed factory
helpers instead of splatting.
"""
from __future__ import annotations




import yaml

from eamm_tpu.models import (KPDetector, KPDetectorA, OcclusionAwareGenerator,
                             MultiScaleDiscriminator, ATNet, EmotionK,
                             EmotionMap)


def load_config(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def _get(cfg: dict, *keys, default=None):
    for k in keys:
        if cfg is None:
            return default
        cfg = cfg.get(k)
    return cfg if cfg is not None else default


def build_kp_detector(config: dict) -> KPDetector:
    mp = config["model_params"]
    kp = mp["kp_detector_params"]
    common = mp["common_params"]
    return KPDetector(
        num_kp=common["num_kp"],
        num_channels=common.get("num_channels", 3),
        estimate_jacobian=common.get("estimate_jacobian", True),
        temperature=kp["temperature"],
        block_expansion=kp["block_expansion"],
        max_features=kp["max_features"],
        num_blocks=kp["num_blocks"],
        scale_factor=kp.get("scale_factor", 1),
    )


def build_kp_detector_a(config: dict) -> KPDetectorA:
    mp = config["model_params"]
    kp = mp["kp_detector_params"]
    audio = mp["audio_params"]
    return KPDetectorA(
        num_kp=audio["num_kp"],
        num_channels=audio.get("num_channels", 3),
        num_channels_a=audio.get("num_channels_a", 3),
        estimate_jacobian=audio.get("estimate_jacobian", True),
        temperature=kp["temperature"],
        block_expansion=kp["block_expansion"],
        max_features=kp["max_features"],
        num_blocks=kp["num_blocks"],
        scale_factor=kp.get("scale_factor", 1),
    )


def build_generator(config: dict) -> OcclusionAwareGenerator:
    mp = config["model_params"]
    g = mp["generator_params"]
    common = mp["common_params"]
    return OcclusionAwareGenerator(
        num_channels=common.get("num_channels", 3),
        num_kp=common["num_kp"],
        estimate_jacobian=common.get("estimate_jacobian", True),
        block_expansion=g["block_expansion"],
        max_features=g["max_features"],
        num_down_blocks=g["num_down_blocks"],
        num_bottleneck_blocks=g["num_bottleneck_blocks"],
        estimate_occlusion_map=g.get("estimate_occlusion_map", False),
        dense_motion_params=g.get("dense_motion_params"),
    )


def build_discriminator(config: dict) -> MultiScaleDiscriminator:
    mp = config["model_params"]
    d = mp["discriminator_params"]
    common = mp["common_params"]
    return MultiScaleDiscriminator(
        scales=tuple(d.get("scales", (1,))),
        num_channels=common.get("num_channels", 3),
        block_expansion=d["block_expansion"],
        max_features=d["max_features"],
        num_blocks=d["num_blocks"],
        sn=d.get("sn", False),
        use_kp=d.get("use_kp", False),
        num_kp=common["num_kp"],
    )


def build_atnet(config: dict) -> ATNet:
    jaco_net = _get(config, "train_params", "jaco_net", default="cnn")
    return ATNet(jaco_net=jaco_net)


def build_emotion_detector(config: dict | None = None, kind: str = "linear"):
    """kind: 'linear*' -> EmotionK, 'map*' -> EmotionMap (ref:demo.py:68-73).

    The reference hardcodes the constructor arguments (block_expansion 32,
    max_features 1024, num_blocks 5, scale 0.25); an optional
    ``model_params.emotion_params`` config section overrides them.
    """
    kwargs = dict(block_expansion=32, num_channels=3, max_features=1024,
                  num_blocks=5, scale_factor=0.25, num_classes=8)
    kwargs.update(_get(config or {}, "model_params", "emotion_params",
                       default={}))
    if kind.startswith("map"):
        return EmotionMap(**kwargs)
    return EmotionK(**kwargs)


def build_all(config: dict, emotion_kind: str = "linear") -> dict:
    return {
        "generator": build_generator(config),
        "kp_detector": build_kp_detector(config),
        "kp_detector_a": build_kp_detector_a(config),
        "audio_feature": build_atnet(config),
        "emo_detector": build_emotion_detector(config, emotion_kind),
        "discriminator": build_discriminator(config),
    }
