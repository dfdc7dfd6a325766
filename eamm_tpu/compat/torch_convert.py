"""Torch ``.pth.tar`` checkpoint -> flax variable-tree conversion.

The reference ships three torch checkpoints (FOMM generator+kp, audio,
emotion; ref:demo.py:82-95, ref:logger.py:44-50).  This module converts
their flat ``state_dict`` name/value maps into this framework's
``{'params': ..., 'batch_stats': ...}`` trees, handling:

- Conv2d  OIHW -> HWIO
- ConvTranspose2d [I,O,kh,kw] -> spatially flipped HWIO for the equivalent
  input-dilated convolution (see eamm_tpu.models.blocks.ConvTranspose)
- Conv1d  [O,I,k] -> [k,I,O]
- Linear  [O,I] -> [I,O], with channel re-ordering when the input is a
  flattened NCHW feature map (our layout flattens NHWC)
- BatchNorm weight/bias/running stats -> scale/bias + batch_stats
- LSTM packed torch weights -> per-layer w_ih/w_hh/b_ih/b_hh

Tensors are accepted as numpy arrays; ``load_torch_checkpoint`` uses torch
only to deserialize the file (torch-cpu is available in the image).
"""
from __future__ import annotations

from typing import Mapping

import numpy as np


Tree = dict


def load_torch_checkpoint(path: str) -> dict[str, dict[str, np.ndarray]]:
    """Load a .pth.tar into {module_name: {param_name: np.ndarray}}."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for module_name, sd in ckpt.items():
        if hasattr(sd, "items"):
            out[module_name] = {
                k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
                for k, v in sd.items()}
        else:
            out[module_name] = sd
    return out


def _strip_prefix(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Drop DataParallel 'module.' prefixes (ref:train.py:283-299)."""
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def _count(sd: Mapping[str, np.ndarray], fmt: str) -> int:
    """Number of consecutive indices i for which fmt.format(i) is a key."""
    i = 0
    while fmt.format(i) in sd:
        i += 1
    return i


# ---------------------------------------------------------------- primitives

def conv2d(sd, pfx, bias=True) -> Tree:
    out = {"kernel": sd[f"{pfx}.weight"].transpose(2, 3, 1, 0)}
    if bias and f"{pfx}.bias" in sd:
        out["bias"] = sd[f"{pfx}.bias"]
    return out


def conv1d(sd, pfx) -> Tree:
    out = {"kernel": sd[f"{pfx}.weight"].transpose(2, 1, 0)}
    if f"{pfx}.bias" in sd:
        out["bias"] = sd[f"{pfx}.bias"]
    return out


def conv_transpose2d(sd, pfx) -> Tree:
    w = sd[f"{pfx}.weight"]                       # [I, O, kh, kw]
    kernel = np.flip(w, (2, 3)).transpose(2, 3, 0, 1)   # [kh,kw,I,O]
    out = {"kernel": np.ascontiguousarray(kernel)}
    if f"{pfx}.bias" in sd:
        out["bias"] = sd[f"{pfx}.bias"]
    return out


def linear(sd, pfx, flatten_from_chw: tuple[int, int, int] | None = None) -> Tree:
    w = sd[f"{pfx}.weight"]                       # [O, I]
    if flatten_from_chw is not None:
        C, H, W = flatten_from_chw
        O = w.shape[0]
        w = w.reshape(O, C, H, W).transpose(0, 2, 3, 1).reshape(O, H * W * C)
    out = {"kernel": np.ascontiguousarray(w.T)}
    if f"{pfx}.bias" in sd:
        out["bias"] = sd[f"{pfx}.bias"]
    return out


def batchnorm(sd, pfx) -> tuple[Tree, Tree]:
    params = {"scale": sd[f"{pfx}.weight"], "bias": sd[f"{pfx}.bias"]}
    stats = {"mean": sd[f"{pfx}.running_mean"], "var": sd[f"{pfx}.running_var"]}
    return params, stats


def lstm(sd, pfx, num_layers=3) -> Tree:
    out = {}
    for l in range(num_layers):
        out[f"w_ih_l{l}"] = np.ascontiguousarray(sd[f"{pfx}.weight_ih_l{l}"].T)
        out[f"w_hh_l{l}"] = np.ascontiguousarray(sd[f"{pfx}.weight_hh_l{l}"].T)
        out[f"b_ih_l{l}"] = sd[f"{pfx}.bias_ih_l{l}"]
        out[f"b_hh_l{l}"] = sd[f"{pfx}.bias_hh_l{l}"]
    return out


class _TreeBuilder:
    """Collects params and batch_stats trees addressed by '/'-paths."""

    def __init__(self):
        self.params: Tree = {}
        self.stats: Tree = {}

    @staticmethod
    def _set(tree, path, value):
        parts = path.split("/")
        for p in parts[:-1]:
            tree = tree.setdefault(p, {})
        tree[parts[-1]] = value

    def add(self, path, leaf: Tree):
        for k, v in leaf.items():
            self._set(self.params, f"{path}/{k}", v)

    def add_bn(self, sd, torch_pfx, path):
        params, stats = batchnorm(sd, torch_pfx)
        for k, v in params.items():
            self._set(self.params, f"{path}/{k}", v)
        for k, v in stats.items():
            self._set(self.stats, f"{path}/{k}", v)

    def conv_block(self, sd, torch_pfx, path):
        """reference ``conv2d`` helper: Sequential(conv(no bias), bn, relu)."""
        self.add(f"{path}/conv", conv2d(sd, f"{torch_pfx}.0"))
        self.add_bn(sd, f"{torch_pfx}.1", f"{path}/norm")

    def block(self, sd, torch_pfx, path):
        """Same/Down/UpBlock: .conv + .norm."""
        self.add(f"{path}/conv", conv2d(sd, f"{torch_pfx}.conv"))
        self.add_bn(sd, f"{torch_pfx}.norm", f"{path}/norm")

    def hourglass(self, sd, torch_pfx, path, num_blocks=5):
        for i in range(num_blocks):
            self.block(sd, f"{torch_pfx}.encoder.down_blocks.{i}",
                       f"{path}/encoder/down{i}")
            self.block(sd, f"{torch_pfx}.decoder.up_blocks.{i}",
                       f"{path}/decoder/up{i}")

    def resblock(self, sd, torch_pfx, path):
        self.add(f"{path}/conv1", conv2d(sd, f"{torch_pfx}.conv1"))
        self.add(f"{path}/conv2", conv2d(sd, f"{torch_pfx}.conv2"))
        self.add_bn(sd, f"{torch_pfx}.norm1", f"{path}/norm1")
        self.add_bn(sd, f"{torch_pfx}.norm2", f"{path}/norm2")

    def done(self) -> dict:
        out = {"params": self.params}
        if self.stats:
            out["batch_stats"] = self.stats
        return out


# ------------------------------------------------------------------- models

def convert_kp_detector(sd: Mapping[str, np.ndarray],
                        num_blocks: int | None = None) -> dict:
    """ref torch names: predictor.*, kp.*, jacobian.* (modules/keypoint_detector.py).
    Architecture sizes are inferred from the state_dict when not given."""
    sd = _strip_prefix(sd)
    b = _TreeBuilder()
    num_blocks = num_blocks or _count(
        sd, "predictor.encoder.down_blocks.{}.conv.weight")
    b.hourglass(sd, "predictor", "predictor", num_blocks)
    b.add("head/kp", conv2d(sd, "kp"))
    if "jacobian.weight" in sd:
        b.add("head/jacobian", conv2d(sd, "jacobian"))
    return b.done()


def convert_kp_detector_a(sd: Mapping[str, np.ndarray]) -> dict:
    """KPDetector_a constructs an unused hourglass (ref:modules/
    keypoint_detector.py:120); only the conv heads are live."""
    sd = _strip_prefix(sd)
    b = _TreeBuilder()
    b.add("head/kp", conv2d(sd, "kp"))
    if "jacobian.weight" in sd:
        b.add("head/jacobian", conv2d(sd, "jacobian"))
    return b.done()


def convert_generator(sd: Mapping[str, np.ndarray],
                      num_down_blocks: int | None = None,
                      num_bottleneck_blocks: int | None = None,
                      dense_num_blocks: int | None = None) -> dict:
    sd = _strip_prefix(sd)
    b = _TreeBuilder()
    num_down_blocks = num_down_blocks or _count(
        sd, "down_blocks.{}.conv.weight")
    num_bottleneck_blocks = num_bottleneck_blocks or _count(
        sd, "bottleneck.r{}.conv1.weight")
    dense_num_blocks = dense_num_blocks or _count(
        sd, "dense_motion_network.hourglass.encoder.down_blocks.{}.conv.weight")
    b.block(sd, "first", "first")
    for i in range(num_down_blocks):
        b.block(sd, f"down_blocks.{i}", f"down{i}")
        b.block(sd, f"up_blocks.{i}", f"up{i}")
    for i in range(num_bottleneck_blocks):
        b.resblock(sd, f"bottleneck.r{i}", f"res{i}")
    b.add("final", conv2d(sd, "final"))
    dm = "dense_motion_network"
    b.hourglass(sd, f"{dm}.hourglass", f"{dm}/hourglass", dense_num_blocks)
    b.add(f"{dm}/mask", conv2d(sd, f"{dm}.mask"))
    if f"{dm}.occlusion.weight" in sd:
        b.add(f"{dm}/occlusion", conv2d(sd, f"{dm}.occlusion"))
    return b.done()


def _atnet_trunk(b: _TreeBuilder, sd) -> None:
    """The encoder/decoder trunk shared by AT_net and TF_net
    (ref:modules/util.py:203-304 and :321-511 declare identical
    down_blocks / pose_encoder / audio_eocder(+fc) / decon stacks)."""
    for i in range(8):
        b.block(sd, f"down_blocks.{i}", f"image_encoder/down{i}")
    b.add("pose_encoder/fc0", linear(sd, "pose_encoder.0"))
    b.add("pose_encoder/fc1", linear(sd, "pose_encoder.2"))
    # audio_eocder Sequential: conv2d blocks at 0,1,3,4,5 (maxpools at 2,6)
    for jax_i, torch_i in enumerate([0, 1, 3, 4, 5]):
        b.conv_block(sd, f"audio_eocder.{torch_i}", f"audio_encoder/conv{jax_i}")
    # fc after flattening a [B,512,12,2] NCHW map -> permute to NHWC order
    b.add("audio_encoder/fc0", linear(sd, "audio_eocder_fc.0",
                                      flatten_from_chw=(512, 12, 2)))
    b.add("audio_encoder/fc1", linear(sd, "audio_eocder_fc.2"))
    # decon Sequential: convT at 0,3,6,9,12; BN at 1,4,7,10
    for jax_i, torch_i in enumerate([0, 3, 6, 9, 12]):
        b.add(f"decoder/decon{jax_i}", conv_transpose2d(sd, f"decon.{torch_i}"))
    for jax_i, torch_i in enumerate([1, 4, 7, 10]):
        b.add_bn(sd, f"decon.{torch_i}", f"decoder/norm{jax_i}")


def convert_atnet(sd: Mapping[str, np.ndarray]) -> dict:
    """AT_net / AT_net2 (ref:modules/util.py:203-304,514-614)."""
    sd = _strip_prefix(sd)
    b = _TreeBuilder()
    _atnet_trunk(b, sd)
    b.add("lstm", lstm(sd, "lstm", 3))
    out = b.done()
    if "generator.conv1.conv.weight" in sd:   # jaco_net='gan' decoder
        out["params"]["generator"] = convert_stylegan2(sd, "generator")
    return out


def convert_tfnet(sd: Mapping[str, np.ndarray]) -> dict:
    """TF_net, 'concat' forward (ref:modules/util.py:321-511,480-511):
    the AT_net trunk plus the emotion-concat LSTM (``lstm_two``,
    1536->256).  The AdaIN branches' ``instance_norm``/``style_mod``
    weights are not mapped: the reference applies InstanceNorm to 1x1
    spatial maps there, which zeroes the content features (degenerate —
    see PARITY.md); this framework's AdaIN modes are a coherent redesign,
    so only the well-defined concat path converts."""
    sd = _strip_prefix(sd)
    b = _TreeBuilder()
    _atnet_trunk(b, sd)
    b.add("lstm_two", lstm(sd, "lstm_two", 3))
    return b.done()


def convert_stylegan2(sd: Mapping[str, np.ndarray], pfx: str = "",
                      size: int = 64, n_mlp: int = 8) -> Tree:
    """Vendored StyleGAN2 synthesis generator -> SynthesisGenerator params
    (ref:modules/stylegan2.py:447-638; used when jaco_net='gan').

    EqualLinear stores weight [out, in] (lr_mul folded at runtime on both
    sides) -> transpose.  ModulatedConv stores weight [1, O, I, k, k] ->
    HWIO (the upsample path's spatial flip happens at runtime on both
    sides).  FusedLeakyReLU bias [1, C, 1, 1] -> [C].
    """
    if pfx and not pfx.endswith("."):
        pfx += "."

    def eq_linear(p):
        return {"weight": np.ascontiguousarray(sd[f"{p}.weight"].T),
                "bias": sd[f"{p}.bias"]}

    def mod_conv(p):
        w = sd[f"{p}.weight"][0]                      # [O, I, kh, kw]
        return {"weight": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
                "modulation": eq_linear(f"{p}.modulation")}

    def styled_conv(p):
        return {"conv": mod_conv(f"{p}.conv"),
                "bias": sd[f"{p}.activate.bias"].reshape(-1)}

    def to_rgb(p):
        return {"conv": mod_conv(f"{p}.conv"),
                "bias": sd[f"{p}.bias"].reshape(-1)}

    import math
    params: Tree = {}
    # style MLP: Sequential [PixelNorm, EqualLinear x n_mlp] -> indices 1..n
    for i in range(n_mlp):
        params[f"style{i}"] = eq_linear(f"{pfx}style.{i + 1}")
    params["conv1"] = styled_conv(f"{pfx}conv1")
    params["to_rgb1"] = to_rgb(f"{pfx}to_rgb1")
    log_size = int(math.log2(size))
    for li in range(log_size - 2):
        params[f"conv_up{li}"] = styled_conv(f"{pfx}convs.{2 * li}")
        params[f"conv_same{li}"] = styled_conv(f"{pfx}convs.{2 * li + 1}")
        params[f"to_rgb_up{li}"] = to_rgb(f"{pfx}to_rgbs.{li}")
    return params


def _emotion_trunk(b: _TreeBuilder, sd, num_blocks=5):
    b.hourglass(sd, "predictor", "predictor", num_blocks)
    b.add("trunk/conv1", conv2d(sd, "conv1"))
    b.add_bn(sd, "bn1", "trunk/bn1")
    for li in range(1, 5):
        for bi in range(2):
            pfx = f"layer{li}.{bi}"
            path = f"trunk/layer{li}_{bi}"
            b.add(f"{path}/conv1", conv2d(sd, f"{pfx}.conv1"))
            b.add(f"{path}/conv2", conv2d(sd, f"{pfx}.conv2"))
            b.add_bn(sd, f"{pfx}.bn1", f"{path}/bn1")
            b.add_bn(sd, f"{pfx}.bn2", f"{path}/bn2")
            if f"{pfx}.downsample.0.weight" in sd:
                b.add(f"{path}/ds_conv", conv2d(sd, f"{pfx}.downsample.0"))
                b.add_bn(sd, f"{pfx}.downsample.1", f"{path}/ds_bn")


def _sub(sd: Mapping[str, np.ndarray], pfx: str) -> dict[str, np.ndarray]:
    """The sub-state_dict under ``pfx.`` (for composed modules)."""
    return {k[len(pfx) + 1:]: v for k, v in sd.items()
            if k.startswith(pfx + ".")}


def convert_ct_encoder(sd: Mapping[str, np.ndarray]) -> dict:
    """Ct_encoder (ref:modules/util.py:618-644): the AT_net audio conv
    stack + fc, mapped onto CtEncoder's inner AudioEncoder."""
    sd = _strip_prefix(sd)
    b = _TreeBuilder()
    for jax_i, torch_i in enumerate([0, 1, 3, 4, 5]):
        b.conv_block(sd, f"audio_eocder.{torch_i}", f"encoder/conv{jax_i}")
    b.add("encoder/fc0", linear(sd, "audio_eocder_fc.0",
                                flatten_from_chw=(512, 12, 2)))
    b.add("encoder/fc1", linear(sd, "audio_eocder_fc.2"))
    return b.done()


def convert_emotion_net(sd: Mapping[str, np.ndarray]) -> dict:
    """EmotionNet (ref:modules/util.py:647-712).  The flattened [512,1,6]
    map has a single spatial row, so torch's NCHW flatten equals this
    framework's (c, w) flatten — no permutation needed.  The dead
    ``last_fc``/``re_id*`` heads (commented out of the reference forward)
    are not mapped."""
    sd = _strip_prefix(sd)
    b = _TreeBuilder()
    for jax_i, torch_i in enumerate([0, 2, 3, 5]):
        b.conv_block(sd, f"emotion_eocder.{torch_i}", f"conv{jax_i}")
    b.add("fc0", linear(sd, "emotion_eocder_fc.0"))
    b.add("fc1", linear(sd, "emotion_eocder_fc.2"))
    return b.done()


def _decon_stack(b: _TreeBuilder, sd, n_deconv: int, pfx: str = "decon",
                 path: str = "") -> None:
    """A reference ``decon`` Sequential: ConvTranspose at 0,3,6,...; BN at
    1,4,7,... (the final ConvTranspose has no BN)."""
    p = (path + "/") if path else ""
    for i in range(n_deconv):
        b.add(f"{p}decon{i}", conv_transpose2d(sd, f"{pfx}.{3 * i}"))
        if i < n_deconv - 1:
            b.add_bn(sd, f"{pfx}.{3 * i + 1}", f"{p}norm{i}")


def convert_af2f(sd: Mapping[str, np.ndarray]) -> dict:
    """AF2F / AF2F_s (ref:modules/util.py:715-773): 5-deconv decoder."""
    sd = _strip_prefix(sd)
    b = _TreeBuilder()
    _decon_stack(b, sd, 5)
    return b.done()


convert_af2f_s = convert_af2f      # identical decon layout (final ReLU
                                   # carries no parameters)


def convert_a2i(sd: Mapping[str, np.ndarray]) -> dict:
    """A2I (ref:modules/util.py:776-813): conv blocks at 0,1,3,4 + 4-deconv."""
    sd = _strip_prefix(sd)
    b = _TreeBuilder()
    for jax_i, torch_i in enumerate([0, 1, 3, 4]):
        b.conv_block(sd, f"audio_eocder.{torch_i}", f"conv{jax_i}")
    _decon_stack(b, sd, 4)
    return b.done()


def convert_na_net(sd: Mapping[str, np.ndarray]) -> dict:
    """NA_net (ref:modules/util.py:175-201): 3-deconv decoder."""
    sd = _strip_prefix(sd)
    b = _TreeBuilder()
    _decon_stack(b, sd, 3)
    return b.done()


def convert_audio_feature(sd: Mapping[str, np.ndarray]) -> dict:
    """Audio_Feature (ref:modules/keypoint_detector.py:208-228):
    Ct_encoder + EmotionNet + AF2F_s composition."""
    sd = _strip_prefix(sd)

    def merge(tree, sub, key):
        for part, dst in (("params", tree.setdefault("params", {})),
                          ("batch_stats", tree.setdefault("batch_stats", {}))):
            if part in sub:
                dst[key] = sub[part]
        return tree

    out: dict = {}
    merge(out, convert_ct_encoder(_sub(sd, "con_encoder")), "con_encoder")
    merge(out, convert_emotion_net(_sub(sd, "emo_encoder")), "emo_encoder")
    merge(out, convert_af2f_s(_sub(sd, "decoder")), "decoder")
    return out


def convert_em_detector(sd: Mapping[str, np.ndarray],
                        num_blocks: int | None = None) -> dict:
    """EmDetector (ref:modules/util.py:1139-1216): the Emotion_k
    hourglass + ResNet trunk plus the 8-way classifier; the dead ``fc``
    head (commented out of the reference forward) is not mapped."""
    sd = _strip_prefix(sd)
    b = _TreeBuilder()
    num_blocks = num_blocks or _count(
        sd, "predictor.encoder.down_blocks.{}.conv.weight")
    _emotion_trunk(b, sd, num_blocks)
    b.add("classify", linear(sd, "classify.last_fc"))
    return b.done()


def convert_emotion_k(sd: Mapping[str, np.ndarray],
                      num_blocks: int | None = None) -> dict:
    """Emotion_k (ref:modules/util.py:1223-1527)."""
    sd = _strip_prefix(sd)
    b = _TreeBuilder()
    num_blocks = num_blocks or _count(
        sd, "predictor.encoder.down_blocks.{}.conv.weight")
    _emotion_trunk(b, sd, num_blocks)
    b.add("fc_p/fc0", linear(sd, "fc_p.0"))
    b.add("fc_p/fc1", linear(sd, "fc_p.2"))
    b.add("fc_n/fc0", linear(sd, "fc_n.0"))
    b.add("fc_n/fc1", linear(sd, "fc_n.2"))
    for i, t in enumerate([0, 2, 4]):
        b.add(f"fc_all/fc{i}", linear(sd, f"fc_all.{t}"))
    if "fc_single.0.weight" in sd:      # made-coherent linear_4 head
        b.add("fc_single/fc0", linear(sd, "fc_single.0"))
        b.add("fc_single/fc1", linear(sd, "fc_single.2"))
    b.add("classify", linear(sd, "classify.last_fc"))
    # final: Conv1d at 0,3,5 / final_4 at 0,3 / final_10 at 0,3
    b.add("final_c0/conv", conv1d(sd, "final.0"))
    b.add("final_c1/conv", conv1d(sd, "final.3"))
    b.add("final_c2/conv", conv1d(sd, "final.5"))
    if "final_4.0.weight" in sd:
        b.add("final4_c0/conv", conv1d(sd, "final_4.0"))
        b.add("final4_c1/conv", conv1d(sd, "final_4.3"))
    b.add("final10_c0/conv", conv1d(sd, "final_10.0"))
    b.add("final10_c1/conv", conv1d(sd, "final_10.3"))
    return b.done()


def convert_emotion_map(sd: Mapping[str, np.ndarray],
                        num_blocks: int | None = None) -> dict:
    """Emotion_map (ref:modules/util.py:1529-1737)."""
    sd = _strip_prefix(sd)
    b = _TreeBuilder()
    num_blocks = num_blocks or _count(
        sd, "predictor.encoder.down_blocks.{}.conv.weight")
    _emotion_trunk(b, sd, num_blocks)
    b.add("fc_p/fc0", linear(sd, "fc_p.0"))
    b.add("fc_p/fc1", linear(sd, "fc_p.2"))
    b.add("fc_all/fc0", linear(sd, "fc_all.0"))
    b.add("classify", linear(sd, "classify.last_fc"))
    for jax_i, torch_i in enumerate([0, 3, 6, 9]):
        b.add(f"decon{jax_i}", conv_transpose2d(sd, f"final.{torch_i}"))
    for jax_i, torch_i in enumerate([1, 4, 7]):
        b.add_bn(sd, f"final.{torch_i}", f"norm{jax_i}")
    b.add("head_10/kp", conv2d(sd, "kp"))
    b.add("head_10/jacobian", conv2d(sd, "jacobian"))
    b.add("head_4/kp", conv2d(sd, "kp_4"))
    b.add("head_4/jacobian", conv2d(sd, "jacobian_4"))
    return b.done()


def convert_discriminator(sd: Mapping[str, np.ndarray],
                          scales=None) -> dict:
    """Reference MultiScaleDiscriminator state dict -> variables
    (ref:modules/discriminator.py:36-95; spectral_norm stores weight_orig +
    the left power-iteration vector weight_u, which maps onto our SNConv's
    batch_stats 'u' — the reference FOMM checkpoint carries the
    discriminator for GAN fine-tune resume, ref:logger.py:60-73)."""
    sd = _strip_prefix(sd)
    if scales is None:   # derive from the 'discs.<scale>.' key prefixes
        tags = sorted({k.split(".")[1] for k in sd if k.startswith("discs.")})
        scales = [t.replace("-", ".") for t in tags]
        scales = [int(s) if "." not in s else float(s) for s in scales]
    b = _TreeBuilder()

    def sn_conv(torch_pfx, path):
        if f"{torch_pfx}.weight_orig" in sd:
            b.add(path, {"kernel": sd[f"{torch_pfx}.weight_orig"]
                         .transpose(2, 3, 1, 0),
                         "bias": sd[f"{torch_pfx}.bias"]})
            b._set(b.stats, f"{path}/u", sd[f"{torch_pfx}.weight_u"])
        else:
            b.add(path, conv2d(sd, torch_pfx))

    for scale in scales:
        t = f"discs.{str(scale).replace('.', '-')}"
        p = f"disc_{str(scale).replace('.', '-')}"
        i = 0
        while f"{t}.down_blocks.{i}.conv.weight" in sd \
                or f"{t}.down_blocks.{i}.conv.weight_orig" in sd:
            sn_conv(f"{t}.down_blocks.{i}.conv", f"{p}/down{i}/conv")
            if f"{t}.down_blocks.{i}.norm.weight" in sd:
                b._set(b.params, f"{p}/down{i}/in_scale",
                       sd[f"{t}.down_blocks.{i}.norm.weight"])
                b._set(b.params, f"{p}/down{i}/in_bias",
                       sd[f"{t}.down_blocks.{i}.norm.bias"])
            i += 1
        sn_conv(f"{t}.conv", f"{p}/conv")
    out = b.done()
    out.setdefault("batch_stats", {})
    return out
