"""Inference CLI — flag-compatible with the reference demo
(ref:demo.py:524-561).

    python -m eamm_tpu.cli.demo --config ... --checkpoint fomm.pth.tar \
        --audio_checkpoint audio.pth.tar --emo_checkpoint emo.pth.tar \
        --source_image img.png --driving_video emo.mp4 \
        --pose_file pose.npy --in_file audio.wav --emotion happy

Outputs neutral.mp4, emotion.mp4 and the three-panel all.mp4 into
--result_path (falls back to PNG frames + .npy when no mp4 writer is
available in the environment).
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np


def _str2bool(v):
    return str(v).lower() not in ("false", "0", "none", "")


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--smoke", action="store_true",
                        help="one-command end-to-end smoke run: random "
                             "weights (configs/smoke.yaml) over the "
                             "checked-in kit in assets/demo/ — the "
                             "equivalent of the reference's bundled sample "
                             "inputs (ref:test/, ref:demo.py:536-541); any "
                             "explicitly passed flag still wins")
    parser.add_argument("--config", default=None, help="path to config yaml")
    parser.add_argument("--checkpoint", default=None,
                        help="FOMM (generator+kp_detector) torch checkpoint")
    parser.add_argument("--audio_checkpoint", default=None,
                        help="audio (audio_feature+kp_detector_a) checkpoint")
    parser.add_argument("--emo_checkpoint", default=None,
                        help="emotion displacement checkpoint")
    parser.add_argument("--source_image", default=None)
    parser.add_argument("--driving_video", default=None,
                        help="emotion-source video (required for --add_emo)")
    parser.add_argument("--in_file", default=None, help="driving audio")
    parser.add_argument("--pose_file", default=None, help="[N,7] pose npy")
    parser.add_argument("--pose_given", default=None,
                        help="long pose trajectory npy for --pose_long")
    parser.add_argument("--result_path", default="result/")
    parser.add_argument("--relative", action="store_true")
    parser.add_argument("--adapt_scale", action="store_true")
    parser.add_argument("--smooth_pose", type=_str2bool, default=True)
    parser.add_argument("--pose_long", type=_str2bool, default=False)
    parser.add_argument("--add_emo", type=_str2bool, default=True)
    parser.add_argument("--check_add", type=_str2bool, default=False)
    parser.add_argument("--type", default="linear_3", dest="emo_type")
    parser.add_argument("--emotion", default="disgusted",
                        choices=["angry", "contempt", "disgusted", "fear",
                                 "happy", "neutral", "sad", "surprised"])
    parser.add_argument("--weight", type=float, default=1.6,
                        help="audio feature exaggeration (ref hardcodes 1.6)")
    parser.add_argument("--kp_loss", default=0,
                        help="accepted for reference-CLI parity (unused "
                             "there too, ref:demo.py:549)")
    parser.add_argument("--no_crop", action="store_true",
                        help="source image is already aligned to 256x256")
    parser.add_argument("--no_align", action="store_true",
                        help="emotion video frames are already aligned "
                             "(skip the landmark-based per-frame alignment)")
    parser.add_argument("--cpu", action="store_true")
    # Production delivery options (no reference equivalent: the reference
    # renders frame-at-a-time on host, ref:demo.py:212-281).
    parser.add_argument("--transfer_format", default="rgb",
                        choices=["rgb", "yuv420"],
                        help="ship frames off-device as RGB uint8 (bit-exact)"
                             " or yuv420p planes (mp4-native, half the bytes"
                             " over a bandwidth-limited link)")
    parser.add_argument("--overlap_segments", type=int, default=1,
                        help="render the clip as N pipelined segment "
                             "dispatches whose device->host fetch overlaps "
                             "the next segment's compute (bitwise-identical "
                             "output; 1 = single whole-clip dispatch)")
    parser.add_argument("--bf16", action="store_true",
                        help="run the generator decode in bfloat16 "
                             "(visually lossless; keypoint path stays f32)")
    parser.add_argument("--segment_frames", type=int, default=0,
                        help="unbounded streaming: process the clip in "
                             "fixed chunks of this many frames (one "
                             "compiled program pair for ANY clip length, "
                             "O(chunk) device memory); 0 = whole-clip "
                             "programs")
    parser.add_argument("--stream_policy_frames", type=int, default=384,
                        help="with --segment_frames: clips at most this "
                             "many frames keep the ~2x-faster whole-clip "
                             "programs; longer clips take the chunk "
                             "programs (0 = always chunk)")
    return parser


def smooth_pose_graft(pose_file: str, pose_long: str) -> np.ndarray:
    """Graft a long pose trajectory onto the source's start pose
    (ref:demo.py:456-465)."""
    start = np.load(pose_file).reshape(-1, 7)
    video_pose = np.load(pose_long).reshape(-1, 7)
    delta = video_pose - video_pose[0:1]
    return np.repeat(start[:1], len(delta), axis=0) + delta


def read_video(path: str) -> np.ndarray:
    if path.endswith(".npy"):   # raw frame array (backend-free environments)
        arr = np.load(path)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        return arr[..., :3]
    import imageio.v2 as imageio
    reader = imageio.get_reader(path)
    frames = []
    try:
        for frame in reader:
            frames.append(np.asarray(frame, np.float32) / 255.0)
    except (RuntimeError, IndexError):
        pass
    reader.close()
    return np.array(frames)[..., :3]


def video_fps(path: str | None, default: float = 25.0) -> float:
    """fps of a video file; ``default`` for npy arrays / unreadable files.
    The reference writes neutral/emotion.mp4 at the driving video's fps
    (ref:demo.py:480,507,514)."""
    if not path or path.endswith(".npy"):
        return default
    try:
        import imageio.v2 as imageio
        reader = imageio.get_reader(path)
        fps = reader.get_meta_data().get("fps", default)
        reader.close()
        return float(fps)
    except Exception:
        return default


def write_video(path: str, frames_uint8: np.ndarray, fps: float = 25.0,
                audio=None):
    """mp4 via imageio when a backend exists (audio then remuxed by
    ``add_audio``/ffmpeg); otherwise a playable uncompressed AVI from the
    native muxer (no codec/ffmpeg needed, native/avi_writer.cc) with the
    driving audio muxed in as a PCM stream — the reference's product is a
    talking face *with sound* (ref:demo.py:427-431); PNG frames + npy as
    the last resort."""
    try:
        import imageio.v2 as imageio
        imageio.mimsave(path, list(frames_uint8), fps=fps)
        return path
    except Exception:
        pass
    try:
        from eamm_tpu.data.native import write_avi_rgb
        return write_avi_rgb(os.path.splitext(path)[0] + ".avi",
                             frames_uint8, fps=fps, audio=audio)
    except Exception:
        # dump PNG frames + raw npy
        stem = os.path.splitext(path)[0]
        os.makedirs(stem, exist_ok=True)
        np.save(stem + ".npy", frames_uint8)
        import imageio.v2 as imageio
        for i, frame in enumerate(frames_uint8):
            imageio.imwrite(os.path.join(stem, f"{i}.png"), frame)
        return stem


def add_audio(video_path: str, audio_path: str):
    """ffmpeg remux (ref:demo.py:427-431); silently skipped without ffmpeg,
    for non-video outputs (PNG-dir fallback), and whenever the remux target
    would equal the input (never clobber the just-written file)."""
    import shutil
    import subprocess
    if shutil.which("ffmpeg") is None or not os.path.isfile(video_path):
        return
    out = os.path.splitext(video_path)[0] + ".mov"
    if os.path.abspath(out) == os.path.abspath(video_path):
        return
    subprocess.run(["ffmpeg", "-i", video_path, "-i", audio_path, "-vcodec",
                    "copy", "-acodec", "copy", "-y", out], check=False)


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _apply_smoke_defaults(opt):
    """Fill unset flags from the checked-in kit (assets/demo/) + the small
    smoke config; runs with random weights when no checkpoints are given."""
    kit = os.path.join(REPO_ROOT, "assets", "demo")
    defaults = {
        "config": os.path.join(REPO_ROOT, "configs", "smoke.yaml"),
        "source_image": os.path.join(kit, "portrait.png"),
        "in_file": os.path.join(kit, "speech.wav"),
        "pose_file": os.path.join(kit, "pose.npy"),
        "driving_video": os.path.join(kit, "emotion_clip.npy"),
    }
    for key, value in defaults.items():
        if getattr(opt, key) is None:
            setattr(opt, key, value)
    # the kit's emotion clip is already aligned/synthetic; the portrait is
    # already 256x256
    opt.no_crop = True
    opt.no_align = True
    return opt


def main(argv=None):
    opt = build_parser().parse_args(argv)
    if opt.smoke:
        opt = _apply_smoke_defaults(opt)
    else:
        missing = [f for f in ("config", "checkpoint", "audio_checkpoint",
                               "emo_checkpoint", "source_image", "in_file",
                               "pose_file") if getattr(opt, f) is None]
        if missing:
            raise SystemExit(
                "missing required arguments: "
                + ", ".join(f"--{m}" for m in missing)
                + " (or pass --smoke for the self-contained demo)")

    if opt.cpu:
        # must precede the first jax backend query (one-shot; the container
        # may pin a TPU plugin as default platform — CLAUDE.md gotcha)
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError as e:
            import warnings
            warnings.warn(f"--cpu requested but jax backends already "
                          f"initialized: {e}")

    from eamm_tpu.config import load_config
    from eamm_tpu.data.preprocess import crop_image, align_clip, load_audio
    from eamm_tpu.data.augmentation import AllAugmentationTransform
    from eamm_tpu.infer import EammPipeline, PipelineOptions

    config = load_config(opt.config)
    import jax.numpy as jnp
    options = PipelineOptions(relative=opt.relative,
                              adapt_scale=opt.adapt_scale,
                              add_emo=opt.add_emo, emo_type=opt.emo_type,
                              audio_weight=opt.weight,
                              smooth_pose=opt.smooth_pose,
                              check_add=opt.check_add,
                              transfer_format=opt.transfer_format,
                              overlap_segments=max(1, opt.overlap_segments),
                              segment_frames=opt.segment_frames or None,
                              stream_policy_frames=(
                                  opt.stream_policy_frames or None),
                              compute_dtype=(jnp.bfloat16 if opt.bf16
                                             else jnp.float32))
    if opt.checkpoint is None:
        # --smoke without checkpoints: random weights, real pipeline
        pipe = EammPipeline.from_random(config, options=options)
    else:
        # Checkpoint pre-flight: diff each .pth.tar's key inventory against
        # the converters' expectations BEFORE conversion, so a renamed /
        # incomplete checkpoint fails with a full report instead of a bare
        # KeyError (ref:logger.py:52-81's by-name loading contract).
        from eamm_tpu.compat.preflight import check_state_dict
        for path in (opt.checkpoint, opt.audio_checkpoint,
                     opt.emo_checkpoint):
            report = check_state_dict(path)
            if report.fatal:
                raise SystemExit(str(report))
            if not report.ok:
                print(report)

        pipe = EammPipeline.from_torch_checkpoints(
            config, opt.checkpoint, opt.audio_checkpoint, opt.emo_checkpoint,
            options)

    # ---- inputs
    import imageio.v2 as imageio
    src = np.asarray(imageio.imread(opt.source_image), np.float32) / 255.0
    src = src[..., :3]
    if not opt.no_crop:
        src = crop_image(src)
    if src.shape[:2] != (256, 256):
        raise SystemExit("source image must be 256x256 (use alignment crop)")

    all_pose = np.load(opt.pose_file).reshape(-1, 7)
    if opt.pose_long:
        all_pose = smooth_pose_graft(opt.pose_file, opt.pose_given)

    waveform = load_audio(opt.in_file)

    transformed = None
    driving = None
    if opt.add_emo:
        if not opt.driving_video:
            raise SystemExit("--add_emo requires --driving_video")
        driving = read_video(opt.driving_video)
        if not opt.no_align:
            # template shifted [0,-10] for surprised/fear (ref:demo.py:159-160)
            shift = (0, 10) if opt.emotion in ("surprised", "fear") else (0, 0)
            driving = align_clip(driving, shift=shift)
        aug = AllAugmentationTransform(
            **config["dataset_params"]["augmentation_params"])
        transformed = np.asarray(aug(driving))

    os.makedirs(opt.result_path, exist_ok=True)

    # ---- neutral + emotional passes (ref:demo.py:504-514); neutral and
    # emotion play at the driving video's fps, all.mp4 at 25
    # (ref:demo.py:480,507,514,425)
    out_fps = video_fps(opt.driving_video)
    neutral = pipe.render_uint8(src, waveform, all_pose, add_emo=False)
    write_video(os.path.join(opt.result_path, "neutral.mp4"), neutral,
                fps=out_fps)
    outputs = {"neutral": neutral}
    if opt.add_emo:
        emotion = pipe.render_uint8(src, waveform, all_pose,
                                    transformed_video=transformed,
                                    add_emo=True)
        path = write_video(os.path.join(opt.result_path, "emotion.mp4"),
                           emotion, fps=out_fps, audio=(waveform, 16000))
        add_audio(path, opt.in_file)
        outputs["emotion"] = emotion
        T = len(emotion)
        drv = np.resize(driving, (T,) + driving.shape[1:])
        drv8 = np.clip(np.round(drv * 255), 0, 255).astype(np.uint8)
        allv = np.concatenate([drv8, np.resize(neutral, emotion.shape),
                               emotion], axis=2)
        all_path = write_video(os.path.join(opt.result_path, "all.mp4"),
                               allv, fps=25.0, audio=(waveform, 16000))
        add_audio(all_path, opt.in_file)
    print({k: v.shape for k, v in outputs.items()})
    return outputs


if __name__ == "__main__":
    main()
