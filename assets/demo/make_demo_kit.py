"""Generate the checked-in smoke-demo kit (deterministic, synthetic).

The reference ships a de-facto smoke test as sample data — portraits,
poses, audio, emotion clips under ref:test/ consumed by the demo defaults
(ref:demo.py:536-541).  This kit is the equivalent for `eamm-demo --smoke`:
a synthetic face-like portrait, a single-frame pose + a long pose
trajectory, a 2 s speech-shaped waveform, and a 6-frame emotion clip —
all generated here (no real-person data, fully redistributable).

Run from the repo root:  python assets/demo/make_demo_kit.py
"""
import os

import numpy as np


def synth_portrait(rng) -> np.ndarray:
    """A 256x256 face-like image: skin-tone oval + eyes + mouth on a
    gradient background, plus mild texture noise so keypoint heatmaps and
    warps have structure to latch onto."""
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
    img = np.stack([0.25 + 0.2 * yy / 255, 0.3 + 0.15 * xx / 255,
                    0.45 - 0.1 * yy / 255], -1)
    face = (((xx - 128) / 78) ** 2 + ((yy - 130) / 102) ** 2) < 1.0
    img[face] = (0.83, 0.66, 0.55)
    for ex in (96, 160):                                   # eyes
        eye = (((xx - ex) / 14) ** 2 + ((yy - 104) / 8) ** 2) < 1.0
        pup = (((xx - ex) / 5) ** 2 + ((yy - 104) / 5) ** 2) < 1.0
        img[eye] = (0.95, 0.95, 0.95)
        img[pup] = (0.15, 0.1, 0.1)
    brow = (np.abs(yy - 86) < 3) & (np.abs(xx - 128) > 18) \
        & (np.abs(xx - 128) < 48)
    img[brow] = (0.25, 0.18, 0.12)
    nose = (np.abs(xx - 128) < 5) & (yy > 110) & (yy < 150)
    img[nose] = (0.7, 0.52, 0.42)
    mouth = (((xx - 128) / 30) ** 2 + ((yy - 185) / 10) ** 2) < 1.0
    img[mouth] = (0.65, 0.25, 0.25)
    img += 0.02 * rng.randn(256, 256, 3).astype(np.float32)
    return np.clip(img, 0, 1)


def synth_speech(rng, seconds=2.0, sr=16000) -> np.ndarray:
    """Speech-shaped audio: a wandering fundamental + harmonics, amplitude
    gated into syllable-like bursts (gives the MFCC frontend real temporal
    structure, unlike white noise)."""
    t = np.arange(int(seconds * sr)) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 1.7 * t) \
        + 15 * np.sin(2 * np.pi * 0.45 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    wave = (np.sin(phase) + 0.5 * np.sin(2 * phase)
            + 0.25 * np.sin(3 * phase))
    syllables = 0.5 * (1 + np.sign(np.sin(2 * np.pi * 3.1 * t + 0.4)))
    envelope = syllables * (0.6 + 0.4 * np.sin(2 * np.pi * 0.9 * t))
    wave = wave * envelope + 0.02 * rng.randn(t.size)
    return (0.4 * wave / np.abs(wave).max()).astype(np.float32)


def main():
    import imageio.v2 as imageio
    from scipy.io import wavfile
    out = os.path.dirname(os.path.abspath(__file__))
    rng = np.random.RandomState(7)

    portrait = synth_portrait(rng)
    imageio.imwrite(os.path.join(out, "portrait.png"),
                    (portrait * 255).astype(np.uint8))

    # single-frame pose (the 3DDFA 7-vector: yaw,pitch,roll,s,t3d) and a
    # 93-frame trajectory for --pose_long (matches ref:test/pose_long/*)
    pose = np.array([[0.02, -0.05, 0.01, 1.0, 128.0, 128.0, 60.0]],
                    np.float32)
    np.save(os.path.join(out, "pose.npy"), pose)
    t = np.linspace(0, 2 * np.pi, 93).astype(np.float32)
    traj = np.stack([0.02 + 0.15 * np.sin(t), -0.05 + 0.1 * np.sin(1.3 * t),
                     0.01 + 0.05 * np.sin(0.7 * t), np.full(93, 1.0, "f4"),
                     128 + 4 * np.sin(t), 128 + 3 * np.cos(t),
                     np.full(93, 60.0, "f4")], axis=1)
    np.save(os.path.join(out, "pose_long.npy"), traj)

    wave = synth_speech(rng)
    wavfile.write(os.path.join(out, "speech.wav"), 16000,
                  (wave * 32767).astype(np.int16))

    # 6-frame emotion clip: the portrait with a widening mouth + slight
    # brightness drift (mouth region is what the emotion branch masks)
    frames = []
    for i in range(6):
        f = portrait.copy()
        yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
        open_ = 6 + 3 * i
        mouth = (((xx - 128) / 30) ** 2 + ((yy - 185) / open_) ** 2) < 1.0
        f[mouth] = (0.4, 0.12, 0.12)
        frames.append(np.clip(f * (1.0 + 0.01 * i), 0, 1))
    np.save(os.path.join(out, "emotion_clip.npy"),
            (np.stack(frames) * 255).astype(np.uint8))
    print("demo kit written to", out)


if __name__ == "__main__":
    main()
