"""MFCC frontend vs a numpy oracle of python_speech_features.mfcc defaults
(winlen .025, winstep .01, numcep 13, nfilt 26, nfft 512, preemph .97,
lifter 22, appendEnergy, rectangular window) — the exact call the reference
makes at ref:demo.py:318 / ref:process_data.py:135."""
import numpy as np
import scipy.fft
import jax.numpy as jnp

from eamm_tpu.ops import mfcc, mfcc_windows, audio_to_mfcc_windows
from eamm_tpu.ops.mfcc import num_mfcc_frames, num_windows
import pytest


pytestmark = pytest.mark.smoke

def np_mfcc(signal, samplerate=16000):
    winlen, winstep = 0.025, 0.01
    nfft, nfilt, numcep, ceplifter = 512, 26, 13, 22
    preemph = 0.97
    # preemphasis
    signal = np.append(signal[0], signal[1:] - preemph * signal[:-1])
    # framing
    frame_len = int(round(winlen * samplerate))
    frame_step = int(round(winstep * samplerate))
    slen = len(signal)
    if slen <= frame_len:
        numframes = 1
    else:
        numframes = 1 + int(np.ceil((1.0 * slen - frame_len) / frame_step))
    padlen = int((numframes - 1) * frame_step + frame_len)
    padsignal = np.concatenate((signal, np.zeros(padlen - slen)))
    indices = (np.tile(np.arange(0, frame_len), (numframes, 1))
               + np.tile(np.arange(0, numframes * frame_step, frame_step),
                         (frame_len, 1)).T)
    frames = padsignal[indices]
    # power spectrum
    pspec = 1.0 / nfft * np.square(np.abs(np.fft.rfft(frames, nfft)))
    energy = np.sum(pspec, 1)
    energy = np.where(energy == 0, np.finfo(np.float64).eps, energy)
    # mel filterbank
    def hz2mel(hz):
        return 2595 * np.log10(1 + hz / 700.0)

    def mel2hz(mel):
        return 700 * (10 ** (mel / 2595.0) - 1)

    highfreq = samplerate / 2
    melpoints = np.linspace(hz2mel(0), hz2mel(highfreq), nfilt + 2)
    bin = np.floor((nfft + 1) * mel2hz(melpoints) / samplerate)
    fbank = np.zeros([nfilt, nfft // 2 + 1])
    for j in range(nfilt):
        for i in range(int(bin[j]), int(bin[j + 1])):
            fbank[j, i] = (i - bin[j]) / (bin[j + 1] - bin[j])
        for i in range(int(bin[j + 1]), int(bin[j + 2])):
            fbank[j, i] = (bin[j + 2] - i) / (bin[j + 2] - bin[j + 1])
    feat = np.dot(pspec, fbank.T)
    feat = np.where(feat == 0, np.finfo(np.float64).eps, feat)
    feat = np.log(feat)
    feat = scipy.fft.dct(feat, type=2, axis=1, norm="ortho")[:, :numcep]
    n = np.arange(numcep)
    lift = 1 + (ceplifter / 2.0) * np.sin(np.pi * n / ceplifter)
    feat = lift * feat
    feat[:, 0] = np.log(energy)
    return feat


def test_mfcc_matches_oracle():
    rng = np.random.RandomState(0)
    sig = rng.randn(16000).astype(np.float32) * 0.1  # 1 s of noise
    ours = np.asarray(mfcc(jnp.asarray(sig)))
    ref = np_mfcc(sig.astype(np.float64))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)


def test_mfcc_golden_vector():
    """Pinned float64-derived values for a 30 ms 1 kHz cosine (2 frames).

    Derived once from the audited oracle above at float64; hardcoded so the
    jax implementation and the in-file oracle cannot drift together.  The
    constant-by-constant audit vs the published python_speech_features
    source lives in the eamm_tpu/ops/mfcc.py module docstring.
    """
    t = np.arange(480) / 16000.0
    sig = np.cos(2 * np.pi * 1000.0 * t).astype(np.float32)
    golden = np.array([
        [2.7313466, -3.17523693, -16.9037009, -29.98938097, -8.62911928,
         20.28014545, 28.31154428, 4.55892341, -22.31792712, -25.31335459,
         -2.77878332, 17.27836534, 15.61339112],
        [2.47535253, 19.95154009, -19.63221411, -32.00167159, -10.1640156,
         20.33081106, 27.44741469, 4.33265794, -21.52695914, -23.61716691,
         -2.28591608, 16.14658459, 13.76300669]])
    ours = np.asarray(mfcc(jnp.asarray(sig)))
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=1e-5)
    # golden was derived from the float64 signal; the f32 input cast above
    # moves the oracle by ~2e-6
    oracle = np_mfcc(sig.astype(np.float64))
    np.testing.assert_allclose(oracle, golden, atol=1e-5)


def test_mfcc_frame_count():
    assert num_mfcc_frames(16000) == 1 + int(np.ceil((16000 - 400) / 160))
    assert num_mfcc_frames(300) == 1


def test_window_slicing_matches_reference_loop():
    rng = np.random.RandomState(1)
    M = 200
    feats = rng.randn(M, 13).astype(np.float32)

    # reference loop (ref:demo.py:324-333)
    windows, ind = [], 3
    while ind <= int(M / 4) - 4:
        windows.append(feats[(ind - 3) * 4:(ind + 4) * 4, 1:])
        ind += 1
    ref = np.stack(windows)

    ours = np.asarray(mfcc_windows(jnp.asarray(feats)))
    assert num_windows(M) == len(windows)
    np.testing.assert_allclose(ours, ref)
    assert ours.shape == (len(windows), 28, 12)


def test_audio_to_mfcc_windows_25fps():
    # 1 second of 16 kHz audio (+2x1920 pad) should give ~25 windows.
    sig = jnp.zeros(16000)
    w = audio_to_mfcc_windows(sig)
    assert w.shape[1:] == (28, 12)
    assert 24 <= w.shape[0] <= 28
