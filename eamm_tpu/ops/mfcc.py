"""Jittable MFCC audio frontend.

The reference computes MFCCs on the host with ``python_speech_features.mfcc``
(ref:process_data.py:130-147, ref:demo.py:314-318) and then slices per-video-
frame windows of 28 MFCC frames x 12 cepstra in a Python loop
(ref:demo.py:324-333).  Here the whole frontend — pre-emphasis, framing,
FFT power spectrum, mel filterbank, DCT-II, liftering, energy replacement,
window slicing — is one fused XLA program, so audio -> network-ready windows
runs on-device as part of the inference pipeline.

Numerical semantics follow python_speech_features defaults as invoked by the
reference: winlen 0.025, winstep 0.01, numcep 13, nfilt 26, nfft 512,
preemph 0.97, ceplifter 22, appendEnergy True, rectangular window.

Constant-by-constant audit vs the published python_speech_features source
(round 4; the library itself is not installed here):

- frame length/step: the library applies decimal ROUND_HALF_UP to
  winlen*rate; 0.025*16000 = 400 and 0.01*16000 = 160 are exact, so the
  rounding mode is unreachable for the reference's invocation.
- frame count: 1 for n <= 400, else 1 + ceil((n - 400)/160)  — matches
  ``framesig``; the signal is zero-padded to (nframes-1)*160 + 400.
- pre-emphasis runs BEFORE framing with y[0] = x[0], coeff 0.97.
- window: default winfunc is all-ones (rectangular), a multiplicative no-op.
- power spectrum: (1/512) * |rfft(frames, 512)|^2.
- energy = sum over bins; 0 -> eps.  DEVIATION: the library uses float64
  eps (2.2e-16), we use float32 eps (1.2e-7).  Only exactly-silent frames
  hit this branch, and only cepstrum 0 is affected (a constant log(eps)
  row DCTs entirely into coefficient 0), which every consumer drops
  (ref:frames_dataset.py:159, ref:demo.py:329) — immaterial downstream.
- mel filterbank: 28 points linspaced in mel between 0 and hz2mel(8000),
  bin = floor(513 * hz / 16000), triangles over integer bins; coincident
  bins yield empty ranges (no division by zero), identical to the library.
- log is natural; DCT-II with norm='ortho', first 13 coefficients kept.
- lifter taps 1 + 11*sin(pi*n/22), applied before the energy replacement
  feat[:, 0] = log(energy) — same order as the library.

Golden vector: tests/test_ops_mfcc.py::test_mfcc_golden_vector pins the
full [2, 13] output for a 30 ms 1 kHz cosine against float64 hand-derived
values.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
PAD_SAMPLES = 1920      # zeros inserted before/after the clip (ref:demo.py:316-317)
WIN_LEN = 400           # 25 ms @ 16 kHz
WIN_STEP = 160          # 10 ms @ 16 kHz
NFFT = 512
NFILT = 26
NUMCEP = 13
CEPLIFTER = 22


def _hz2mel(hz):
    return 2595.0 * np.log10(1.0 + hz / 700.0)


def _mel2hz(mel):
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(nfilt: int = NFILT, nfft: int = NFFT,
                   samplerate: int = SAMPLE_RATE,
                   lowfreq: float = 0.0, highfreq: float | None = None) -> np.ndarray:
    """[nfilt, nfft//2+1] triangular mel filterbank (host-side constant)."""
    highfreq = highfreq or samplerate / 2
    melpoints = np.linspace(_hz2mel(lowfreq), _hz2mel(highfreq), nfilt + 2)
    bins = np.floor((nfft + 1) * _mel2hz(melpoints) / samplerate)
    fbank = np.zeros((nfilt, nfft // 2 + 1), dtype=np.float64)
    for j in range(nfilt):
        for i in range(int(bins[j]), int(bins[j + 1])):
            fbank[j, i] = (i - bins[j]) / (bins[j + 1] - bins[j])
        for i in range(int(bins[j + 1]), int(bins[j + 2])):
            fbank[j, i] = (bins[j + 2] - i) / (bins[j + 2] - bins[j + 1])
    return fbank.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dct_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Orthonormal DCT-II matrix [n_in, n_out] (scipy.fft.dct type 2, norm='ortho')."""
    # Orthonormal DCT-II: X_k = f(k) * sum_n x_n cos(pi k (2n+1) / (2N)),
    # f(0) = sqrt(1/N), f(k>0) = sqrt(2/N).
    k = np.arange(n_out)[None, :]
    n = np.arange(n_in)[:, None]
    f = np.full((n_out,), np.sqrt(2.0 / n_in))
    f[0] = np.sqrt(1.0 / n_in)
    mat = np.cos(np.pi * k * (2.0 * n + 1) / (2.0 * n_in)) * f[None, :]
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _lifter_taps(numcep: int = NUMCEP, L: int = CEPLIFTER) -> np.ndarray:
    n = np.arange(numcep)
    return (1.0 + (L / 2.0) * np.sin(np.pi * n / L)).astype(np.float32)


def num_mfcc_frames(n_samples: int) -> int:
    """Frame count produced by python_speech_features framing for a signal of
    ``n_samples`` (static shape helper)."""
    if n_samples <= WIN_LEN:
        return 1
    return 1 + int(np.ceil((n_samples - WIN_LEN) / float(WIN_STEP)))


def _mfcc_from_emph(emph: jnp.ndarray, nframes: int) -> jnp.ndarray:
    """[*] pre-emphasized samples -> [nframes, 13] MFCC rows (row r reads
    emph[r*WIN_STEP : r*WIN_STEP + WIN_LEN]; each row is independent, so
    chunked evaluation over sample slices equals the whole-signal result)."""
    # Frame: [nframes, WIN_LEN] strided windows (rectangular window).
    idx = (np.arange(WIN_LEN)[None, :]
           + WIN_STEP * np.arange(nframes)[:, None])
    frames = emph[idx]
    # Power spectrum: (1/NFFT) |rfft|^2 with zero-padding to NFFT.
    spec = jnp.fft.rfft(frames, n=NFFT, axis=1)
    pspec = (spec.real ** 2 + spec.imag ** 2) / NFFT
    energy = jnp.sum(pspec, axis=1)
    energy = jnp.where(energy == 0, np.finfo(np.float32).eps, energy)
    # Mel filterbank -> log -> DCT-II(ortho) -> lifter.
    fb = jnp.asarray(mel_filterbank())
    feat = pspec @ fb.T
    feat = jnp.where(feat == 0, np.finfo(np.float32).eps, feat)
    feat = jnp.log(feat)
    feat = feat @ jnp.asarray(_dct_matrix(NFILT, NUMCEP))
    feat = feat * jnp.asarray(_lifter_taps())
    feat = feat.at[:, 0].set(jnp.log(energy))
    return feat


def mfcc(signal: jnp.ndarray) -> jnp.ndarray:
    """MFCC features of a 1-D [N] signal -> [num_frames, 13].

    Column 0 is log frame energy (appendEnergy=True); the reference drops it
    at load time (ref:frames_dataset.py:159, ref:demo.py:329).
    """
    signal = signal.astype(jnp.float32)
    n = signal.shape[0]
    # Pre-emphasis: y[0] = x[0]; y[t] = x[t] - 0.97 x[t-1].
    emph = jnp.concatenate([signal[:1], signal[1:] - 0.97 * signal[:-1]])
    nframes = num_mfcc_frames(n)
    padlen = (nframes - 1) * WIN_STEP + WIN_LEN
    emph = jnp.pad(emph, (0, max(0, padlen - n)))
    return _mfcc_from_emph(emph, nframes)


def num_windows(n_mfcc_frames: int) -> int:
    """Number of 28-frame windows the reference's slicing loop produces
    (ref:demo.py:324-333): ind runs 3 .. floor(M/4)-4 inclusive."""
    return max(0, n_mfcc_frames // 4 - 6)


def mfcc_windows(feats: jnp.ndarray) -> jnp.ndarray:
    """Slice [M, 13] MFCC frames into [T, 28, 12] per-video-frame windows.

    Window t covers mfcc rows [t*4 : t*4+28] with cepstrum 0 dropped; this is
    exactly ``mfcc[(ind-3)*4:(ind+4)*4, 1:]`` for ind = t+3
    (ref:demo.py:329).
    """
    M = feats.shape[0]
    T = num_windows(M)
    idx = (np.arange(28)[None, :] + 4 * np.arange(T)[:, None])  # [T, 28]
    return feats[idx][:, :, 1:]


def audio_to_mfcc_windows(signal: jnp.ndarray) -> jnp.ndarray:
    """Full frontend: raw 16 kHz signal -> [T, 28, 12] windows, including the
    reference's 1920-sample zero padding (ref:demo.py:316-318)."""
    padded = jnp.pad(signal.astype(jnp.float32), (PAD_SAMPLES, PAD_SAMPLES))
    return mfcc_windows(mfcc(padded))


# ---- fixed-size chunked frontend (unbounded streaming) --------------------
#
# Window t covers mfcc rows [4t, 4t+28); row r reads pre-emphasized samples
# [r*WIN_STEP, r*WIN_STEP + WIN_LEN).  A chunk of K windows starting at
# window t0 therefore reads the contiguous padded-signal slice
# [4*t0*WIN_STEP, (4*(t0+K)+23)*WIN_STEP + WIN_LEN) — a FIXED length for
# fixed K — plus the single preceding sample for pre-emphasis continuity
# (zero at the clip start, where the reference's y[0] = x[0] rule holds on
# a zero pad sample anyway).  Chunked evaluation over one zero-padded host
# buffer is exactly the whole-clip frontend: every op past pre-emphasis is
# row-local.

def chunk_samples_len(k_windows: int) -> int:
    """Samples consumed by a :func:`mfcc_window_chunk` of ``k_windows``."""
    return (4 * k_windows + 23) * WIN_STEP + WIN_LEN


def chunk_sample_start(t0: int) -> int:
    """Offset of window ``t0``'s chunk slice in the padded signal buffer."""
    return 4 * t0 * WIN_STEP


def padded_buffer_len(n_windows: int) -> int:
    """Padded-signal buffer length covering chunks for ``n_windows``."""
    return chunk_sample_start(n_windows) + chunk_samples_len(0)


def mfcc_window_chunk(samples: jnp.ndarray, prev_sample: jnp.ndarray,
                      k_windows: int) -> jnp.ndarray:
    """Fixed-size streaming frontend: a [chunk_samples_len(K)] padded-signal
    slice (+ the sample preceding it) -> [K, 28, 12] per-video-frame windows
    — bit-identical to the corresponding rows of the whole-clip
    :func:`audio_to_mfcc_windows` on the same padded buffer."""
    samples = samples.astype(jnp.float32)
    prev = jnp.reshape(prev_sample.astype(jnp.float32), (1,))
    emph = jnp.concatenate([samples[:1] - 0.97 * prev,
                            samples[1:] - 0.97 * samples[:-1]])
    nrows = 4 * k_windows + 24
    feats = _mfcc_from_emph(emph, nrows)
    widx = (np.arange(28)[None, :] + 4 * np.arange(k_windows)[:, None])
    return feats[widx][:, :, 1:]


def num_windows_for_samples(n_samples: int) -> int:
    """Host-side shape arithmetic: windows produced by
    :func:`audio_to_mfcc_windows` for a raw signal of ``n_samples``."""
    return num_windows(num_mfcc_frames(n_samples + 2 * PAD_SAMPLES))


def min_samples_for_windows(t: int) -> int:
    """Smallest raw-signal length whose window count is >= ``t`` (used to
    zero-pad a waveform so the fused whole-clip program — which computes the
    MFCC frontend inline — yields a static bucketed frame count)."""
    # num_windows(M) >= t  <=>  M >= 4 * (t + 6)
    m = 4 * (t + 6)
    # num_mfcc_frames(n) >= m  <=>  n > WIN_LEN + (m - 2) * WIN_STEP
    n = WIN_LEN + (m - 2) * WIN_STEP + 1 - 2 * PAD_SAMPLES
    while num_windows_for_samples(n) < t:       # guard the ceil boundary
        n += WIN_STEP
    return n
