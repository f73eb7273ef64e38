"""On-device STFT + mel spectrogram (GEMM formulation).

Replaces the reference's torchaudio.transforms.MelSpectrogram frontend
(ref twj_dataset.py:40-67 / twj_dataset_offline.py:48-93: 16 kHz, n_fft
1024, win 1024, hop 256, 80 mels, power 1, f 0-8000, slaney norm + slaney
mel scale) and the host-side librosa mel path (backup/dy_dataset.py:94-113).

TPU-first: the STFT is frame-extraction + two real matmuls against the
cos/sin DFT bases (the MXU-native NDFT formulation) — no complex FFT needed
at these sizes, and XLA fuses the window multiply into the GEMM.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """torch.hann_window default (periodic=True)."""
    n = win_length if periodic else win_length - 1
    t = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2 * np.pi * t / n)).astype(np.float32)


def hz_to_mel_slaney(f):
    """librosa/torchaudio 'slaney' mel scale: linear < 1 kHz, log above."""
    f = np.asarray(f, np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    norm: str = "slaney",
) -> np.ndarray:
    """(n_freqs, n_mels) triangular filterbank, slaney scale + slaney norm —
    matches torchaudio.functional.melscale_fbanks(mel_scale='slaney')."""
    f_max = f_max or sample_rate / 2
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min, m_max = hz_to_mel_slaney(f_min), hz_to_mel_slaney(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz_slaney(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2: n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_bases_np(n_fft: int, win_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT bases: (win, n_freqs) cos / -sin, window folded in.
    Cached as NUMPY (never jnp: a jnp constant created inside a jit trace is
    a tracer and must not be cached across traces)."""
    n_freqs = n_fft // 2 + 1
    window = hann_window(win_length)
    # window centered in the n_fft frame (torch pads window to n_fft)
    t = np.arange(n_fft)
    k = np.arange(n_freqs)
    ang = 2 * np.pi * np.outer(t, k) / n_fft
    w = np.zeros(n_fft, np.float32)
    off = (n_fft - win_length) // 2
    w[off:off + win_length] = window
    cos_b = (np.cos(ang) * w[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * w[:, None]).astype(np.float32)
    return cos_b, sin_b


def _dft_bases(n_fft: int, win_length: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    cos_b, sin_b = _dft_bases_np(n_fft, win_length)
    return jnp.asarray(cos_b), jnp.asarray(sin_b)


def stft_mag(
    audio: jnp.ndarray,  # (..., T)
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: Optional[int] = None,
    center: bool = True,
    power: float = 1.0,
) -> jnp.ndarray:
    """Magnitude (power=1) / power (power=2) spectrogram, torch-compatible
    (center reflect-pad, periodic hann). Returns (..., n_freqs, frames)."""
    win_length = win_length or n_fft
    if center:
        pad = n_fft // 2
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)],
                        mode="reflect")
    T = audio.shape[-1]
    n_frames = 1 + (T - n_fft) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    frames = audio[..., idx]  # (..., frames, n_fft)
    cos_b, sin_b = _dft_bases(n_fft, win_length)
    re = frames @ cos_b
    im = frames @ sin_b
    mag2 = re * re + im * im
    spec = jnp.sqrt(jnp.maximum(mag2, 1e-12)) if power == 1.0 else mag2
    return jnp.swapaxes(spec, -1, -2)  # (..., n_freqs, frames)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length",
                                             "win_length", "n_mels",
                                             "sample_rate", "f_min", "f_max",
                                             "power"))
def mel_spectrogram(
    audio: jnp.ndarray,  # (..., T)
    sample_rate: int = 16000,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: float = 8000.0,
    power: float = 1.0,
) -> jnp.ndarray:
    """(..., n_mels, frames) — the reference's extract_mel_spec operating
    point by default."""
    spec = stft_mag(audio, n_fft, hop_length, win_length, power=power)
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate,
                                    f_min, f_max))
    return jnp.swapaxes(jnp.swapaxes(spec, -1, -2) @ fb, -1, -2)


def dynamic_range_compression(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """log-compression (ref twj_dataset_offline.py:42-46)."""
    return jnp.log(jnp.clip(x, clip_val, None))


def modify_vector(mel: jnp.ndarray, target_frames: int = 200) -> jnp.ndarray:
    """Crop or tile mel (B, n_mels, T) to exactly `target_frames`
    (ref twj_dataset.py:201-210: ECAPA input normalization)."""
    T = mel.shape[-1]
    if T >= target_frames:
        return mel[..., :target_frames]
    reps = -(-target_frames // T)
    return jnp.tile(mel, (1,) * (mel.ndim - 1) + (reps,))[..., :target_frames]
