"""Jittable STFT / mel-spectrogram frontend.

Used by the CLAP ranker (HTSAT-style 64-mel @48 kHz, reference:
sam_audio/ranking/clap.py:50-66 via laion_clap's feature pipeline) and the
ImageBind ranker (128-mel x 204 frames @16 kHz, reference:
sam_audio/ranking/imagebind.py:30-86). Matches torchaudio.transforms
.MelSpectrogram numerics: reflect center-padding, Hann window, power
spectrogram, HTK or Slaney mel scales.

The frame/FFT/filterbank pipeline is pure XLA (gather + rfft + matmul) so it
fuses into the ranker towers' jit program — no host hops in the k-candidate
scoring path.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _hz_to_mel(f, scale: str):
    f = np.asarray(f, np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(m, scale: str):
    m = np.asarray(m, np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=16)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int, fmin: float,
                   fmax: float, mel_scale: str = "htk",
                   norm: str | None = None) -> np.ndarray:
    """(n_freqs, n_mels) triangular filterbank (torchaudio melscale_fbanks)."""
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel(fmin, mel_scale)
    m_max = _hz_to_mel(fmax, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, mel_scale)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None]
    return fb.astype(np.float32)


def stft_power(x: jnp.ndarray, n_fft: int, hop_length: int,
               win_length: int | None = None, center: bool = True,
               power: float = 2.0) -> jnp.ndarray:
    """x: (..., T) -> (..., n_frames, n_fft//2+1) power spectrogram.
    Hann window, reflect center pad (torch.stft defaults)."""
    win_length = win_length or n_fft
    window = np.hanning(win_length + 1)[:-1].astype(np.float32)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(n_fft)[None, :])
    frames = x[..., idx] * jnp.asarray(window)
    spec = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.abs(spec)
    return mag if power == 1.0 else mag**power


def mel_spectrogram(x: jnp.ndarray, sample_rate: int, n_fft: int,
                    hop_length: int, win_length: int | None = None,
                    n_mels: int = 64, fmin: float = 0.0,
                    fmax: float | None = None, mel_scale: str = "htk",
                    norm: str | None = None, power: float = 2.0,
                    center: bool = True) -> jnp.ndarray:
    """x: (..., T) -> (..., n_frames, n_mels)."""
    fmax = fmax or sample_rate / 2
    spec = stft_power(x, n_fft, hop_length, win_length, center, power)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax,
                                    mel_scale, norm))
    return spec @ fb


def log_mel_spectrogram(x, amin: float = 1e-10, ref: float = 1.0,
                        top_db: float | None = None, **kwargs):
    """10*log10 mel (torchaudio AmplitudeToDB on a power mel)."""
    mel = mel_spectrogram(x, **kwargs)
    logmel = 10.0 * jnp.log10(jnp.maximum(mel, amin))
    logmel -= 10.0 * math.log10(max(amin, ref))
    if top_db is not None:
        logmel = jnp.maximum(logmel, jnp.max(logmel) - top_db)
    return logmel
