"""Bandlimited sinc resampling, numerically equivalent to
torchaudio.functional.resample defaults (sinc_interp_hann, lowpass_filter_width=6,
rolloff=0.99) which the reference uses for all audio loading
(reference: sam_audio/processor.py:29-31).

Two implementations sharing one kernel builder:
  * `resample_np` — numpy, host-side preprocessing.
  * `resample`    — jittable JAX (strided conv), for on-device pipelines.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _sinc_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple:
    """Returns (kernels (new_freq, 1, K) float32 numpy, width int) with
    frequencies already reduced by their gcd."""
    gcd = math.gcd(int(orig_freq), int(new_freq))
    orig_freq = int(orig_freq) // gcd
    new_freq = int(new_freq) // gcd
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, None] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None, None] / new_freq + idx
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    t *= math.pi
    scale = base_freq / orig_freq
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels *= window * scale
    return kernels.astype(np.float32), width


def _reduced(orig_freq: int, new_freq: int):
    g = math.gcd(int(orig_freq), int(new_freq))
    return int(orig_freq) // g, int(new_freq) // g


def resample_np(waveform: np.ndarray, orig_freq: int, new_freq: int,
                lowpass_filter_width: int = 6, rolloff: float = 0.99) -> np.ndarray:
    """waveform: (..., T) numpy. Returns (..., ceil(T * new/orig))."""
    if orig_freq == new_freq:
        return waveform
    kernels, width = _sinc_kernel(orig_freq, new_freq, lowpass_filter_width, rolloff)
    orig_r, new_r = _reduced(orig_freq, new_freq)
    shape = waveform.shape
    length = shape[-1]
    wav = waveform.reshape(-1, length).astype(np.float32)
    wav = np.pad(wav, [(0, 0), (width, width + orig_r)])
    num_out_frames = (wav.shape[-1] - kernels.shape[-1]) // orig_r + 1
    # strided view: frames (num_wavs, num_out_frames, K)
    strides = (wav.strides[0], wav.strides[1] * orig_r, wav.strides[1])
    frames = np.lib.stride_tricks.as_strided(
        wav, (wav.shape[0], num_out_frames, kernels.shape[-1]), strides
    )
    # (W, F, K) x (P, K) -> (W, F, P) -> interleave phases
    out = np.einsum("wfk,pk->wfp", frames, kernels[:, 0, :])
    out = out.reshape(wav.shape[0], -1)
    target_length = int(math.ceil(new_r * length / orig_r))
    out = out[:, :target_length]
    return out.reshape(*shape[:-1], target_length)


def resample(waveform: jnp.ndarray, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 6, rolloff: float = 0.99) -> jnp.ndarray:
    """Jittable resample; waveform (..., T)."""
    if orig_freq == new_freq:
        return waveform
    kernels, width = _sinc_kernel(orig_freq, new_freq, lowpass_filter_width, rolloff)
    orig_r, new_r = _reduced(orig_freq, new_freq)
    shape = waveform.shape
    length = shape[-1]
    wav = waveform.reshape(-1, 1, length).astype(jnp.float32)
    wav = jnp.pad(wav, [(0, 0), (0, 0), (width, width + orig_r)])
    out = jax.lax.conv_general_dilated(
        wav,
        jnp.asarray(kernels),  # (new_r, 1, K) as OIH
        window_strides=(orig_r,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (W, new_r phases, F)
    out = jnp.swapaxes(out, 1, 2).reshape(wav.shape[0], -1)
    target_length = int(math.ceil(new_r * length / orig_r))
    out = out[:, :target_length]
    return out.reshape(*shape[:-1], target_length).astype(waveform.dtype)
