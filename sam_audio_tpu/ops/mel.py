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


# ---------------------------------------------------------------------------
# Kaldi-compatible fbank (torchaudio.compliance.kaldi.fbank numerics)
# ---------------------------------------------------------------------------


def _next_power_of_2(n: int) -> int:
    return 1 if n == 0 else 2 ** (n - 1).bit_length()


@lru_cache(maxsize=16)
def kaldi_mel_banks(num_bins: int, padded_window_size: int,
                    sample_freq: float, low_freq: float = 20.0,
                    high_freq: float = 0.0) -> np.ndarray:
    """Kaldi mel filterbank, (num_bins, padded_window_size//2 + 1).

    Kaldi's construction (torchaudio.compliance.kaldi.get_mel_banks): mel
    scale 1127*ln(1+f/700), triangles placed on an even mel grid between
    low_freq and high_freq (<=0 means offset from Nyquist), evaluated at the
    FFT bin centre frequencies; the final (Nyquist) column is zero."""
    num_fft_bins = padded_window_size // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = high_freq + nyquist
    assert 0.0 <= low_freq < high_freq <= nyquist, (low_freq, high_freq)

    def mel(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)

    fft_bin_width = sample_freq / padded_window_size
    mel_low, mel_high = mel(low_freq), mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    bins = np.arange(num_bins, dtype=np.float64)[:, None]
    left_mel = mel_low + bins * mel_delta
    center_mel = mel_low + (bins + 1.0) * mel_delta
    right_mel = mel_low + (bins + 2.0) * mel_delta
    freq_mel = mel(fft_bin_width * np.arange(num_fft_bins))[None, :]
    up = (freq_mel - left_mel) / (center_mel - left_mel)
    down = (right_mel - freq_mel) / (right_mel - center_mel)
    fb = np.maximum(0.0, np.minimum(up, down))
    # pad one zero column so it applies directly to an rfft output
    fb = np.pad(fb, ((0, 0), (0, 1)))
    return fb.astype(np.float32)


def _kaldi_window(window_type: str, n: int,
                  blackman_coeff: float = 0.42) -> np.ndarray:
    """Kaldi feature window (periodic=False, i.e. n-1 denominators)."""
    i = np.arange(n, dtype=np.float64)
    if window_type == "hanning":
        return 0.5 - 0.5 * np.cos(2.0 * np.pi * i / (n - 1))
    if window_type == "hamming":
        return 0.54 - 0.46 * np.cos(2.0 * np.pi * i / (n - 1))
    if window_type == "povey":
        return (0.5 - 0.5 * np.cos(2.0 * np.pi * i / (n - 1))) ** 0.85
    if window_type == "rectangular":
        return np.ones(n)
    if window_type == "blackman":
        a = 2.0 * np.pi / (n - 1)
        return (blackman_coeff - 0.5 * np.cos(a * i)
                + (0.5 - blackman_coeff) * np.cos(2.0 * a * i))
    raise ValueError(f"unknown window_type {window_type}")


def kaldi_fbank(waveform: np.ndarray, sample_frequency: float = 16000.0,
                num_mel_bins: int = 128, frame_length: float = 25.0,
                frame_shift: float = 10.0, window_type: str = "hanning",
                low_freq: float = 20.0, high_freq: float = 0.0,
                preemphasis_coefficient: float = 0.97,
                remove_dc_offset: bool = True, round_to_power_of_two: bool = True,
                snip_edges: bool = True, use_power: bool = True,
                use_log_fbank: bool = True, blackman_coeff: float = 0.42,
                ) -> np.ndarray:
    """Kaldi-compatible log-mel fbank, numpy host-side.

    Replicates torchaudio.compliance.kaldi.fbank with dither=0 and
    use_energy=False (the ImageBind frontend's exact call, reference
    sam_audio/ranking/imagebind.py:75-77 -> imagebind.data.waveform2melspec):
    snip-edges framing, per-frame DC removal, replicate-edge preemphasis,
    periodic=False window, zero-pad to a power-of-two FFT, Kaldi mel banks,
    natural log floored at float32 eps. Returns (num_frames, num_mel_bins)
    float32; empty (0, num_mel_bins) when the signal is shorter than one
    window (kaldi min_duration behavior).
    """
    wav = np.asarray(waveform, np.float64).reshape(-1)
    window_shift = int(sample_frequency * frame_shift * 0.001)
    window_size = int(sample_frequency * frame_length * 0.001)
    padded = _next_power_of_2(window_size) if round_to_power_of_two else window_size
    if not snip_edges:
        raise NotImplementedError("only snip_edges=True (the kaldi default)")
    if len(wav) < window_size:
        return np.zeros((0, num_mel_bins), np.float32)
    m = 1 + (len(wav) - window_size) // window_shift
    idx = (np.arange(m)[:, None] * window_shift + np.arange(window_size)[None, :])
    frames = wav[idx]
    if remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemphasis_coefficient != 0.0:
        prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis_coefficient * prev
    frames = frames * _kaldi_window(window_type, window_size,
                                    blackman_coeff)[None, :]
    if padded != window_size:
        frames = np.pad(frames, ((0, 0), (0, padded - window_size)))
    spectrum = np.abs(np.fft.rfft(frames, axis=1))
    if use_power:
        spectrum = spectrum**2
    fb = kaldi_mel_banks(num_mel_bins, padded, float(sample_frequency),
                         low_freq, high_freq)
    mel_energies = spectrum @ fb.T.astype(np.float64)
    if use_log_fbank:
        eps = float(np.finfo(np.float32).eps)
        mel_energies = np.log(np.maximum(mel_energies, eps))
    return mel_energies.astype(np.float32)


def kaldi_fbank_jax(waveform: jnp.ndarray, sample_frequency: float = 16000.0,
                    num_mel_bins: int = 128, frame_length: float = 25.0,
                    frame_shift: float = 10.0, window_type: str = "hanning",
                    low_freq: float = 20.0, high_freq: float = 0.0,
                    preemphasis_coefficient: float = 0.97,
                    remove_dc_offset: bool = True) -> jnp.ndarray:
    """Jittable batched counterpart of `kaldi_fbank`: (..., T) device array
    with static T -> (..., num_frames, num_mel_bins) log-mel, f32.

    Same snip-edges framing, per-frame DC removal, replicate-edge
    preemphasis, periodic=False window, and Kaldi mel banks as the numpy
    path (which computes in f64 — agreement is ~1e-4 on the log-mels). The
    power spectrum runs as a DFT matmul against baked cos/sin matrices
    (window_size x bins), which maps onto the MXU and keeps the whole
    ImageBind audio frontend inside one compiled scoring program (reference
    sam_audio/ranking/imagebind.py:75-77 runs this on host per clip)."""
    wav = waveform.astype(jnp.float32)
    t = wav.shape[-1]
    shift = int(sample_frequency * frame_shift * 0.001)
    size = int(sample_frequency * frame_length * 0.001)
    padded = _next_power_of_2(size)
    if t < size:
        return jnp.zeros(wav.shape[:-1] + (0, num_mel_bins), jnp.float32)
    m = 1 + (t - size) // shift
    idx = np.arange(m)[:, None] * shift + np.arange(size)[None, :]
    frames = wav[..., idx]  # (..., m, size)
    if remove_dc_offset:
        frames = frames - frames.mean(axis=-1, keepdims=True)
    if preemphasis_coefficient != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis_coefficient * prev
    frames = frames * jnp.asarray(
        _kaldi_window(window_type, size), jnp.float32)
    # rFFT of the zero-padded frame == DFT over the first `size` samples
    k = np.arange(padded // 2 + 1)
    ang = -2.0 * np.pi * np.outer(np.arange(size), k) / padded
    re = frames @ jnp.asarray(np.cos(ang), jnp.float32)
    im = frames @ jnp.asarray(np.sin(ang), jnp.float32)
    power = re * re + im * im
    fb = kaldi_mel_banks(num_mel_bins, padded, float(sample_frequency),
                         low_freq, high_freq)
    mel = power @ jnp.asarray(fb.T, jnp.float32)
    eps = float(np.finfo(np.float32).eps)
    return jnp.log(jnp.maximum(mel, eps))


def log_mel_spectrogram(x, amin: float = 1e-10, ref: float = 1.0,
                        top_db: float | None = None, **kwargs):
    """10*log10 mel (torchaudio AmplitudeToDB on a power mel)."""
    mel = mel_spectrogram(x, **kwargs)
    logmel = 10.0 * jnp.log10(jnp.maximum(mel, amin))
    logmel -= 10.0 * math.log10(max(amin, ref))
    if top_db is not None:
        logmel = jnp.maximum(logmel, jnp.max(logmel) - top_db)
    return logmel
