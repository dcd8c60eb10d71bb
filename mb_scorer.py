"""Microbench the CLAP scorer's pieces at the k=8 serving shape.

The measured k=8 bench pays ~65 ms for the on-device CLAP scorer
(HTSAT-tiny + RoBERTa, see TODO.md mode table). This script asks where that
time goes — the STFT frontend (jnp.fft.rfft custom call) vs the swin tower —
and A/Bs an MXU-friendly DFT-matmul power spectrum against the rfft path at
the exact scorer shape (8 candidates x 10 s @48 kHz, n_fft 1024 / hop 480).

Relay rules (memory: decoder-perf-findings): loop with a CARRIED dependence
inside one jit, sync via scalar fetch, divide by REPS. These ops are >=1 ms,
so no nesting is needed to amortize the ~0.5 ms/iteration floor.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/sam_audio_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

from sam_audio_tpu.models.clap import ClapConfig, clap_audio_embed, clap_init
from sam_audio_tpu.ops.mel import mel_filterbank, stft_power

REPS = 20
CFG = ClapConfig()
BK = 8  # candidates in the serving program


def bench(name, make_fn, *args):
    f = jax.jit(make_fn)
    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + sync
    t0 = time.time()
    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{name:46s} {dt:8.3f} ms", file=sys.stderr)
    return dt


def chain(body):
    """REPS applications with a carried scalar feedback (defeats LICM)."""

    def run(x):
        def it(_, carry):
            x_c, acc = carry
            out = body(x_c)
            s = jnp.sum(out.astype(jnp.float32))
            return x_c + (s * 1e-20).astype(x_c.dtype), acc + s

        _, acc = jax.lax.fori_loop(0, REPS, it, (x, jnp.float32(0)))
        return acc

    return run


def stft_power_dft(x, n_fft, hop):
    """Power spectrum via two DFT matmuls (MXU) instead of the FFT call.
    Matches stft_power(center=True, power=2.0) numerics in f32."""
    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[..., idx] * jnp.asarray(window)
    k = np.arange(n_fft // 2 + 1)
    ang = -2.0 * np.pi * np.outer(np.arange(n_fft), k) / n_fft
    re = frames @ jnp.asarray(np.cos(ang), jnp.float32)
    im = frames @ jnp.asarray(np.sin(ang), jnp.float32)
    return re * re + im * im


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(BK, CFG.n_samples).astype(np.float32) * 0.1)
    params = clap_init(jax.random.PRNGKey(0), CFG, jnp.bfloat16)

    n_fft, hop = CFG.htsat.n_fft, CFG.htsat.hop_length
    fb = jnp.asarray(mel_filterbank(CFG.sample_rate, n_fft,
                                    CFG.htsat.n_mels, CFG.htsat.fmin,
                                    CFG.htsat.fmax))

    t_full = bench("clap_audio_embed (full scorer tower)",
                   chain(lambda w: clap_audio_embed(params, CFG, w,
                                                    jnp.bfloat16)), wav)
    t_rfft = bench("stft_power rfft (n_fft=1024, hop=480)",
                   chain(lambda w: stft_power(w, n_fft, hop)), wav)
    t_dft = bench("stft_power DFT-matmul",
                  chain(lambda w: stft_power_dft(w, n_fft, hop)), wav)
    t_mel_rfft = bench("mel = rfft power @ filterbank",
                       chain(lambda w: stft_power(w, n_fft, hop) @ fb), wav)
    t_mel_dft = bench("mel = DFT-matmul power @ filterbank",
                      chain(lambda w: stft_power_dft(w, n_fft, hop) @ fb),
                      wav)
    print(
        f"summary: scorer {t_full:.2f} ms, stft rfft {t_rfft:.2f} vs "
        f"dft {t_dft:.2f} ms, mel rfft {t_mel_rfft:.2f} vs dft "
        f"{t_mel_dft:.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
