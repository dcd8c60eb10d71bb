"""Rotary position embeddings.

Matches the reference's 2x2-rotation-matrix formulation numerically
(reference: sam_audio/model/rope.py:38-155): consecutive feature pairs
(x[2i], x[2i+1]) are rotated by angle pos * theta^(-2i/dim):

    out[2i]   = x[2i] * cos - x[2i+1] * sin
    out[2i+1] = x[2i] * sin + x[2i+1] * cos

Implemented TPU-first: precomputed cos/sin tables, applied with reshapes that
XLA fuses into the surrounding matmuls (no gather, no complex numbers).
Supports llama3-style wavelength scaling (reference: rope.py:96-114), though
the reference runs with scale_factor=1.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def precompute_rope(
    head_dim: int,
    max_seqlen: int,
    theta: float,
    scale_factor: int = 1,
    low_freq_factor: int = 1,
    high_freq_factor: int = 32,
    old_context_len: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (cos, sin), each (max_seqlen, head_dim // 2), float32."""
    freqs = 1.0 / (
        theta ** (np.arange(0, head_dim, 2)[: head_dim // 2].astype(np.float64) / head_dim)
    )
    if scale_factor != 1:
        low_freq_wavelen = old_context_len / low_freq_factor
        high_freq_wavelen = old_context_len / high_freq_factor
        new_freqs = []
        for freq in freqs:
            wavelen = 2 * math.pi / freq
            if wavelen < high_freq_wavelen:
                new_freqs.append(freq)
            elif wavelen > low_freq_wavelen:
                new_freqs.append(freq / scale_factor)
            else:
                smooth = (old_context_len / wavelen - low_freq_factor) / (
                    high_freq_factor - low_freq_factor
                )
                new_freqs.append((1 - smooth) * freq / scale_factor + smooth * freq)
        freqs = np.array(new_freqs, dtype=np.float64)
    t = np.arange(max_seqlen, dtype=np.float64)
    angles = np.outer(t, freqs)
    return (
        jnp.asarray(np.cos(angles), dtype=jnp.float32),
        jnp.asarray(np.sin(angles), dtype=jnp.float32),
    )


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding.

    x: (..., S, H, D) or (B, H, S, D) — the sequence axis is inferred from the
    cos/sin table length matching axis -3 by convention (B, S, H, D). Callers
    in this codebase always pass (B, S, H, D).
    cos/sin: (S', D/2) tables; the first S rows are used.
    """
    seqlen = x.shape[-3]
    d_half = x.shape[-1] // 2
    c = cos[:seqlen].astype(jnp.float32)  # (S, D/2)
    s = sin[:seqlen].astype(jnp.float32)
    # broadcast tables to (..., S, 1, D/2)
    c = c[:, None, :]
    s = s[:, None, :]
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    del d_half
    out0 = x0 * c - x1 * s
    out1 = x0 * s + x1 * c
    # re-interleave pairs: stack on a trailing axis then flatten
    out = jnp.stack([out0, out1], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)
