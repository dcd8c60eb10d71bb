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


def rope_deinterleave_perm(head_dim: int) -> np.ndarray:
    """Channel permutation that moves interleaved rotary pairs (2i, 2i+1)
    to split halves (i, i + D/2). Applying this to the OUTPUT channels of the
    q/k projections (per head) at load time lets the hot path use
    `apply_rope_half` — two aligned half-width multiplies instead of
    stride-2 gathers + re-interleaving, which cost lane relayouts on TPU.
    Attention scores are exactly invariant because q and k are permuted
    identically (checkpoint.deinterleave_qk_heads)."""
    return np.concatenate([np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)])


def apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate split-half rotary pairs: channels (i, i + D/2) by angle[i].

    Numerically identical to `apply_rope` on channels permuted by
    `rope_deinterleave_perm`. x: (B, S, H, D); cos/sin: (S', D/2)."""
    seqlen = x.shape[-3]
    d_half = x.shape[-1] // 2
    c = cos[:seqlen].astype(jnp.float32)[:, None, :]
    s = sin[:seqlen].astype(jnp.float32)[:, None, :]
    xf = x.astype(jnp.float32)
    x1 = xf[..., :d_half]
    x2 = xf[..., d_half:]
    out = jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.astype(x.dtype)


def precompute_rope_2d(
    head_dim: int,
    grid: int,
    theta: float = 10000.0,
    n_prefix_tokens: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Axial 2D RoPE tables for a (grid x grid) patch lattice (PE-Core vision
    attention; parameter-free, so invisible in checkpoints).

    The head dim splits in half: pairs in the first half rotate with the x
    coordinate, pairs in the second half with the y coordinate, each using the
    standard 1D frequency ladder over head_dim/2. Prefix tokens (e.g. CLS) get
    angle 0 — the identity rotation.

    Returns (cos, sin), each (n_prefix_tokens + grid*grid, head_dim // 2).
    """
    d_half = head_dim // 2  # per-axis rotary dim
    freqs = 1.0 / (
        theta ** (np.arange(0, d_half, 2).astype(np.float64) / d_half)
    )  # (d_half/2,)
    pos = np.arange(grid, dtype=np.float64)
    ang = np.outer(pos, freqs)  # (grid, d_half/2)
    # token (y, x) -> angles: [x-axis ladder | y-axis ladder]
    ang_x = np.tile(ang[None, :, :], (grid, 1, 1))  # (y, x, f)
    ang_y = np.tile(ang[:, None, :], (1, grid, 1))
    angles = np.concatenate([ang_x, ang_y], axis=-1).reshape(grid * grid, -1)
    if n_prefix_tokens:
        angles = np.concatenate(
            [np.zeros((n_prefix_tokens, angles.shape[1])), angles], axis=0
        )
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
