"""Pallas TPU flash attention (forward) with key-padding masking.

Replaces the reference's torch SDPA kernel (reference:
sam_audio/model/transformer.py:158) for long sequences: the (S, S) scores
matrix is never materialized — K/V are streamed tile by tile through VMEM with
an online softmax (running max m, running sum l, corrected accumulator).

Layout: q, k, v are (B, S, H, D) like the rest of the codebase; the kernel
grid is (B, H, Sq/block_q, Sk/block_k) with fp32 softmax statistics in VMEM
scratch. The key-padding mask rides in as a (B, Sk) int8 array tiled along the
KV axis. Sequences are padded to block multiples by the wrapper (masked tail).

SAM-Audio context: DiT sequences are 25 tokens/s of audio — flash engages for
>40 s clips (>=1024 frames) and for the long-context rankers; short sequences
use the fused-XLA path in ops/attention.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                  m_scratch, l_scratch, acc_scratch,
                  *, scale: float, kv_blocks: int, block_k: int):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    q = q_ref[0, 0]  # (block_q, d)
    k = k_ref[0, 0]  # (block_k, d)
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)
    s = s * scale

    # additive mask via float arithmetic — broadcasting 1-bit vectors trips
    # Mosaic relayout, so keep everything f32
    mask_f = mask_ref[0, :, :].astype(jnp.float32)  # (1, block_k); 1 = attend
    s = s + (1.0 - mask_f) * DEFAULT_MASK_VALUE

    m_prev = m_scratch[...]       # (block_q, 128)
    l_prev = l_scratch[...]
    m_curr = jnp.max(s, axis=1)[:, None]          # (block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)          # (block_q, 128) broadcast
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])                # (block_q, block_k)
    l_corr = alpha * l_prev
    l_next = l_corr + jnp.sum(p, axis=1)[:, None]

    m_scratch[...] = m_next
    l_scratch[...] = l_next

    acc_scratch[...] *= alpha[:, :1]
    acc_scratch[...] += jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == kv_blocks - 1)
    def _store():
        l_final = l_scratch[...][:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def _flash_padded(q, k, v, mask, *, scale: float, block_q: int, block_k: int,
                  interpret: bool):
    """q, k, v arrive (B, S, H, D); the kernel runs (B, H, S, D) so block
    shapes end in (seq_tile, head_dim) — Mosaic requires the last two block
    dims to tile (8, 128)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    q = jnp.swapaxes(q, 1, 2)
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)
    mask = mask[:, None, :]  # (B, 1, Sk)
    kv_blocks = sk // block_k
    grid = (b, h, sq // block_q, kv_blocks)

    kernel = functools.partial(
        _flash_kernel, scale=scale, kv_blocks=kv_blocks, block_k=block_k
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, q_, kv: (b_, h_, q_, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, q_, kv: (b_, h_, kv, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, q_, kv: (b_, h_, kv, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, h_, q_, kv: (b_, 0, kv)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b_, h_, q_, kv: (b_, h_, q_, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, mask)
    return jnp.swapaxes(out, 1, 2)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """q: (B, Sq, H, D); k, v: (B, Sk, H, D); key_padding_mask: (B, Sk) bool.
    Returns (B, Sq, H, D). Pads sequences to block multiples internally."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = 1.0 / (d**0.5)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    if key_padding_mask is None:
        mask = jnp.ones((b, sk), jnp.int8)
    else:
        mask = key_padding_mask.astype(jnp.int8)
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, sk_p - sk)))
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0), (0, 0)))

    out = _flash_padded(q, k, v, mask, scale=scale, block_q=block_q,
                        block_k=block_k, interpret=interpret)
    return out[:, :sq]
