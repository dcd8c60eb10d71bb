"""Attention ops.

Two paths:
  * `sdpa` — pure-XLA scaled dot-product attention (einsum + softmax). XLA fuses
    this well for the short sequences SAM-Audio runs at (25 tokens/s of audio).
  * `flash_attention` (ops/flash_attention.py) — Pallas kernel for long
    sequences; `attend` dispatches on sequence length.

Semantics match torch.nn.functional.scaled_dot_product_attention with an
additive boolean key-padding mask (reference: sam_audio/model/transformer.py:128-161).

Layout convention: q, k, v are (B, S, H, D).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Below this q-length the XLA path is used; Pallas tiles need >=128 anyway.
_FLASH_MIN_SEQLEN = 1024


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    score_dtype=None,
) -> jnp.ndarray:
    """q: (B, Sq, H, D); k, v: (B, Sk, H, D); key_padding_mask: (B, Sk) bool,
    True = attend. Returns (B, Sq, H, D). Softmax in fp32.

    `score_dtype` (optional): materialize the (B, H, Sq, Sk) score matrix in
    this dtype instead of fp32 (the MXU still accumulates fp32; softmax still
    reduces in fp32 — only the HBM-resident logits are rounded). At large
    token counts the score matrix dominates attention HBM traffic (e.g. the
    PE tower's 250x16x577x577 scores are 4.3 GB in fp32), so bf16 halves the
    bandwidth cost of the softmax round-trip for ~1e-3-relative weight error.
    """
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d**0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if key_padding_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(key_padding_mask[:, None, None, :], logits, neg)
    if score_dtype is not None and logits.dtype != score_dtype:
        # round once at the matmul epilogue; softmax upcasts per-element in
        # registers (the fused reduce reads the narrow array from HBM)
        logits = logits.astype(score_dtype)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    else:
        weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def attend(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
    score_dtype=None,
) -> jnp.ndarray:
    """Dispatch between XLA SDPA and the Pallas flash kernel.

    The DiT's sequences are short (250 tokens per 10 s clip), where full
    attention is MXU-friendly and flash tiling adds overhead; flash wins for
    long-audio (>40 s) inputs.
    """
    if use_flash is None:
        use_flash = (
            q.shape[1] >= _FLASH_MIN_SEQLEN
            and q.shape[1] == k.shape[1]
            and q.shape[-1] % 128 == 0
            and jax.default_backend() == "tpu"
        )
    if use_flash:
        from sam_audio_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, key_padding_mask=key_padding_mask, scale=scale)
    return sdpa(q, k, v, key_padding_mask=key_padding_mask, scale=scale,
                score_dtype=score_dtype)
