"""Fused short-sequence attention glue kernel (Pallas, TPU).

The DiT's self-attention at serving shapes (T = 250 frames for a 10 s clip)
is MXU-cheap but glue-heavy: per layer per NFE the composite XLA path pays
separate passes for per-head q/k RMSNorm, split-half RoPE, the fp32 score
materialization, softmax, and the weighted sum — each a round-trip through
HBM at (B*k, T, H, D). This kernel computes the whole chain

    q' = rope_half(rmsnorm(q)) ; k' = rope_half(rmsnorm(k))
    out = softmax(q' k'^T / sqrt(D) + mask) v

for one (batch, head) grid cell entirely in VMEM: T x D tiles of q/k/v fit
easily (T <= 512, D = 128 -> 64 KB bf16 each), so scores never touch HBM.

Semantics match ops/attention.sdpa + ops/nn.rmsnorm + ops/rope.apply_rope_half
composed (fp32 norm statistics and softmax, bf16 MXU operands) — the
reference chain sam_audio/model/transformer.py:128-161 with qk_norm=True.

Use `fused_attention_enabled()` / the SAM_AUDIO_FUSED_ATTN env var to gate;
models/dit.attention_apply dispatches here for short self-attention when
enabled.

MEASURED (round 3, k=8 bench on one v5e chip): NEGATIVE in context — p50
1133-1134 ms with the kernel (both the per-batch/head-loop and the B*H-grid
variants) vs 959 ms for the XLA composite. XLA fuses the glue into the
surrounding projection matmuls; the pallas_call boundary forces those
fusions apart and adds layout copies (same failure mode as the fused
res-unit decoder kernel, ops/fused_conv.py). Kept opt-in and parity-tested;
revisit if XLA's fusion behavior changes or for >512-frame shapes where
ops/flash_attention.py takes over anyway.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = float(jnp.finfo(jnp.float32).min)


def fused_attention_enabled() -> bool:
    v = os.environ.get("SAM_AUDIO_FUSED_ATTN", "auto").lower()
    if v in ("1", "true", "on"):
        return True
    if v in ("0", "false", "off"):
        return False
    # auto: off until the in-context measurement says otherwise (the fused
    # res-unit kernel taught us standalone wins don't always transfer —
    # PARITY.md "Pallas fused res-unit kernel"). Opt in with
    # SAM_AUDIO_FUSED_ATTN=1.
    return False


def _kernel(q_ref, k_ref, v_ref, qw_ref, kw_ref, cos_ref, sin_ref, mask_ref,
            o_ref, *, eps: float, scale: float, n_heads: int):
    """One (batch, head) pair per grid cell over (B*H, T, D)-shaped inputs —
    128 independent cells pipeline much better than 8 cells with serial
    head loops (measured: 1133 ms vs 959 ms control for the loop variant in
    the k=8 bench)."""
    f32 = jnp.float32
    d2 = q_ref.shape[-1] // 2
    i = pl.program_id(0)
    mask = mask_ref[i // n_heads, :]                            # (T,) bool
    c = cos_ref[:, :].astype(f32)
    s = sin_ref[:, :].astype(f32)

    def norm_rope(x, w_ref):
        x = x.astype(f32)
        x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        x = x * w_ref[0, :].astype(f32)[None, :]
        x1 = x[:, :d2]
        x2 = x[:, d2:]
        out = jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
        # composite path casts back to the activation dtype between ops
        return out.astype(q_ref.dtype)

    q = norm_rope(q_ref[0, :, :], qw_ref)
    k = norm_rope(k_ref[0, :, :], kw_ref)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * scale                                                   # (T, T)
    logits = jnp.where(mask[None, :], logits, _NEG)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, :, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    o_ref[0, :, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_glue_attention(
    q: jnp.ndarray,                 # (B, T, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_norm_w: jnp.ndarray,          # (D,)
    k_norm_w: jnp.ndarray,          # (D,)
    cos: jnp.ndarray,               # (>=T, D/2)
    sin: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, T) bool
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """qk-RMSNorm + split-half RoPE + SDPA in one Pallas kernel.

    T is padded to a multiple of 128 internally (padded keys are masked out,
    padded query rows dropped). D must be 128-aligned.
    """
    b, t, h, d = q.shape
    assert d % 128 == 0, d
    scale = 1.0 / (d ** 0.5)
    t_pad = -(-t // 128) * 128
    if key_padding_mask is None:
        key_padding_mask = jnp.ones((b, t), jnp.bool_)

    # (B, T, H, D) -> (B*H, T, D): one relayout (the composite SDPA path
    # pays the equivalent bqhd->bhqk transpose too)
    def to_bh(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)

    q = to_bh(q)
    k = to_bh(k)
    v = to_bh(v)
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        key_padding_mask = jnp.pad(key_padding_mask,
                                   ((0, 0), (0, t_pad - t)))
    cs = cos[:t].astype(jnp.float32)
    sn = sin[:t].astype(jnp.float32)
    if t_pad != t:
        cs = jnp.pad(cs, ((0, t_pad - t), (0, 0)))
        sn = jnp.pad(sn, ((0, t_pad - t), (0, 0)))

    qkv_spec = pl.BlockSpec((1, t_pad, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(  # noqa: E731 — full-array block
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, scale=scale, n_heads=h),
        grid=(b * h,),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            full((1, d)), full((1, d)),
            full((t_pad, d // 2)), full((t_pad, d // 2)),
            full((b, t_pad)),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), v.dtype),
        interpret=interpret,
    )(q, k, v, q_norm_w[None, :], k_norm_w[None, :], cs, sn,
      key_padding_mask)
    out = out[:, :t].reshape(b, h, t, d)
    return jnp.transpose(out, (0, 2, 1, 3))
