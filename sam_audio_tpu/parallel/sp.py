"""Sequence-parallel DiT forward: one attention over a sequence too large
for a single chip.

`dit_apply_sp` runs the exact `models/dit.dit_apply` computation with the
transformer trunk inside `jax.shard_map` over a mesh axis ("sp" by
default): activations, padding mask, and RoPE tables shard along the
SEQUENCE axis; self-attention uses the ppermute ring
(ops/ring_attention._ring_attend_local), and everything else in a DiT
block — norms, adaLN modulate, FFN, the cross-attention whose keys are
the replicated text memory — is per-token and runs unchanged on local
shards. The stem (patcher convs, kernel-3 halos) and embedders run
replicated before the trunk; the final modulate + output head run inside
the trunk (per-token).

Complements streaming (windows + crossfade, the throughput path) and the
reference's single-device bound (transformer.py:158): this is the exact-
semantics long-context path — ONE attention over the full sequence, laid
out across ICI. Tested exact vs `dit_apply` on the CPU mesh
(tests/test_sp_dit.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sam_audio_tpu.models.dit import (
    dit_block_apply,
    dit_finalize,
    dit_prepare,
)
from sam_audio_tpu.ops.ring_attention import _ring_attend_local


@functools.lru_cache(maxsize=8)
def _sp_trunk_fn(mesh: Mesh, axis_name: str, cfg, compute_dtype, has_rope):
    """Cached jitted shard_map trunk: rebuilding the closure per call would
    miss jax's jit cache (new function identity) and recompile every time."""

    def ring_adapter(q, k, v, key_padding_mask=None):
        d = q.shape[-1]
        mask = (jnp.ones(q.shape[:2], jnp.int8)
                if key_padding_mask is None
                else key_padding_mask.astype(jnp.int8))
        return _ring_attend_local(q, k, v, mask, scale=1.0 / (d ** 0.5),
                                  axis_name=axis_name)

    def trunk(tp, h_loc, pad_loc, cos_loc, sin_loc, t0_, t_, y_, ymask):
        tables = (cos_loc, sin_loc) if has_rope else None

        def scan_body(carry, layer_params):
            out = dit_block_apply(
                layer_params, carry, cfg=cfg, cross_x=y_, t0=t0_,
                padding_mask=pad_loc.astype(bool),
                memory_padding_mask=ymask, rope_tables=tables,
                compute_dtype=compute_dtype, attend_fn=ring_adapter,
            )
            return out, None

        h_out, _ = jax.lax.scan(scan_body, h_loc, tp["layers"])
        return dit_finalize(tp, h_out, t_, cfg=cfg,
                            compute_dtype=compute_dtype)

    seq3 = P(None, axis_name, None)
    seq2 = P(None, axis_name)
    rep = P()
    return jax.jit(jax.shard_map(
        trunk, mesh=mesh,
        in_specs=(rep,  # prefix spec: every param leaf replicated
                  seq3, seq2, P(axis_name, None), P(axis_name, None),
                  rep, rep, rep, rep),
        out_specs=seq3,
    ))


def dit_apply_sp(params, x, time, *, cfg, mesh: Mesh, axis_name: str = "sp",
                 padding_mask=None, memory=None, memory_padding_mask=None,
                 compute_dtype=None):
    """Sequence-parallel `dit_apply` (no dropout/remat). Differentiable:
    ppermute transposes to the reverse ring, so param grads through the SP
    trunk equal the single-device grads exactly (test_sp_dit.py) — the
    trunk is trainable under sequence parallelism.

    x: (B, T, in_channels or dim) with the POST-STEM sequence length
    divisible by mesh.shape[axis_name]. Returns (B, T, out_channels),
    sequence-sharded over the mesh."""
    n = mesh.shape[axis_name]
    h, t, t0, y, rope_tables, _, _ = dit_prepare(
        params, x, time, cfg=cfg, memory=memory, compute_dtype=compute_dtype,
    )
    b, s, _ = h.shape
    if s % n != 0:
        raise ValueError(
            f"post-stem sequence length {s} must divide over "
            f"{axis_name}={n}; pad the input (and padding_mask) first")
    if padding_mask is None:
        padding_mask = jnp.ones((b, s), bool)
    pad8 = padding_mask.astype(jnp.int8)

    trunk_params = {k: params[k] for k in
                    ("layers", "norm", "final_layer_scale_shift_table",
                     "output")}
    seq3 = P(None, axis_name, None)
    seq2 = P(None, axis_name)
    cos, sin = rope_tables if rope_tables is not None else (
        jnp.zeros((s, 1)), jnp.zeros((s, 1)))
    if memory is None:
        # without memory the block's cross-attention degenerates to a second
        # SELF-attention over the sharded sequence (dit_block_apply with
        # cross_x=None), which the local path cannot compute correctly
        raise ValueError("dit_apply_sp requires text memory (the DiT always "
                         "has it in practice); memory=None would need a "
                         "second ring in the cross-attention slot")
    if memory_padding_mask is None:
        memory_padding_mask = jnp.ones(y.shape[:2], bool)

    fn = _sp_trunk_fn(mesh, axis_name, cfg, compute_dtype,
                      rope_tables is not None)
    h = jax.device_put(h, NamedSharding(mesh, seq3))
    pad8 = jax.device_put(pad8, NamedSharding(mesh, seq2))
    cos = jax.device_put(cos, NamedSharding(mesh, P(axis_name, None)))
    sin = jax.device_put(sin, NamedSharding(mesh, P(axis_name, None)))
    return fn(trunk_params, h, pad8, cos, sin, t0, t, y, memory_padding_mask)
