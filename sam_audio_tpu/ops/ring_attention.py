"""Ring (context-parallel) attention across a device mesh axis.

The reference is single-device full attention with a ~400 s RoPE bound
(reference sam_audio/model/transformer.py:158, config.py:101). This module
adds the TPU-native long-context story SURVEY.md §5 sketches: shard the
SEQUENCE axis over a mesh axis ("sp"), keep Q local, and rotate K/V blocks
around the ring with `lax.ppermute` while merging partial attention with
the online-softmax recurrence (the same math as the Pallas flash kernel,
ops/flash_attention.py, applied across devices instead of VMEM tiles).

Per ring step each device computes attention of its local Q block against
the visiting K/V block, then passes the block to its neighbor — n_devices
steps see every key exactly once, no (S, S) matrix ever materializes on a
device, and the ppermute rides the ICI links XLA lays out for the mesh.

Complements (does not replace) `streaming.separate_streaming`: streaming
solves unbounded audio by windowing with crossfade; ring attention is for
a SINGLE attention over a sequence too large for one chip's HBM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# finite "minus infinity": keeps exp() at exactly 0 for masked keys without
# producing -inf - -inf = nan in the running-max merge
_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _ring_attend_local(q, k, v, mask, *, scale: float, axis_name: str):
    """Runs INSIDE shard_map. q, k, v: (B, S_local, H, D) local blocks;
    mask: (B, S_local) int8, 1 = attend. Returns (B, S_local, H, D).

    Each ring step materializes an (S_local, S_local) score block per
    (batch, head) — fine up to ~4k frames/device in fp32. For longer local
    blocks the step itself should tile (a stats-returning flash kernel);
    at the DiT's 25 frames/s that bound is ~160 s of audio PER DEVICE
    before it matters, so the einsum step is kept."""
    n = jax.lax.psum(1, axis_name)
    b, sq, h, d = q.shape

    qf = q.astype(jnp.float32) * scale
    # pcast-to-varying: the zero-init carries must be marked device-varying so the
    # fori_loop carry type matches after the first ppermute round
    m0 = jax.lax.pcast(jnp.full((b, h, sq), _MASK_VALUE, jnp.float32),
                       axis_name, to='varying')
    l0 = jax.lax.pcast(jnp.zeros((b, h, sq), jnp.float32), axis_name,
                      to='varying')
    acc0 = jax.lax.pcast(jnp.zeros((b, sq, h, d), jnp.float32), axis_name,
                        to='varying')
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(_, carry):
        m, l, acc, k_blk, v_blk, mask_blk = carry
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, k_blk.astype(jnp.float32))
        s = s + (1.0 - mask_blk.astype(jnp.float32))[:, None, None, :] \
            * _MASK_VALUE
        m_blk = jnp.max(s, axis=-1)                     # (B, H, Sq)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)                      # <= 1, never nan
        p = jnp.exp(s - m_new[..., None])               # (B, H, Sq, Sk)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bhqk,bkhd->bqhd", p, v_blk.astype(jnp.float32))
        acc_new = acc * alpha.transpose(0, 2, 1)[..., None] + pv
        # rotate the K/V block (and its mask) to the next device on the ring
        k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
        mask_nxt = jax.lax.ppermute(mask_blk, axis_name, perm)
        return m_new, l_new, acc_new, k_nxt, v_nxt, mask_nxt

    m, l, acc, *_ = jax.lax.fori_loop(0, n, body, (m0, l0, acc0, k, v, mask))
    l = jnp.maximum(l, 1e-30)
    out = acc / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


@functools.lru_cache(maxsize=16)
def _ring_fn(mesh: Mesh, scale: float, axis_name: str):
    """Cached jitted shard_map wrapper: rebuilding it per call would miss
    jax's jit cache (new function object every time) and recompile."""
    seq = P(None, axis_name, None, None)
    seq2 = P(None, axis_name)
    return jax.jit(
        jax.shard_map(
            functools.partial(_ring_attend_local, scale=scale,
                              axis_name=axis_name),
            mesh=mesh,
            in_specs=(seq, seq, seq, seq2),
            out_specs=seq,
        )
    )


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    key_padding_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    axis_name: str = "sp",
) -> jnp.ndarray:
    """q, k, v: (B, S, H, D) with S divisible by mesh.shape[axis_name];
    key_padding_mask: (B, S) bool, True = attend. Semantics match
    ops.attention.sdpa exactly (softmax in fp32); the sequence axis is
    sharded over `axis_name` and K/V blocks rotate over the ring."""
    b, s, h, d = q.shape
    n = mesh.shape[axis_name]
    if s % n != 0:
        raise ValueError(
            f"sequence length {s} must divide over {axis_name}={n}; pad the "
            "sequence (and extend key_padding_mask) to a multiple first")
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    if key_padding_mask is None:
        key_padding_mask = jnp.ones((b, s), bool)
    mask8 = key_padding_mask.astype(jnp.int8)

    seq = P(None, axis_name, None, None)
    seq2 = P(None, axis_name)
    fn = _ring_fn(mesh, scale, axis_name)
    q = jax.device_put(q, NamedSharding(mesh, seq))
    k = jax.device_put(k, NamedSharding(mesh, seq))
    v = jax.device_put(v, NamedSharding(mesh, seq))
    mask8 = jax.device_put(mask8, NamedSharding(mesh, seq2))
    return fn(q, k, v, mask8)
