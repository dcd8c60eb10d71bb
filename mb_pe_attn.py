"""Microbench: XLA SDPA vs Pallas flash attention at the PE-Core ViT-L
serving shape (B=250 frames, S=577 tokens, H=16, D=64).

MEASURED (round 5, v5e): the r4 claim that this attention is HBM-bound is
WRONG — it is at a VPU/transcendental floor. Per layer: XLA bf16-scores
19.9 ms; deferred normalization 1.00x (no avoidable HBM pass exists);
whole-sequence flash 640x640 (one program per (b,h), scores resident in
VMEM, ~10x less HBM traffic) 21.4 ms = 0.93x; small-block flash 128x128
70 ms = 0.28x (program-count overhead at B*H=4000 x 5x5 blocks). Two
implementations with ~10x different HBM bills landing within 7% pins the
shared cost on the ~1.6e9 fp32 exps/layer + online-softmax VPU work and the
D=64 half-depth MXU contractions. Production path stays XLA + bf16 scores;
BASELINE.md's roofline is corrected accordingly.

Usage: python mb_pe_attn.py [B S H D] [bq,bk ...]
NOTE: flash block_k must divide S padded (640) into 128-multiples or cover
it whole — the (B, Sk) mask BlockSpec rejects e.g. 320.

Methodology (CLAUDE.md): loop-carried fori_loop so LICM can't hoist the body;
timing via scalar fetch. Reports ms/iteration for each path plus numerics.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.ops.attention import sdpa
from sam_audio_tpu.ops.flash_attention import flash_attention

args = sys.argv[1:]
_defaults = [250, 577, 16, 64]
_shape = [int(x) for x in args[:4]] + _defaults[len(args[:4]):]
B, S, H, D = _shape
BLOCKS = [(int(a.split(",")[0]), int(a.split(",")[1])) for a in args[4:]] or [
    (128, 128)]
ITERS = 8

key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)


def timed(fn, name):
    # k/v must be ARGUMENTS (closed-over arrays become inline constants and
    # the ~300 MB/array serialized HLO overflows the relay's request-body
    # limit with HTTP 413).
    @jax.jit
    def loop(q0, k_, v_):
        def body(_, carry):
            out = fn(carry, k_, v_)
            return out  # loop-carried: q <- out
        return jax.lax.fori_loop(0, ITERS, body, q0)

    r = loop(q, k, v)
    float(jnp.mean(r.astype(jnp.float32)))  # sync (compile + warm)
    t0 = time.time()
    r = loop(q, k, v)
    float(jnp.mean(r.astype(jnp.float32)))
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name}: {dt:.2f} ms/iter")
    return dt


def run_sdpa(q_, k_, v_):
    return sdpa(q_, k_, v_)


def run_sdpa_bf16(q_, k_, v_):
    # the r4 production path (SAM_AUDIO_PE_SCORE_F32 unset): bf16 scores
    return sdpa(q_, k_, v_, score_dtype=jnp.bfloat16)


def run_sdpa_deferred(q_, k_, v_):
    """Deferred normalization (r5 candidate): write UNNORMALIZED bf16
    exp-weights and divide by the row sum at the (tiny) output instead —
    drops softmax's normalize pass (one full read + write of the score
    matrix, ~5.3 GB/layer at B=250) from the HBM bill."""
    scale = 1.0 / (D ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q_, k_,
                        preferred_element_type=jnp.float32) * scale
    logits = logits.astype(jnp.bfloat16)  # matmul-epilogue cast, like sdpa
    m = jnp.max(logits.astype(jnp.float32), axis=-1, keepdims=True)
    e = jnp.exp(logits.astype(jnp.float32) - m)
    s = jnp.sum(e, axis=-1)  # (B,H,Sq) — multi-output fuses with the e write
    e = e.astype(jnp.bfloat16)
    out = jnp.einsum("bhqk,bkhd->bqhd", e, v_,
                     preferred_element_type=jnp.float32)
    inv = (1.0 / s).astype(jnp.float32)
    return (out * jnp.swapaxes(inv, 1, 2)[..., None]).astype(v_.dtype)


# numerics first (single call, on a slice — fp32 scores at B=250 are 5.3 GB
# and OOM the chip next to the other buffers)
nb = min(B, 32)
ref = np.asarray(sdpa(q[:nb], k[:nb], v[:nb]), np.float32)
out = np.asarray(flash_attention(q[:nb], k[:nb], v[:nb], interpret=False),
                 np.float32)
err = np.abs(ref - out).max()
print(f"max |flash - sdpa| = {err:.5f} (bf16 inputs)")
errd = np.abs(ref - np.asarray(
    run_sdpa_deferred(q[:nb], k[:nb], v[:nb]), np.float32)).max()
print(f"max |deferred - sdpa| = {errd:.5f}")

if B <= 64:
    # fp32 scores at B=250 are 5.3 GB and OOM next to the other buffers
    timed(run_sdpa, "xla_sdpa f32")
t_b = timed(run_sdpa_bf16, "xla_sdpa bf16")  # the production path
t_d = timed(run_sdpa_deferred, "deferred-norm")
print(f"  deferred vs bf16 scores: {t_b / t_d:.2f}x")
for bq, bk in BLOCKS:
    def run_flash(q_, k_, v_, bq=bq, bk=bk):
        return flash_attention(q_, k_, v_, block_q=bq, block_k=bk,
                               interpret=False)

    t_f = timed(run_flash, f"flash {bq:>3}x{bk:<3}")
    print(f"  speedup vs bf16 scores: {t_b / t_f:.2f}x")
