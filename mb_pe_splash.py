"""Microbench: jax splash-attention TPU kernel vs XLA SDPA at the PE-Core
ViT-L shape (B frames, S=577 tokens, H=16, D=64). Padding to the splash
block multiple is excluded via a static NumpyMask (same for every frame).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as sk,
    splash_attention_mask as sm,
)

from sam_audio_tpu.ops.attention import sdpa

args = sys.argv[1:]
_defaults = [64, 577, 16, 64]
B, S, H, D = [int(x) for x in args[:4]] + _defaults[len(args[:4]):]
ITERS = 8
PAD = 128
S_P = (S + PAD - 1) // PAD * PAD


def _block(cands, n):
    """Largest candidate block size that divides n (splash requires it)."""
    return next(c for c in cands if n % c == 0)

key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)

valid = np.zeros((S_P, S_P), dtype=bool)
valid[:, :S] = True  # padded KEYS masked out; padded q rows are sliced off
mask = sm.MultiHeadMask([sm.NumpyMask(valid) for _ in range(H)])
_bq = _block((512, 384, 320, 256, 128), S_P)
_bkv = _block((640, 512, 384, 256, 128), S_P)
block_sizes = sk.BlockSizes(
    block_q=_bq, block_kv=_bkv, block_kv_compute=_bkv,
)
splash = sk.make_splash_mha(
    mask, head_shards=1, q_seq_shards=1, block_sizes=block_sizes,
)


def splash_batched(q_, k_, v_):
    # splash expects (H, S, D) per item, q pre-scaled
    scale = 1.0 / (D ** 0.5)
    qp = jnp.pad(q_ * scale, ((0, 0), (0, S_P - S), (0, 0), (0, 0)))
    kp = jnp.pad(k_, ((0, 0), (0, S_P - S), (0, 0), (0, 0)))
    vp = jnp.pad(v_, ((0, 0), (0, S_P - S), (0, 0), (0, 0)))
    out = jax.vmap(splash)(
        jnp.swapaxes(qp, 1, 2), jnp.swapaxes(kp, 1, 2), jnp.swapaxes(vp, 1, 2)
    )  # (B, H, S_P, D)
    return jnp.swapaxes(out, 1, 2)[:, :S]


def timed(fn, name):
    @jax.jit
    def loop(q0):
        def body(_, carry):
            return fn(carry, k, v).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, ITERS, body, q0)

    r = loop(q)
    float(jnp.mean(r.astype(jnp.float32)))
    t0 = time.time()
    r = loop(q)
    float(jnp.mean(r.astype(jnp.float32)))
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name}: {dt:.2f} ms/iter")
    return dt


ref = np.asarray(sdpa(q, k, v), np.float32)
out = np.asarray(splash_batched(q, k, v), np.float32)
print(f"max |splash - sdpa| = {np.abs(ref - out).max():.5f}")

t_x = timed(lambda a, b, c: sdpa(a, b, c), "xla_sdpa")
t_s = timed(splash_batched, "splash  ")
print(f"speedup vs xla: {t_x / t_s:.2f}x")
