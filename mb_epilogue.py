"""Microbench the DiT block's non-MXU ops at the k=8 serving shape.

Sizes the prize for a fused Pallas DiT-block epilogue (VERDICT r2 task 3 /
TODO item 3): per-op costs of the norms/modulate/RoPE/attention glue that
make up the ~18% non-matmul share of the 32-NFE ODE step.

Relay rules (memory: decoder-perf-findings): loop the op in lax.fori_loop
with a loop-CARRIED dependence, sync via scalar fetch, divide by REPS.

MEASURED GOTCHA (round 3): each fori_loop ITERATION pays ~0.5 ms of fixed
overhead on this relay-attached backend (a carried `c+1` on 4M elements
times identical to 4 chained adds), so sub-ms ops drown in the floor.
Amortize by NESTING the op NEST times per iteration (still carried) and
dividing by REPS*NEST; in-context A/B via the full bench program remains
the ground truth.
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

from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops.attention import attend
from sam_audio_tpu.ops.rope import apply_rope_half, precompute_rope

B, T, H, D = 8, 256, 16, 128
DIM = H * D
REPS = 50
NEST = 16  # ops per loop iteration: amortizes the ~0.5 ms/iter relay floor


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # compile+sync
    t0 = time.time()
    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / (REPS * NEST) * 1e3
    print(f"{name:42s} {dt:8.3f} ms/op", file=sys.stderr)
    return dt


def chain(body):
    """REPS iterations x NEST nested applications with a carried dependence
    (defeats LICM): the op's output feeds back as its input, so shapes must
    match. NEST amortizes the per-iteration floor."""

    def run(x, *rest):
        def it(i, c):
            for _ in range(NEST):
                c = body(c, *rest)
            return c

        return jax.lax.fori_loop(0, REPS, it, x)

    return run


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(B, T, DIM).astype(np.float32)).astype(jnp.bfloat16)
    qkv = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32)).astype(jnp.bfloat16)
    shift = jnp.asarray(rng.randn(B, 1, DIM).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.randn(B, 1, DIM).astype(np.float32)).astype(jnp.bfloat16)
    norm_w = {"weight": jnp.ones((DIM,), jnp.bfloat16)}
    hnorm_w = {"weight": jnp.ones((D,), jnp.bfloat16)}
    cos, sin = precompute_rope(D, T, 20000)
    mask = jnp.ones((B, T), bool)

    # 0. loop floor: trivial elementwise op — measures per-iteration overhead
    bench("FLOOR c+1 (B,T,2048)", chain(lambda c: c + 1.0), h)
    bench("FLOOR c+1 x4 chained",
          chain(lambda c: ((c + 1.0) + 1.0 + 1.0) + 1.0), h)

    # 1. rmsnorm + modulate on (B, T, DIM) — 2x per block
    bench("rmsnorm+modulate (B,T,2048)",
          chain(lambda c: N.modulate(N.rmsnorm(norm_w, c, 1e-5), shift, scale)),
          h)

    # 2. gate + residual — 2x per block
    bench("gate+residual (B,T,2048)",
          chain(lambda c: c + N.gate(c, scale)), h)

    # 3. qk rmsnorm on (B,T,H,D) — 2 tensors per block
    bench("qk rmsnorm (B,T,H,D)",
          chain(lambda c: N.rmsnorm(hnorm_w, c, 1e-5)), qkv)

    # 4. rope half-split — 2 tensors per block
    bench("rope apply_half (B,T,H,D)",
          chain(lambda c: apply_rope_half(c, cos, sin)), qkv)

    # 5. SDPA core (transposes + scores + softmax + out) — self-attn
    def sdpa(q):
        return attend(q, qkv, qkv, key_padding_mask=mask)

    bench("attend/self (B,T,H,D)", chain(sdpa), qkv)

    # 6. the full glue chain as in attention_apply (no matmuls):
    def glue(q):
        qq = N.rmsnorm(hnorm_w, q, 1e-5)
        kk = N.rmsnorm(hnorm_w, qkv, 1e-5)
        qq = apply_rope_half(qq, cos, sin)
        kk = apply_rope_half(kk, cos, sin)
        return attend(qq, kk, qkv, key_padding_mask=mask)

    bench("qknorm+rope+attend chain", chain(glue), qkv)

    # 7. reference MXU op for scale: one (B*T, DIM)x(DIM, DIM) matmul
    w = jnp.asarray(rng.randn(DIM, DIM).astype(np.float32)).astype(jnp.bfloat16)
    bench("matmul (B*T,2048)@(2048,2048)",
          chain(lambda c: jnp.dot(c.reshape(B * T, DIM), w,
                                  preferred_element_type=jnp.bfloat16)
                .reshape(B, T, DIM)), h)

    # 8. fused Pallas kernel for the same glue chain (ops/fused_attention.py)
    from sam_audio_tpu.ops.fused_attention import fused_glue_attention

    wq = jnp.ones((D,), jnp.float32)

    def fused(q):
        return fused_glue_attention(q, qkv, qkv, wq, wq, cos, sin, mask)

    bench("FUSED qknorm+rope+attend kernel", chain(fused), qkv)


if __name__ == "__main__":
    main()
