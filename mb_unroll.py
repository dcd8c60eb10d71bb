"""A/B the DiT layer-scan `unroll` factor at the k=8 serving shape.

The 32-NFE ODE runs at ~75-82% MFU; the residual ~18% is VPU/HBM glue
(adaLN, norms, rope, gating) that a rolled `lax.scan` serializes at layer
boundaries. Unrolling lets XLA's scheduler overlap layer i's epilogue with
layer i+1's qkv matmuls. This measures the FULL flagship dit_apply
(dim 2048 x 16 layers, B=8, T=250, L=16 text memory) under unroll 1/2/4.

Relay rules (CLAUDE.md): loop with a CARRIED dependence inside one jit
(output feeds back as input), sync via scalar fetch, divide by REPS.
dit_apply maps (B,T,in)->(B,T,out_channels), so carry through a linear
re-projection back to in_channels to keep the dependence.

Usage: python mb_unroll.py [unroll ...]   (default: 1 2 4)
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

from sam_audio_tpu.config import TransformerConfig
from sam_audio_tpu.models.dit import dit_apply, dit_init

B, T, L = 8, 250, 16
REPS = 16  # ~27 ms per DiT eval -> floor (~0.5 ms/iter) is <2% noise


def main():
    unrolls = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = TransformerConfig(in_channels=768)
    params = dit_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, 768), jnp.bfloat16)
    mem = jnp.asarray(rng.randn(B, L, cfg.context_dim), jnp.bfloat16)
    t = jnp.full((B,), 0.5, jnp.bfloat16)
    back = jnp.asarray(
        rng.randn(cfg.out_channels, 768).astype(np.float32) * 0.05, jnp.bfloat16
    )
    # Pass params as a jit ARG (not a closure capture): captured constants
    # would upload 2.3 GB through the relay per variant.
    params = jax.device_put(params)
    results = {}
    for unroll in unrolls:
        def step(p, carry, _):
            v = dit_apply(p, carry, t, cfg=cfg, memory=mem,
                          compute_dtype=jnp.bfloat16, unroll=unroll)
            return carry + v @ back, None

        @jax.jit
        def run(p, x0):
            y, _ = jax.lax.scan(lambda c, xs: step(p, c, xs), x0, None,
                                length=REPS)
            return jnp.mean(y.astype(jnp.float32))

        t0 = time.time()
        float(run(params, x))  # compile + first run
        print(f"unroll={unroll}: compile+run {time.time()-t0:.1f}s",
              file=sys.stderr)
        times = []
        for _ in range(3):
            t0 = time.time()
            float(run(params, x))
            times.append((time.time() - t0) / REPS * 1e3)
        best = min(times)
        results[unroll] = best
        print(f"unroll={unroll}: {best:7.3f} ms/DiT-eval  (runs: "
              + ", ".join(f"{v:.3f}" for v in times) + ")", file=sys.stderr)
    base = results.get(1)
    for u, v in results.items():
        rel = f" ({(base / v - 1) * +100:+.1f}% vs unroll=1)" if base else ""
        print(f"unroll={u}: {v:.3f} ms{rel}")


if __name__ == "__main__":
    main()
