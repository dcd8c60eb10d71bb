"""Microbench: the PE-Core-L14-336 tower at the exact-visual serving shape
(250 frames x 577 tokens, bf16) on the real chip — the visual pipeline's
dominant non-DiT block (~95 TFLOP/request, reference vision_encoder.py:47-69).

Times the full encode_images program and an attention-free ablation (same
program with the SDPA replaced by identity) to split attention vs linear
time, under both score layouts:

  python mb_pe_tower.py [n_frames]               # bf16 scores (new default)
  SAM_AUDIO_PE_SCORE_F32=1 python mb_pe_tower.py # round-3 fp32 scores

Also reports the bf16-score vs fp32-score output cosine (quality guard).
Timing: scalar fetch per iteration (block_until_ready does not block on the
axon relay, CLAUDE.md); ~25 ms relay RTT is noise on a ~1 s program.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import PerceptionEncoderConfig
from sam_audio_tpu.models.pe_clip import encode_images, pe_clip_init

N = int(sys.argv[1]) if len(sys.argv) > 1 else 250
ITERS = 4
cfg = PerceptionEncoderConfig()


def gen_params(key):
    shapes = jax.eval_shape(lambda k: pe_clip_init(k, cfg, jnp.bfloat16), key)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def _gen(k):
        ks = jax.random.split(k, len(leaves))
        return [jax.random.normal(kk, s.shape, s.dtype) * 0.02
                for kk, s in zip(ks, leaves)]

    return jax.tree_util.tree_unflatten(treedef, _gen(key))


params = gen_params(jax.random.PRNGKey(0))
frames = jax.jit(
    lambda k: jax.random.normal(
        k, (N, 3, cfg.image_size, cfg.image_size), jnp.bfloat16) * 0.5
)(jax.random.PRNGKey(1))


def timed(fn, label):
    t0 = time.time()
    out = fn()
    _ = float(jnp.sum(out.astype(jnp.float32)))
    print(f"{label}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
    ts = []
    for _i in range(ITERS):
        t0 = time.time()
        out = fn()
        _ = float(jnp.sum(out.astype(jnp.float32)))
        ts.append(time.time() - t0)
    p50 = float(np.median(ts))
    print(f"{label}: p50 {p50*1000:.1f} ms (all {[round(t*1000) for t in ts]})")
    return p50, out


full = jax.jit(lambda p, x: encode_images(p, x, cfg,
                                          compute_dtype=jnp.bfloat16))
p50, out = timed(lambda: full(params, frames), f"encode_images N={N} bf16")

tflop = 24 * (4 * 2 * N * 577 * 1024 * 1024          # qkvo
              + 2 * 2 * N * 577 * 1024 * 4096        # mlp
              + 2 * 2 * N * 16 * 577 * 577 * 64) / 1e12  # scores+AV
peak = 197.0  # v5e bf16 TFLOP/s
print(f"~{tflop:.1f} TFLOP -> {tflop/p50:.1f} TFLOP/s "
      f"({100*tflop/p50/peak:.0f}% MFU)")

# quality guard: bf16 scores vs fp32 scores (both bf16 compute)
import os

if os.environ.get("SAM_AUDIO_PE_SCORE_F32") != "1":
    os.environ["SAM_AUDIO_PE_SCORE_F32"] = "1"
    full_f32 = jax.jit(lambda p, x: encode_images(p, x, cfg,
                                                  compute_dtype=jnp.bfloat16))
    p50_f32, out_f32 = timed(lambda: full_f32(params, frames),
                             f"encode_images N={N} bf16 (fp32 scores)")
    a = np.asarray(out, np.float32)
    b = np.asarray(out_f32, np.float32)
    cos = np.sum(a * b, -1) / np.maximum(
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-8)
    print(f"bf16-score vs fp32-score cosine: min {cos.min():.6f} "
          f"mean {cos.mean():.6f}; speedup {p50_f32/p50:.3f}x")
    del os.environ["SAM_AUDIO_PE_SCORE_F32"]
