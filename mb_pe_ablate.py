"""Ablation microbench for the PE ViT-L tower at the serving shape
(N=250 frames, S=577, W=1024, 24 layers, bf16): times the layer stack with
individual components disabled to locate the MFU gap (VERDICT r4 task 2).

Variants: full / no_attn (SDPA -> v) / no_mlp / no_ln / qkv fused into one
matmul / attention with bf16 scores. Each is the same scan-over-layers
program shape, so differences are the component costs.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import PerceptionEncoderConfig
from sam_audio_tpu.models.pe_clip import pe_clip_init
from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops.attention import sdpa

NF = int(sys.argv[1]) if len(sys.argv) > 1 else 250
ITERS = 4
cfg = PerceptionEncoderConfig()
W, H = cfg.width, cfg.vit_heads
HD = W // H
S = (cfg.image_size // cfg.patch_size) ** 2 + 1
DT = jnp.bfloat16


def gen_params(key):
    shapes = jax.eval_shape(lambda k: pe_clip_init(k, cfg, DT), key)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def _gen(k):
        ks = jax.random.split(k, len(leaves))
        return [jax.random.normal(kk, s.shape, s.dtype) * 0.02
                for kk, s in zip(ks, leaves)]

    return jax.tree_util.tree_unflatten(treedef, _gen(key))


params = gen_params(jax.random.PRNGKey(0))
layers = params["layers"]
x0 = jax.jit(lambda k: jax.random.normal(k, (NF, S, W), DT) * 0.1)(
    jax.random.PRNGKey(1))


def make_stack(attn="bf16", mlp=True, ln=True, fused_qkv=False):
    def body(carry, layer):
        hc = carry
        y = N.layernorm(layer["ln1"], hc) if ln else hc
        if fused_qkv:
            wqkv = jnp.concatenate([layer["attn"][m]["weight"]
                                    for m in ("wq", "wk", "wv")], axis=0)
            bqkv = jnp.concatenate([layer["attn"][m]["bias"]
                                    for m in ("wq", "wk", "wv")])
            qkv = jnp.einsum("...i,oi->...o", y.astype(DT), wqkv.astype(DT))
            qkv = qkv + bqkv.astype(DT)
            q, k, v = [qkv[..., i * W:(i + 1) * W].reshape(NF, -1, H, HD)
                       for i in range(3)]
        else:
            q = N.linear(layer["attn"]["wq"], y, DT).reshape(NF, -1, H, HD)
            k = N.linear(layer["attn"]["wk"], y, DT).reshape(NF, -1, H, HD)
            v = N.linear(layer["attn"]["wv"], y, DT).reshape(NF, -1, H, HD)
        if attn == "none":
            o = v.reshape(NF, -1, W)
        else:
            o = sdpa(q, k, v,
                     score_dtype=DT if attn == "bf16" else None
                     ).reshape(NF, -1, W)
        hc = hc + N.linear(layer["attn"]["wo"], o, DT)
        if mlp:
            y = N.layernorm(layer["ln2"], hc) if ln else hc
            y = jax.nn.gelu(N.linear(layer["mlp"]["fc1"], y, DT),
                            approximate=True)
            hc = hc + N.linear(layer["mlp"]["fc2"], y, DT)
        return hc, None

    @jax.jit
    def run(x, ls):
        h, _ = jax.lax.scan(body, x, ls)
        return jnp.sum(h.astype(jnp.float32))

    return run


def timed(fn, label):
    t0 = time.time()
    _ = float(fn(x0, layers))
    print(f"{label}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
    ts = []
    for _i in range(ITERS):
        t0 = time.time()
        _ = float(fn(x0, layers))
        ts.append(time.time() - t0)
    p50 = float(np.median(ts))
    print(f"{label:28s} p50 {p50*1000:7.1f} ms")
    return p50


full = timed(make_stack(), "full (bf16 scores)")
f32s = timed(make_stack(attn="f32"), "full (fp32 scores)")
na = timed(make_stack(attn="none"), "no attention")
nm = timed(make_stack(mlp=False), "no mlp")
nl = timed(make_stack(ln=False), "no layernorm")
fq = timed(make_stack(fused_qkv=True), "fused qkv")
print(f"attention cost ~{(full-na)*1000:.0f} ms; mlp ~{(full-nm)*1000:.0f} ms;"
      f" ln ~{(full-nl)*1000:.0f} ms; fused-qkv delta {(full-fq)*1000:+.0f} ms")
lin_tflop = 24 * (4 * 2 * NF * S * W * W + 2 * 2 * NF * S * W * 4096) / 1e12
print(f"linear-only stack: {lin_tflop:.1f} TFLOP in {na*1000:.0f} ms -> "
      f"{lin_tflop/na:.0f} TFLOP/s ({100*lin_tflop/na/197:.0f}% MFU)")
