"""PE-AV audio transformer encoder in JAX.

The judge runs both audios through a shared Perception-Encoder-AV
`Transformer` and a second "finetune" one (reference: sam_audio/model/judge.py:7-8,
46-47, 101-126; config `core.audio_visual_encoder.config.TransformerConfig`).

The encoder executes one canonical parameter layout (per-layer: ln1, attn
{wq,wk,wv,wo}, ln2, mlp {fc1,fc2} or swiglu {w1,w2,w3}; optional qk norms and
layer-scale; top-level optional pos_embed / ln_pre / final_norm) with
architecture switches on the config (prenorm, act, pos) so that
checkpoint.convert_peav_tower can map any of the common perception-models /
timm / CLIP / fairseq block styles onto it and run the real weights
faithfully. Layers share one structure, so the stack is a single lax.scan
over stacked params.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from sam_audio_tpu.config import PEAVTransformerConfig
from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops.attention import attend


@dataclass
class BaseModelOutputWithPooling:
    last_hidden_state: jnp.ndarray
    pooler_output: Optional[jnp.ndarray] = None


def _act_fn(name: str):
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "relu":
        return jax.nn.relu
    if name == "silu":
        return jax.nn.silu
    raise ValueError(f"unknown PE-AV activation {name!r}")


def _layer_init(key, cfg: PEAVTransformerConfig, dtype=jnp.float32):
    h = cfg.hidden_size
    mlp = int(cfg.mlp_ratio * h)
    ks = jax.random.split(key, 6)
    return {
        "ln1": N.layernorm_init(h, dtype),
        "attn": {
            "wq": N.linear_init(ks[0], h, h, bias=True, dtype=dtype),
            "wk": N.linear_init(ks[1], h, h, bias=True, dtype=dtype),
            "wv": N.linear_init(ks[2], h, h, bias=True, dtype=dtype),
            "wo": N.linear_init(ks[3], h, h, bias=True, dtype=dtype),
        },
        "ln2": N.layernorm_init(h, dtype),
        "mlp": {
            "fc1": N.linear_init(ks[4], h, mlp, bias=True, dtype=dtype),
            "fc2": N.linear_init(ks[5], mlp, h, bias=True, dtype=dtype),
        },
    }


def peav_init(key, cfg: PEAVTransformerConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    layer_keys = jax.random.split(k1, cfg.num_layers)
    return {
        "layers": jax.vmap(lambda k: _layer_init(k, cfg, dtype))(layer_keys),
        "final_norm": N.layernorm_init(cfg.hidden_size, dtype),
    }


def _per_head_norm(norm_params, x, eps):
    """RMS/LayerNorm over the head dim; x: (B, T, H, D)."""
    w = norm_params["weight"].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    if "bias" in norm_params:
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        out = (xf - mu) / jnp.sqrt(var + eps) * w + norm_params["bias"].astype(
            jnp.float32
        )
    else:
        out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps) * w
    return out.astype(x.dtype)


def peav_apply(params, x, cfg: PEAVTransformerConfig, padding_mask=None,
               compute_dtype=None) -> BaseModelOutputWithPooling:
    """x: (B, T, hidden); padding_mask: (B, T) bool True=valid."""
    b, t, h = x.shape
    nh = cfg.num_heads
    hd = h // nh
    eps = cfg.layer_norm_eps
    act = None if cfg.act == "swiglu" else _act_fn(cfg.act)
    if cfg.norm == "layernorm":
        norm = lambda p, y: N.layernorm(p, y, eps)  # noqa: E731
    else:
        norm = lambda p, y: N.rmsnorm(p, y, eps)  # noqa: E731

    if "pos_embed" in params:
        x = x + params["pos_embed"][:t][None].astype(x.dtype)
    elif cfg.pos == "sinusoidal":
        pos = N.sinusoidal_embedding(jnp.arange(t).astype(jnp.float32), h)
        x = x + pos[None].astype(x.dtype)
    rope_cs = None
    if cfg.pos == "rope":
        # interleaved-pair rotary (meta/perception-models freqs_cis style);
        # theta comes from the checkpoint's inv_freq (convert_peav_tower)
        from sam_audio_tpu.ops.rope import precompute_rope

        rope_cs = precompute_rope(hd, t, cfg.rope_theta)
    if "ln_pre" in params:
        x = norm(params["ln_pre"], x)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    def attn_block(layer, y):
        a = layer["attn"]
        q = N.linear(a["wq"], y, compute_dtype).reshape(b, t, nh, hd)
        k = N.linear(a["wk"], y, compute_dtype).reshape(b, t, nh, hd)
        v = N.linear(a["wv"], y, compute_dtype).reshape(b, t, nh, hd)
        if "q_norm" in a:
            q = _per_head_norm(a["q_norm"], q, eps)
        if "k_norm" in a:
            k = _per_head_norm(a["k_norm"], k, eps)
        if rope_cs is not None:
            from sam_audio_tpu.ops.rope import apply_rope

            q = apply_rope(q, *rope_cs)
            k = apply_rope(k, *rope_cs)
        mask = padding_mask
        if "bias_k" in a:  # torch MHA add_bias_kv: one learned kv token
            bk = jnp.broadcast_to(a["bias_k"].reshape(1, 1, nh, hd),
                                  (b, 1, nh, hd)).astype(k.dtype)
            bv = jnp.broadcast_to(a["bias_v"].reshape(1, 1, nh, hd),
                                  (b, 1, nh, hd)).astype(v.dtype)
            k = jnp.concatenate([k, bk], axis=1)
            v = jnp.concatenate([v, bv], axis=1)
            if mask is not None:
                mask = jnp.concatenate(
                    [mask, jnp.ones((b, 1), mask.dtype)], axis=1
                )
        o = attend(q, k, v, key_padding_mask=mask)
        return N.linear(a["wo"], o.reshape(b, t, h), compute_dtype)

    def mlp_block(layer, y):
        m = layer["mlp"]
        if "w3" in m:  # swiglu (llama convention: w1=gate, w3=up, w2=down)
            return N.linear(
                m["w2"],
                jax.nn.silu(N.linear(m["w1"], y, compute_dtype))
                * N.linear(m["w3"], y, compute_dtype),
                compute_dtype,
            )
        return N.linear(m["fc2"], act(N.linear(m["fc1"], y, compute_dtype)),
                        compute_dtype)

    def body(hcur, layer):
        if cfg.prenorm:
            a = attn_block(layer, norm(layer["ln1"], hcur))
            if "ls1" in layer:
                a = a * layer["ls1"].astype(a.dtype)
            hcur = hcur + a
            mo = mlp_block(layer, norm(layer["ln2"], hcur))
            if "ls2" in layer:
                mo = mo * layer["ls2"].astype(mo.dtype)
            hcur = hcur + mo
        else:  # post-LN (BERT-style)
            hcur = norm(layer["ln1"], hcur + attn_block(layer, hcur))
            hcur = norm(layer["ln2"], hcur + mlp_block(layer, hcur))
        return hcur, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    if "final_norm" in params:
        x = norm(params["final_norm"], x)
    x = x.astype(jnp.float32)

    if padding_mask is not None:
        m = padding_mask[:, :, None].astype(jnp.float32)
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    else:
        pooled = jnp.mean(x, axis=1)
    return BaseModelOutputWithPooling(last_hidden_state=x, pooler_output=pooled)
