"""PE-AV audio transformer encoder in JAX.

The judge runs both audios through a shared Perception-Encoder-AV
`Transformer` and a second "finetune" one (reference: sam_audio/model/judge.py:7-8,
46-47, 101-126; config `core.audio_visual_encoder.config.TransformerConfig`).

Implemented as a standard pre-LN transformer encoder over frame features:
sinusoidal positions, MHA with key-padding mask, GELU MLP, final LayerNorm;
returns an object with `.last_hidden_state` + `.pooler_output` (masked mean),
mirroring BaseModelOutputWithPooling semantics. Layers share one structure, so
the stack is a single lax.scan over stacked params.
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


def peav_apply(params, x, cfg: PEAVTransformerConfig, padding_mask=None,
               compute_dtype=None) -> BaseModelOutputWithPooling:
    """x: (B, T, hidden); padding_mask: (B, T) bool True=valid."""
    b, t, h = x.shape
    nh = cfg.num_heads
    hd = h // nh
    pos = N.sinusoidal_embedding(jnp.arange(t).astype(jnp.float32), h)
    x = x + pos[None].astype(x.dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    def body(carry, layer):
        hcur = carry
        y = N.layernorm(layer["ln1"], hcur, cfg.layer_norm_eps)
        q = N.linear(layer["attn"]["wq"], y, compute_dtype).reshape(b, t, nh, hd)
        k = N.linear(layer["attn"]["wk"], y, compute_dtype).reshape(b, t, nh, hd)
        v = N.linear(layer["attn"]["wv"], y, compute_dtype).reshape(b, t, nh, hd)
        o = attend(q, k, v, key_padding_mask=padding_mask)
        hcur = hcur + N.linear(layer["attn"]["wo"], o.reshape(b, t, h),
                               compute_dtype)
        y = N.layernorm(layer["ln2"], hcur, cfg.layer_norm_eps)
        y = jax.nn.gelu(N.linear(layer["mlp"]["fc1"], y, compute_dtype),
                        approximate=True)
        hcur = hcur + N.linear(layer["mlp"]["fc2"], y, compute_dtype)
        return hcur, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = N.layernorm(params["final_norm"], x, cfg.layer_norm_eps)
    x = x.astype(jnp.float32)

    if padding_mask is not None:
        m = padding_mask[:, :, None].astype(jnp.float32)
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    else:
        pooled = jnp.mean(x, axis=1)
    return BaseModelOutputWithPooling(last_hidden_state=x, pooler_output=pooled)
