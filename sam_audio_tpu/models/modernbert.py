"""ModernBERT text encoder in JAX.

The judge scores text with ModernBERT hidden layer 22's CLS vector
(reference: sam_audio/model/judge.py:48, 74-88; config.py:246). Architecture
(HF ModernBERT): token embeddings + LayerNorm; N pre-norm layers with fused
QKV, NeoX-style RoPE (rotate-half), alternating global attention (every
`global_attn_every_n_layers`-th layer, theta 160k) and local sliding-window
attention (window `local_attention`, theta 10k); GeGLU MLPs; no biases;
layer 0 has an identity attention norm.

`hidden_states[i]` indexing matches HF: [0] = embedding output, [i] = output
of layer i (pre-final-norm); last_hidden_state = final_norm(hidden_states[-1]).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import ModernBertTextConfig
from sam_audio_tpu.ops import nn as N


def _neox_rope_tables(head_dim: int, seqlen: int, theta: float):
    inv_freq = 1.0 / (
        theta ** (np.arange(0, head_dim, 2).astype(np.float64) / head_dim)
    )
    t = np.arange(seqlen, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # (S, D/2)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (S, D)
    return jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(np.sin(emb), jnp.float32)


def _apply_neox_rope(x, cos, sin):
    """x: (B, S, H, D); rotate-half convention (HF)."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s).astype(x.dtype)


def _norm_init(dim, dtype=jnp.float32):
    # ModernBERT LayerNorms have no bias
    return {"weight": jnp.ones((dim,), dtype)}


def _norm(params, x, eps):
    orig = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * params["weight"].astype(jnp.float32)
    return out.astype(orig)


def modernbert_init(key, cfg: ModernBertTextConfig, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.num_hidden_layers + 1)
    h = cfg.hidden_size
    layers = []
    for i in range(cfg.num_hidden_layers):
        lk = jax.random.split(ks[i], 4)
        layer = {
            "attn": {
                "Wqkv": N.linear_init(lk[0], h, 3 * h, bias=False, dtype=dtype),
                "Wo": N.linear_init(lk[1], h, h, bias=False, dtype=dtype),
            },
            "mlp": {
                "Wi": N.linear_init(lk[2], h, 2 * cfg.intermediate_size,
                                    bias=False, dtype=dtype),
                "Wo": N.linear_init(lk[3], cfg.intermediate_size, h, bias=False,
                                    dtype=dtype),
            },
            "mlp_norm": _norm_init(h, dtype),
        }
        if i != 0:
            layer["attn_norm"] = _norm_init(h, dtype)
        layers.append(layer)
    return {
        "embeddings": {
            "tok_embeddings": N.embedding_init(ks[-1], cfg.vocab_size, h,
                                               dtype=dtype),
            "norm": _norm_init(h, dtype),
        },
        "layers": layers,
        "final_norm": _norm_init(h, dtype),
    }


def modernbert_encode(
    params,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    cfg: ModernBertTextConfig,
    compute_dtype=None,
    output_hidden_states: bool = True,
) -> Tuple[jnp.ndarray, Optional[List[jnp.ndarray]]]:
    """Returns (last_hidden_state, hidden_states). (B, S) int ids."""
    b, s = input_ids.shape
    n_heads = cfg.num_attention_heads
    head_dim = cfg.hidden_size // n_heads

    h = N.embedding(params["embeddings"]["tok_embeddings"], input_ids)
    h = _norm(params["embeddings"]["norm"], h, cfg.norm_eps)
    if compute_dtype is not None:
        h = h.astype(compute_dtype)

    hidden_states = [h] if output_hidden_states else None

    pad_bias = jnp.where(attention_mask.astype(bool), 0.0,
                         jnp.finfo(jnp.float32).min)[:, None, None, :]
    # sliding-window bias for local layers
    window = cfg.local_attention // 2
    pos = jnp.arange(s)
    local_ok = jnp.abs(pos[:, None] - pos[None, :]) <= window
    local_bias = jnp.where(local_ok, 0.0, jnp.finfo(jnp.float32).min)[None, None]

    g_cos, g_sin = _neox_rope_tables(head_dim, s, cfg.global_rope_theta)
    l_cos, l_sin = _neox_rope_tables(head_dim, s, cfg.local_rope_theta)

    scale = 1.0 / (head_dim**0.5)
    for i, layer in enumerate(params["layers"]):
        is_global = (i % cfg.global_attn_every_n_layers) == 0
        x = h if i == 0 else _norm(layer["attn_norm"], h, cfg.norm_eps)
        qkv = N.linear(layer["attn"]["Wqkv"], x, compute_dtype)
        qkv = qkv.reshape(b, s, 3, n_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        cos, sin = (g_cos, g_sin) if is_global else (l_cos, l_sin)
        q = _apply_neox_rope(q, cos, sin)
        k = _apply_neox_rope(k, cos, sin)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + pad_bias
        if not is_global:
            logits = logits + local_bias
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, v,
                          preferred_element_type=jnp.float32).astype(v.dtype)
        attn = attn.reshape(b, s, cfg.hidden_size)
        h = h + N.linear(layer["attn"]["Wo"], attn, compute_dtype)

        x = _norm(layer["mlp_norm"], h, cfg.norm_eps)
        wi = N.linear(layer["mlp"]["Wi"], x, compute_dtype)
        inp, gate = jnp.split(wi, 2, axis=-1)
        act = jax.nn.gelu(inp, approximate=False) * gate
        h = h + N.linear(layer["mlp"]["Wo"], act, compute_dtype)

        if output_hidden_states:
            hidden_states.append(h)

    last = _norm(params["final_norm"], h, cfg.norm_eps)
    return last, hidden_states


def convert_modernbert_state_dict(sd, cfg: ModernBertTextConfig, prefix=""):
    """HF ModernBertModel state_dict -> our params. `prefix` e.g. 'text_model.'."""
    def g(k):
        return jnp.asarray(sd[prefix + k])

    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = f"layers.{i}"
        layer = {
            "attn": {
                "Wqkv": {"weight": g(f"{lp}.attn.Wqkv.weight")},
                "Wo": {"weight": g(f"{lp}.attn.Wo.weight")},
            },
            "mlp": {
                "Wi": {"weight": g(f"{lp}.mlp.Wi.weight")},
                "Wo": {"weight": g(f"{lp}.mlp.Wo.weight")},
            },
            "mlp_norm": {"weight": g(f"{lp}.mlp_norm.weight")},
        }
        if i != 0:
            layer["attn_norm"] = {"weight": g(f"{lp}.attn_norm.weight")}
        layers.append(layer)
    return {
        "embeddings": {
            "tok_embeddings": {"weight": g("embeddings.tok_embeddings.weight")},
            "norm": {"weight": g("embeddings.norm.weight")},
        },
        "layers": layers,
        "final_norm": {"weight": g("final_norm.weight")},
    }
