"""Core neural-net ops as pure functions over param pytrees.

Design: params are nested dicts of jnp arrays using torch-style layouts
(Linear weight is (out, in); Conv1d weight is (out, in, k)) so that reference
checkpoints convert by key-mapping alone. Apply functions are pure and
jit/vmap/pjit-friendly.

Reference semantics: sam_audio/model/transformer.py (RMSNorm, ProjectionLayer,
FeedForward, TimestepEmbedder, modulate/gate) and sam_audio/model/model.py
(SinusoidalEmbedding, EmbedAnchors).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def uniform_init(key, shape, scale, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)


# ---------------------------------------------------------------------------
# Linear / Embedding
# ---------------------------------------------------------------------------


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32):
    """torch.nn.Linear default init (kaiming-uniform fan_in)."""
    wkey, bkey = jax.random.split(key)
    scale = 1.0 / math.sqrt(in_dim)
    p = {"weight": uniform_init(wkey, (out_dim, in_dim), scale, dtype)}
    if bias:
        p["bias"] = uniform_init(bkey, (out_dim,), scale, dtype)
    return p


def linear(params, x, compute_dtype=None):
    if "w8" in params:  # int8 serving mode (see ops/quant.py)
        from sam_audio_tpu.ops.quant import linear_int8

        return linear_int8(params, x, compute_dtype)
    if "w4" in params:  # int4 weight-storage mode (see ops/quant.py)
        from sam_audio_tpu.ops.quant import linear_int4

        return linear_int4(params, x, compute_dtype)
    w = params["weight"]
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        x = x.astype(compute_dtype)
    y = jnp.einsum("...i,oi->...o", x, w)
    if "bias" in params:
        b = params["bias"]
        if compute_dtype is not None:
            b = b.astype(compute_dtype)
        y = y + b
    return y


def embedding_init(key, num_embeddings: int, dim: int, padding_idx: Optional[int] = None,
                   dtype=jnp.float32):
    w = jax.random.normal(key, (num_embeddings, dim), dtype)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return {"weight": w}


def embedding(params, ids):
    return jnp.take(params["weight"], ids, axis=0)


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


def rmsnorm_init(dim: int, dtype=jnp.float32):
    return {"weight": jnp.ones((dim,), dtype)}


def rmsnorm(params, x, eps: float = 1e-5):
    """RMSNorm computed in fp32 (reference: sam_audio/model/transformer.py:36-47)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (normed * params["weight"].astype(jnp.float32)).astype(orig_dtype)


def layernorm_init(dim: int, dtype=jnp.float32):
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm(params, x, eps: float = 1e-5):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * params["weight"].astype(jnp.float32) + params["bias"].astype(
        jnp.float32
    )
    return out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# adaLN helpers (reference: sam_audio/model/transformer.py:17-22)
# ---------------------------------------------------------------------------


def modulate(x, shift, scale):
    return x * (1 + scale) + shift


def gate(x, g):
    return x * g


def dropout(x, rate: float, rng=None):
    """Inverted dropout; identity when rate==0 or rng is None (inference)."""
    if rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def get_nonlinearity(kind: str):
    """reference: sam_audio/model/transformer.py:25-33 ('swiglu' handled by callers)."""
    return {
        "relu": jax.nn.relu,
        "gelu": jax.nn.gelu,  # note: jax gelu default is tanh-approx; use exact below
        "exact_gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "approx_gelu": lambda x: jax.nn.gelu(x, approximate=True),
        "srelu": lambda x: jnp.square(jax.nn.relu(x)),
        "silu": jax.nn.silu,
        "swiglu": None,
    }[kind]


# ---------------------------------------------------------------------------
# ProjectionLayer: w2(silu(w1(x)) * w3(x)) for swiglu, else w2(act(w1(x)))
# (reference: sam_audio/model/transformer.py:50-80)
# ---------------------------------------------------------------------------


def projection_init(key, in_dim, out_dim, non_linearity: str, fc_bias=False,
                    dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "w1": linear_init(k1, in_dim, out_dim, bias=fc_bias, dtype=dtype),
        "w2": linear_init(k2, out_dim, out_dim, bias=fc_bias, dtype=dtype),
    }
    if non_linearity == "swiglu":
        p["w3"] = linear_init(k3, in_dim, out_dim, bias=fc_bias, dtype=dtype)
    return p


def projection(params, x, non_linearity: str, compute_dtype=None,
               dropout_rate: float = 0.0, dropout_rng=None):
    h1 = linear(params["w1"], x, compute_dtype)
    if non_linearity == "swiglu":
        h = jax.nn.silu(h1) * linear(params["w3"], x, compute_dtype)
    else:
        h = get_nonlinearity(non_linearity)(h1)
    h = dropout(h, dropout_rate, dropout_rng)  # reference transformer.py:79
    return linear(params["w2"], h, compute_dtype)


# ---------------------------------------------------------------------------
# FeedForward (SwiGLU MLP with the reference's hidden-dim rounding)
# (reference: sam_audio/model/transformer.py:164-206)
# ---------------------------------------------------------------------------


def feedforward_init(key, dim, hidden_dim, non_linearity="swiglu", fc_bias=False,
                     dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "w1": linear_init(k1, dim, hidden_dim, bias=fc_bias, dtype=dtype),
        "w2": linear_init(k2, hidden_dim, dim, bias=fc_bias, dtype=dtype),
    }
    if non_linearity == "swiglu":
        p["w3"] = linear_init(k3, dim, hidden_dim, bias=fc_bias, dtype=dtype)
    return p


def feedforward(params, x, non_linearity="swiglu", compute_dtype=None,
                dropout_rate: float = 0.0, dropout_rng=None):
    h1 = linear(params["w1"], x, compute_dtype)
    if non_linearity == "swiglu":
        h = jax.nn.silu(h1) * linear(params["w3"], x, compute_dtype)
    else:
        h = get_nonlinearity(non_linearity)(h1)
    h = dropout(h, dropout_rate, dropout_rng)  # reference transformer.py:205
    return linear(params["w2"], h, compute_dtype)


# ---------------------------------------------------------------------------
# Sinusoidal / timestep embeddings
# ---------------------------------------------------------------------------


def sinusoidal_embedding(pos, dim: int, theta: float = 10000.0):
    """cos||sin sinusoidal embedding (reference: sam_audio/model/model.py:25-42).

    pos: (...,) float positions. Returns (..., dim).
    """
    half = dim // 2
    inv_freq = jnp.exp(
        -math.log(theta) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = pos.astype(jnp.float32)[..., None] * inv_freq
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def glide_timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """GLIDE-style frequencies (reference: sam_audio/model/transformer.py:228-253).

    Differs from `sinusoidal_embedding` in the denominator (`half` vs `half`),
    identical here, but kept separate to mirror reference structure; t: (B,).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def timestep_embedder_init(key, dim, frequency_embedding_dim, non_linearity="swiglu",
                           fc_bias=False, dtype=jnp.float32):
    return {
        "projection": projection_init(
            key, frequency_embedding_dim, dim, non_linearity, fc_bias, dtype
        )
    }


def timestep_embedder(params, t, frequency_embedding_dim, non_linearity="swiglu",
                      compute_dtype=None, dropout_rate: float = 0.0,
                      dropout_rng=None):
    x = glide_timestep_embedding(t, frequency_embedding_dim)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    return projection(params["projection"], x, non_linearity, compute_dtype,
                      dropout_rate=dropout_rate, dropout_rng=dropout_rng)


# ---------------------------------------------------------------------------
# EmbedAnchors (reference: sam_audio/model/model.py:45-65)
# ---------------------------------------------------------------------------


def embed_anchors_init(key, num_embeddings, embedding_dim, out_dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "embed": embedding_init(
            k1, num_embeddings + 1, embedding_dim, padding_idx=num_embeddings,
            dtype=dtype,
        ),
        "gate": jnp.zeros((1,), dtype),
        "proj": linear_init(k2, embedding_dim, out_dim, bias=False, dtype=dtype),
    }


def embed_anchors(params, x, anchor_ids=None, anchor_alignment=None,
                  compute_dtype=None):
    if anchor_ids is None:
        return x
    # gather per-frame anchor token ids via alignment: (B, T) indices into (B, A)
    gathered = jnp.take_along_axis(anchor_ids, anchor_alignment, axis=1)
    embs = embedding(params["embed"], gathered)
    proj = linear(params["proj"], embs, compute_dtype)
    g = jnp.tanh(params["gate"]).astype(proj.dtype)
    return x + g * proj


# ---------------------------------------------------------------------------
# AlignModalities (reference: sam_audio/model/align.py:8-50)
# 1x1 Conv over channels == a Linear on (B, T, C_in) after transpose.
# ---------------------------------------------------------------------------


def align_modalities_init(key, in_channels, out_channels, normalize=True,
                          with_gate=True, dtype=jnp.float32):
    p = {"conv": linear_init(key, in_channels, out_channels, bias=True, dtype=dtype)}
    if normalize:
        p["layer_norm"] = layernorm_init(out_channels, dtype)
    if with_gate:
        p["gate"] = jnp.zeros((1,), dtype)
    return p


def align_modalities(params, anchor, tgt=None, compute_dtype=None, eps: float = 1e-5):
    """anchor: (B, T, C_out); tgt: (B, C_in, T) or None."""
    if tgt is None:
        return anchor
    post = linear(params["conv"], jnp.swapaxes(tgt, 1, 2), compute_dtype)
    if "layer_norm" in params:
        post = layernorm(params["layer_norm"], post, eps)
    if "gate" not in params:
        return post
    g = jnp.tanh(params["gate"]).astype(post.dtype)
    return anchor + g * post
