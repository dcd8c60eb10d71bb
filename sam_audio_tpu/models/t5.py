"""T5 encoder stack (t5-base by default) in JAX.

The reference conditions the DiT on T5-base last-hidden-state text features
(reference: sam_audio/model/text_encoder.py:11-37). Tokenization stays on the
host (see processor.py); this module is the device-side encoder:

  embed -> N x [RMSNorm -> relative-position-bias attention (no 1/sqrt(d)
  scaling, per T5) -> residual -> RMSNorm -> ReLU MLP -> residual]
  -> final RMSNorm

The relative position bias lives only in block 0 (HF convention); we compute
it once and pass it to every layer, which makes all layers identical and the
layer loop a single lax.scan over stacked params.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sam_audio_tpu.config import T5EncoderConfig
from sam_audio_tpu.ops import nn as N


def _relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """Bidirectional T5 relative position bucketing (HF numerics)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-20)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def compute_position_bias(rel_bias_weight, q_len: int, k_len: int,
                          num_buckets: int, max_distance: int):
    """rel_bias_weight: (num_buckets, n_heads) -> (1, n_heads, q_len, k_len)."""
    context_pos = jnp.arange(q_len)[:, None]
    memory_pos = jnp.arange(k_len)[None, :]
    relative_position = memory_pos - context_pos
    buckets = _relative_position_bucket(relative_position, num_buckets, max_distance)
    values = jnp.take(rel_bias_weight, buckets, axis=0)  # (q, k, h)
    return jnp.transpose(values, (2, 0, 1))[None]  # (1, h, q, k)


def _block_init(key, cfg: T5EncoderConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    inner = cfg.num_heads * cfg.head_dim
    return {
        "attn": {
            "q": N.linear_init(ks[0], cfg.dim, inner, bias=False, dtype=dtype),
            "k": N.linear_init(ks[1], cfg.dim, inner, bias=False, dtype=dtype),
            "v": N.linear_init(ks[2], cfg.dim, inner, bias=False, dtype=dtype),
            "o": N.linear_init(ks[3], inner, cfg.dim, bias=False, dtype=dtype),
            "layer_norm": N.rmsnorm_init(cfg.dim, dtype),
        },
        "ff": {
            "wi": N.linear_init(ks[4], cfg.dim, cfg.d_ff, bias=False, dtype=dtype),
            "wo": N.linear_init(ks[5], cfg.d_ff, cfg.dim, bias=False, dtype=dtype),
            "layer_norm": N.rmsnorm_init(cfg.dim, dtype),
        },
    }


def t5_encoder_init(key, cfg: T5EncoderConfig, dtype=jnp.float32):
    k_emb, k_bias, k_blocks = jax.random.split(key, 3)
    layer_keys = jax.random.split(k_blocks, cfg.num_layers)
    return {
        "token_embedding": N.embedding_init(k_emb, cfg.vocab_size, cfg.dim,
                                            dtype=dtype),
        "relative_attention_bias": N.embedding_init(
            k_bias, cfg.relative_attention_num_buckets, cfg.num_heads, dtype=dtype
        ),
        "blocks": jax.vmap(lambda k: _block_init(k, cfg, dtype))(layer_keys),
        "final_layer_norm": N.rmsnorm_init(cfg.dim, dtype),
    }


def _block_apply(params, h, position_bias, mask_bias, cfg: T5EncoderConfig,
                 compute_dtype=None):
    b, s, _ = h.shape
    hd, nh = cfg.head_dim, cfg.num_heads
    x = N.rmsnorm(params["attn"]["layer_norm"], h, cfg.layer_norm_eps)
    q = N.linear(params["attn"]["q"], x, compute_dtype).reshape(b, s, nh, hd)
    k = N.linear(params["attn"]["k"], x, compute_dtype).reshape(b, s, nh, hd)
    v = N.linear(params["attn"]["v"], x, compute_dtype).reshape(b, s, nh, hd)
    # T5 omits the 1/sqrt(d) attention scaling (absorbed into init).
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores + position_bias + mask_bias
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)
    attn = attn.reshape(b, s, nh * hd)
    h = h + N.linear(params["attn"]["o"], attn, compute_dtype)

    x = N.rmsnorm(params["ff"]["layer_norm"], h, cfg.layer_norm_eps)
    x = jax.nn.relu(N.linear(params["ff"]["wi"], x, compute_dtype))
    h = h + N.linear(params["ff"]["wo"], x, compute_dtype)
    return h


def t5_encode(params, input_ids, attention_mask, cfg: T5EncoderConfig,
              compute_dtype=None):
    """input_ids: (B, L) int32; attention_mask: (B, L) bool/int.
    Returns last_hidden_state (B, L, dim) in fp32."""
    h = N.embedding(params["token_embedding"], input_ids)
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
    s = input_ids.shape[1]
    position_bias = compute_position_bias(
        params["relative_attention_bias"]["weight"].astype(jnp.float32), s, s,
        cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance,
    )
    mask = attention_mask.astype(bool)
    mask_bias = jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min)[:, None, None, :]

    def body(carry, layer_params):
        return _block_apply(layer_params, carry, position_bias, mask_bias, cfg,
                            compute_dtype), None

    h, _ = jax.lax.scan(body, h, params["blocks"])
    h = N.rmsnorm(params["final_layer_norm"], h, cfg.layer_norm_eps)
    return h.astype(jnp.float32)
