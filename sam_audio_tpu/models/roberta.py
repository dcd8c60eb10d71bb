"""RoBERTa text encoder in JAX — the CLAP text tower.

laion_clap's text branch is an HF `RobertaModel` whose `pooler_output` feeds
`text_projection` (reference: sam_audio/ranking/clap.py:11-30 via
laion_clap.CLAP_Module; checkpoint keys `text_branch.*`). This is a faithful
post-LN BERT encoder with RoBERTa's padding-offset position ids and the
tanh pooler, weight-compatible with HF state_dicts (convert_roberta_state_dict)
and parity-tested against transformers.RobertaModel.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops.attention import attend


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5


def _layer_init(key, cfg: RobertaConfig, dtype):
    h, m = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 6)
    return {
        "attn": {
            "wq": N.linear_init(ks[0], h, h, bias=True, dtype=dtype),
            "wk": N.linear_init(ks[1], h, h, bias=True, dtype=dtype),
            "wv": N.linear_init(ks[2], h, h, bias=True, dtype=dtype),
            "wo": N.linear_init(ks[3], h, h, bias=True, dtype=dtype),
        },
        "attn_ln": N.layernorm_init(h, dtype),
        "fc1": N.linear_init(ks[4], h, m, bias=True, dtype=dtype),
        "fc2": N.linear_init(ks[5], m, h, bias=True, dtype=dtype),
        "ffn_ln": N.layernorm_init(h, dtype),
    }


def roberta_init(key, cfg: RobertaConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    layer_keys = jax.random.split(ks[0], cfg.num_layers)
    h = cfg.hidden_size
    return {
        "word_embeddings": N.embedding_init(ks[1], cfg.vocab_size, h,
                                            dtype=dtype),
        "position_embeddings": N.embedding_init(
            ks[2], cfg.max_position_embeddings, h, dtype=dtype
        ),
        "token_type_embeddings": N.embedding_init(ks[3], cfg.type_vocab_size,
                                                  h, dtype=dtype),
        "emb_ln": N.layernorm_init(h, dtype),
        "layers": jax.vmap(lambda k: _layer_init(k, cfg, dtype))(layer_keys),
        "pooler": N.linear_init(ks[4], h, h, bias=True, dtype=dtype),
    }


def roberta_position_ids(input_ids: jnp.ndarray, pad_token_id: int):
    """RoBERTa offsets positions past the pad id: non-pad token i gets
    position pad_id + 1 + (its 1-based index among non-pad tokens)."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + pad_token_id


def roberta_encode(params, input_ids, attention_mask, cfg: RobertaConfig,
                   compute_dtype=None, with_pooler: bool = True):
    """Returns (last_hidden_state (B,L,H) fp32, pooler_output (B,H) or None)."""
    b, t = input_ids.shape
    h = cfg.hidden_size
    nh = cfg.num_heads
    eps = cfg.layer_norm_eps
    valid = attention_mask.astype(bool)

    pos_ids = roberta_position_ids(input_ids, cfg.pad_token_id)
    x = (
        N.embedding(params["word_embeddings"], input_ids)
        + N.embedding(params["position_embeddings"], pos_ids)
        + params["token_type_embeddings"]["weight"][0][None, None, :]
    )
    x = N.layernorm(params["emb_ln"], x, eps)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    def body(hcur, layer):
        a = layer["attn"]
        q = N.linear(a["wq"], hcur, compute_dtype).reshape(b, t, nh, -1)
        k = N.linear(a["wk"], hcur, compute_dtype).reshape(b, t, nh, -1)
        v = N.linear(a["wv"], hcur, compute_dtype).reshape(b, t, nh, -1)
        o = attend(q, k, v, key_padding_mask=valid).reshape(b, t, h)
        attn_out = N.layernorm(
            layer["attn_ln"], hcur + N.linear(a["wo"], o, compute_dtype), eps
        )
        ffn = N.linear(
            layer["fc2"],
            jax.nn.gelu(N.linear(layer["fc1"], attn_out, compute_dtype),
                        approximate=False),
            compute_dtype,
        )
        return N.layernorm(layer["ffn_ln"], attn_out + ffn, eps), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = x.astype(jnp.float32)
    pooled = None
    if with_pooler and "pooler" in params:
        pooled = jnp.tanh(N.linear(params["pooler"], x[:, 0], None))
    return x, pooled


def convert_roberta_state_dict(sd, cfg: RobertaConfig, prefix: str = "",
                               consumed=None):
    """HF RobertaModel state_dict -> our params (torch weight layout kept).
    Pass a set as `consumed` to record exactly which keys were read (callers
    use it for fail-loud unconverted reporting)."""
    import numpy as np

    def g(k):
        if consumed is not None:
            consumed.add(prefix + k)
        return jnp.asarray(np.asarray(sd[prefix + k]))

    def lin(base):
        p = {"weight": g(f"{base}.weight")}
        if f"{prefix}{base}.bias" in sd:
            p["bias"] = g(f"{base}.bias")
        return p

    def ln(base):
        return {"weight": g(f"{base}.weight"), "bias": g(f"{base}.bias")}

    layers = []
    for i in range(cfg.num_layers):
        L = f"encoder.layer.{i}"
        layers.append({
            "attn": {
                "wq": lin(f"{L}.attention.self.query"),
                "wk": lin(f"{L}.attention.self.key"),
                "wv": lin(f"{L}.attention.self.value"),
                "wo": lin(f"{L}.attention.output.dense"),
            },
            "attn_ln": ln(f"{L}.attention.output.LayerNorm"),
            "fc1": lin(f"{L}.intermediate.dense"),
            "fc2": lin(f"{L}.output.dense"),
            "ffn_ln": ln(f"{L}.output.LayerNorm"),
        })
    params = {
        "word_embeddings": {"weight": g("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "weight": g("embeddings.position_embeddings.weight")
        },
        "token_type_embeddings": {
            "weight": g("embeddings.token_type_embeddings.weight")
        },
        "emb_ln": ln("embeddings.LayerNorm"),
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
    }
    if f"{prefix}pooler.dense.weight" in sd:
        params["pooler"] = lin("pooler.dense")
    return params
