"""WavLM speech encoder in JAX (microsoft/wavlm, HF layout).

Backbone of the audiobox-aesthetics predictor the reference uses for its
Aesthetic eval metric (reference: eval/metrics/aes.py:6-49 wraps
`audiobox_aesthetics.infer.AesPredictor`, whose encoder is WavLM). Parity is
tested against `transformers.WavLMModel` with converted random weights
(tests/test_wavlm.py), the same oracle pattern as the T5/ModernBERT towers.

Architecture (HF `modeling_wavlm`, do_stable_layer_norm=False "base" layout;
the stable_layer_norm "large" layout is a config switch):
  feature extractor: 7 conv1d (strides 5,2,2,2,2,2,2; kernels 10,3,3,3,3,2,2;
    512 ch, no bias), GroupNorm(512, 512) after the first conv, GELU
  feature projection: LayerNorm(512) -> Linear(512 -> hidden)
  encoder: grouped conv positional embedding (k=128, groups=16, weight-normed,
    trailing sample dropped, GELU) added to the input, LayerNorm, then N
    post-LN transformer layers whose self-attention adds a GATED relative
    position bias: a T5-style bucketed bias embedding lives in layer 0 only
    and is reused by all layers; every layer gates it per (batch, head, query)
    with sigmoid gates computed from its own hidden states.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.ops import nn as N


@dataclass(frozen=True)
class WavLMConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    num_buckets: int = 320
    max_distance: int = 800
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    # "group": GroupNorm after conv 0 only, convs bias-free (wavlm-base);
    # "layer": LayerNorm after every conv, convs with bias (wavlm-large).
    feat_extract_norm: str = "group"
    do_stable_layer_norm: bool = False


def _linear_init(key, din, dout, dtype):
    return N.linear_init(key, din, dout, bias=True, dtype=dtype)


def wavlm_init(key, cfg: WavLMConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    convs = []
    cin = 1
    ck = jax.random.split(ks[0], len(cfg.conv_dim))
    for i, (c, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        conv = {"weight": jax.random.normal(ck[i], (c, cin, k), dtype) * 0.02}
        if cfg.feat_extract_norm == "layer":
            conv["bias"] = jnp.zeros((c,), dtype)
            conv["layer_norm"] = N.layernorm_init(c, dtype)
        elif i == 0:
            conv["group_norm"] = {"weight": jnp.ones((c,), dtype),
                                  "bias": jnp.zeros((c,), dtype)}
        convs.append(conv)
        cin = c
    h = cfg.hidden_size
    layer_keys = jax.random.split(ks[1], cfg.num_layers)

    def layer_init(k, first):
        kk = jax.random.split(k, 8)
        p = {
            "attention": {
                "q_proj": _linear_init(kk[0], h, h, dtype),
                "k_proj": _linear_init(kk[1], h, h, dtype),
                "v_proj": _linear_init(kk[2], h, h, dtype),
                "out_proj": _linear_init(kk[3], h, h, dtype),
                "gru_rel_pos_const": jnp.ones((1, cfg.num_heads, 1, 1), dtype),
                "gru_rel_pos_linear": _linear_init(
                    kk[4], h // cfg.num_heads, 8, dtype),
            },
            "layer_norm": N.layernorm_init(h, dtype),
            "intermediate_dense": _linear_init(kk[5], h, cfg.intermediate_size,
                                               dtype),
            "output_dense": _linear_init(kk[6], cfg.intermediate_size, h,
                                         dtype),
            "final_layer_norm": N.layernorm_init(h, dtype),
        }
        if first:
            p["attention"]["rel_attn_embed"] = (
                jax.random.normal(kk[7], (cfg.num_buckets, cfg.num_heads),
                                  dtype) * 0.02)
        return p

    return {
        "feature_extractor": convs,
        "feature_projection": {
            "layer_norm": N.layernorm_init(cfg.conv_dim[-1], dtype),
            "projection": _linear_init(ks[2], cfg.conv_dim[-1], h, dtype),
        },
        "pos_conv": {
            "weight": jax.random.normal(
                ks[3], (h, h // cfg.num_conv_pos_embedding_groups,
                        cfg.num_conv_pos_embeddings), dtype) * 0.02,
            "bias": jnp.zeros((h,), dtype),
        },
        "encoder_layer_norm": N.layernorm_init(h, dtype),
        "layers": [layer_init(layer_keys[i], i == 0)
                   for i in range(cfg.num_layers)],
    }


def _relative_position_buckets(qlen: int, klen: int, num_buckets: int,
                               max_distance: int) -> np.ndarray:
    """T5-style log buckets (HF WavLMAttention._relative_positions_bucket)."""
    ctx = np.arange(qlen)[:, None]
    mem = np.arange(klen)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / math.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return buckets + np.where(is_small, rel, large)


def feature_extract(params, cfg: WavLMConfig, wav: jnp.ndarray,
                    compute_dtype=None) -> jnp.ndarray:
    """wav: (B, T) -> (B, frames, conv_dim[-1]); 16 kHz in, 50 fps out."""
    x = wav[:, None, :]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    for i, conv in enumerate(params["feature_extractor"]):
        w = conv["weight"]
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
        x = jax.lax.conv_general_dilated(
            x, w, (cfg.conv_stride[i],), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))
        if "bias" in conv:
            x = x + conv["bias"].astype(x.dtype)[None, :, None]
        if "group_norm" in conv:
            from sam_audio_tpu.ops.conv import groupnorm

            x = groupnorm(conv["group_norm"], x, num_groups=x.shape[1])
        elif "layer_norm" in conv:
            # cross-channel LN (HF WavLMLayerNormConvLayer: transpose, LN, back)
            x = jnp.swapaxes(
                N.layernorm(conv["layer_norm"], jnp.swapaxes(x, 1, 2),
                            cfg.layer_norm_eps), 1, 2)
        x = jax.nn.gelu(x, approximate=False)
    return jnp.swapaxes(x, 1, 2)


def wavlm_encode(params, cfg: WavLMConfig, wav: jnp.ndarray,
                 pad_mask: jnp.ndarray | None = None, compute_dtype=None,
                 output_hidden_states: bool = False):
    """wav: (B, T) 16 kHz -> final hidden states (B, frames, hidden)
    (or the list of all num_layers+1 hidden states)."""
    eps = cfg.layer_norm_eps
    feats = feature_extract(params, cfg, wav, compute_dtype)
    h = N.layernorm(params["feature_projection"]["layer_norm"], feats, eps)
    h = N.linear(params["feature_projection"]["projection"], h, compute_dtype)

    # frame-level padding mask from the sample-level one
    frame_mask = None
    if pad_mask is not None:
        idx = jnp.asarray(np.arange(h.shape[1]), jnp.int32)
        lens = jnp.sum(pad_mask.astype(jnp.int32), axis=-1)
        for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
            lens = (lens - k) // s + 1
        frame_mask = idx[None, :] < lens[:, None]
        h = jnp.where(frame_mask[:, :, None], h, 0.0)

    # grouped conv positional embedding, same-pad with one trailing sample
    # dropped (HF WavLMPositionalConvEmbedding: pad 64 both sides, k=128)
    pad = cfg.num_conv_pos_embeddings // 2
    w = params["pos_conv"]["weight"]
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
    pos = jax.lax.conv_general_dilated(
        jnp.swapaxes(h, 1, 2).astype(w.dtype), w, (1,), [(pad, pad)],
        feature_group_count=cfg.num_conv_pos_embedding_groups,
        dimension_numbers=("NCH", "OIH", "NCH"))
    pos = pos + params["pos_conv"]["bias"].astype(pos.dtype)[None, :, None]
    if cfg.num_conv_pos_embeddings % 2 == 0:
        pos = pos[:, :, :-1]
    pos = jax.nn.gelu(jnp.swapaxes(pos, 1, 2), approximate=False)
    h = h + pos
    if not cfg.do_stable_layer_norm:
        # post-LN layout normalizes before the stack; the stable (pre-LN)
        # layout applies encoder_layer_norm after the last layer instead
        h = N.layernorm(params["encoder_layer_norm"], h, eps)

    b, t, hidden = h.shape
    nh = cfg.num_heads
    hd = hidden // nh
    buckets = _relative_position_buckets(t, t, cfg.num_buckets,
                                         cfg.max_distance)
    rel_embed = params["layers"][0]["attention"]["rel_attn_embed"]
    # (T, T, H) gathered -> (H, Tq, Tk), shared ungated across layers
    position_bias = jnp.transpose(
        rel_embed.astype(jnp.float32)[jnp.asarray(buckets)], (2, 0, 1))

    attn_mask = None
    if frame_mask is not None:
        attn_mask = jnp.where(frame_mask[:, None, None, :], 0.0, -jnp.inf)

    all_hidden = [h]
    prenorm = cfg.do_stable_layer_norm
    for layer in params["layers"]:
        a = layer["attention"]
        x_attn = N.layernorm(layer["layer_norm"], h, eps) if prenorm else h
        # per-layer gate on the shared bias: sigmoid projections of the
        # attention input, per (batch, head, query)
        ghs = x_attn.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        proj = N.linear(a["gru_rel_pos_linear"], ghs, compute_dtype)
        proj = proj.reshape(b, nh, t, 2, 4).sum(-1)
        gates = jax.nn.sigmoid(proj.astype(jnp.float32))
        gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]
        const = a["gru_rel_pos_const"].astype(jnp.float32)
        gate = gate_a * (gate_b * const - 1.0) + 2.0        # (B, H, T, 1)
        gated_bias = gate * position_bias[None]             # (B, H, Tq, Tk)

        q = N.linear(a["q_proj"], x_attn, compute_dtype).reshape(b, t, nh, hd)
        k = N.linear(a["k_proj"], x_attn, compute_dtype).reshape(b, t, nh, hd)
        v = N.linear(a["v_proj"], x_attn, compute_dtype).reshape(b, t, nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores = scores * (hd ** -0.5) + gated_bias
        if attn_mask is not None:
            scores = scores + attn_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, hidden)
        attn_out = N.linear(a["out_proj"], ctx, compute_dtype)

        if prenorm:
            h = h + attn_out
            ff_in = N.layernorm(layer["final_layer_norm"], h, eps)
            ff = jax.nn.gelu(
                N.linear(layer["intermediate_dense"], ff_in, compute_dtype),
                approximate=False)
            h = h + N.linear(layer["output_dense"], ff, compute_dtype)
        else:
            h = N.layernorm(layer["layer_norm"], h + attn_out, eps)
            ff = jax.nn.gelu(
                N.linear(layer["intermediate_dense"], h, compute_dtype),
                approximate=False)
            ff = N.linear(layer["output_dense"], ff, compute_dtype)
            h = N.layernorm(layer["final_layer_norm"], h + ff, eps)
        all_hidden.append(h)

    if prenorm:
        h = N.layernorm(params["encoder_layer_norm"], h, eps)
        all_hidden[-1] = h

    if output_hidden_states:
        return all_hidden
    return h


def convert_wavlm_state_dict(sd, cfg: WavLMConfig, prefix: str = ""):
    """HF `WavLMModel` state_dict -> our params. Returns (params, unconverted).
    Handles both weight-norm spellings of pos_conv (weight_g/weight_v and
    torch>=2.1 parametrizations.original0/original1)."""
    from sam_audio_tpu.ops.conv import fold_weight_norm

    sub = {k[len(prefix):]: np.asarray(v) for k, v in sd.items()
           if k.startswith(prefix)}
    consumed = set()

    def g(k):
        consumed.add(k)
        return jnp.asarray(sub[k])

    def lin(base):
        p = {"weight": g(f"{base}.weight")}
        if f"{base}.bias" in sub:
            p["bias"] = g(f"{base}.bias")
        return p

    def ln(base):
        return {"weight": g(f"{base}.weight"), "bias": g(f"{base}.bias")}

    # "layer" extractors (wavlm-large) have a layer_norm on EVERY conv;
    # "group" (base) names its single conv-0 GroupNorm "layer_norm" too —
    # distinguish by whether conv 1 carries one.
    layer_mode = "feature_extractor.conv_layers.1.layer_norm.weight" in sub
    convs = []
    for i in range(len(cfg.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        conv = {"weight": g(f"{base}.conv.weight")}
        if f"{base}.conv.bias" in sub:
            conv["bias"] = g(f"{base}.conv.bias")
        if f"{base}.layer_norm.weight" in sub:
            key = "layer_norm" if layer_mode else "group_norm"
            conv[key] = ln(f"{base}.layer_norm")
        convs.append(conv)

    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.weight_g" in sub:
        wg, wv = g(f"{pc}.weight_g"), g(f"{pc}.weight_v")
    else:
        wg = g(f"{pc}.parametrizations.weight.original0")
        wv = g(f"{pc}.parametrizations.weight.original1")
    pos_w = fold_weight_norm(wg, wv, dim=2)

    layers = []
    for i in range(cfg.num_layers):
        base = f"encoder.layers.{i}"
        att = {
            "q_proj": lin(f"{base}.attention.q_proj"),
            "k_proj": lin(f"{base}.attention.k_proj"),
            "v_proj": lin(f"{base}.attention.v_proj"),
            "out_proj": lin(f"{base}.attention.out_proj"),
            "gru_rel_pos_const": g(f"{base}.attention.gru_rel_pos_const"),
            "gru_rel_pos_linear": lin(f"{base}.attention.gru_rel_pos_linear"),
        }
        if f"{base}.attention.rel_attn_embed.weight" in sub:
            att["rel_attn_embed"] = g(f"{base}.attention.rel_attn_embed.weight")
        layers.append({
            "attention": att,
            "layer_norm": ln(f"{base}.layer_norm"),
            "intermediate_dense": lin(f"{base}.feed_forward.intermediate_dense"),
            "output_dense": lin(f"{base}.feed_forward.output_dense"),
            "final_layer_norm": ln(f"{base}.final_layer_norm"),
        })

    params = {
        "feature_extractor": convs,
        "feature_projection": {
            "layer_norm": ln("feature_projection.layer_norm"),
            "projection": lin("feature_projection.projection"),
        },
        "pos_conv": {"weight": pos_w, "bias": g(f"{pc}.bias")},
        "encoder_layer_norm": ln("encoder.layer_norm"),
        "layers": layers,
    }
    skip = ("masked_spec_embed",)
    unconverted = sorted(
        prefix + k for k in sub
        if k not in consumed and not any(s in k for s in skip))
    return params, unconverted


# Fairseq/original-microsoft WavLM naming -> HF naming. The audiobox-
# aesthetics checkpoint vendors the original WavLM module (fairseq style:
# self_attn.grep_linear / grep_a, fc1/fc2, post_extract_proj, conv_layers as
# Sequentials), which maps 1:1 onto the HF layout converted above.
_FAIRSEQ_RENAMES = (
    (".self_attn.grep_linear", ".attention.gru_rel_pos_linear"),
    (".self_attn.grep_a", ".attention.gru_rel_pos_const"),
    (".self_attn.relative_attention_bias", ".attention.rel_attn_embed"),
    (".self_attn.q_proj", ".attention.q_proj"),
    (".self_attn.k_proj", ".attention.k_proj"),
    (".self_attn.v_proj", ".attention.v_proj"),
    (".self_attn.out_proj", ".attention.out_proj"),
    (".self_attn_layer_norm", ".layer_norm"),
    (".fc1", ".feed_forward.intermediate_dense"),
    (".fc2", ".feed_forward.output_dense"),
)


def fairseq_wavlm_to_hf_keys(sd):
    """Rename a fairseq/original-WavLM state_dict into the HF key layout
    accepted by convert_wavlm_state_dict. Unrecognized keys pass through
    unchanged (they then show up in `unconverted` — fail-loudly policy)."""
    import re

    out = {}
    for k, v in sd.items():
        nk = k
        # feature extractor Sequentials: conv_layers.i.0 = conv,
        # conv_layers.0.2 = Fp32GroupNorm
        nk = re.sub(r"feature_extractor\.conv_layers\.(\d+)\.0\.",
                    r"feature_extractor.conv_layers.\1.conv.", nk)
        nk = re.sub(r"feature_extractor\.conv_layers\.(\d+)\.2\.",
                    r"feature_extractor.conv_layers.\1.layer_norm.", nk)
        nk = nk.replace("post_extract_proj.", "feature_projection.projection.")
        if nk.startswith("layer_norm."):
            nk = "feature_projection.layer_norm." + nk[len("layer_norm."):]
        nk = nk.replace("encoder.pos_conv.0.", "encoder.pos_conv_embed.conv.")
        for a, b in _FAIRSEQ_RENAMES:
            nk = nk.replace(a, b)
        out[nk] = v
    return out
