"""DiT backbone (adaLN-single diffusion transformer) in pure-functional JAX.

Capabilities match the reference DiT (sam_audio/model/transformer.py:291-524):
per-block learned (6, dim) scale-shift tables added to a shared projection of
the timestep embedding, RoPE self-attention with optional per-head q/k RMSNorm,
un-gated cross-attention to the text memory, SwiGLU FFN, Patcher conv stem,
final adaLN modulation and linear head.

TPU-first design choices:
  * All N layers share one structure, so their params are stacked on a leading
    axis and the layer loop is a single `lax.scan` — one compiled block
    regardless of depth (fast compiles, small executables).
  * RoPE tables are trace-time constants sized to the actual (padded) sequence.
  * Attention dispatches between fused XLA SDPA (short seqs) and a Pallas
    flash kernel (long seqs); see ops/attention.py.
  * Matmuls run in a configurable compute dtype (bf16 by default) with fp32
    normalization statistics.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from sam_audio_tpu.config import TransformerConfig
from sam_audio_tpu.ops import conv as C
from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops.attention import attend
from sam_audio_tpu.ops.rope import apply_rope_half, precompute_rope


# ---------------------------------------------------------------------------
# Attention (reference: sam_audio/model/transformer.py:83-161)
# ---------------------------------------------------------------------------


def attention_init(key, dim, head_dim, n_heads, n_kv_heads, use_qk_norm=False,
                   fc_bias=False, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    p = {
        "wq": N.linear_init(ks[0], dim, n_heads * head_dim, bias=fc_bias, dtype=dtype),
        "wk": N.linear_init(ks[1], dim, n_kv_heads * head_dim, bias=fc_bias, dtype=dtype),
        "wv": N.linear_init(ks[2], dim, n_kv_heads * head_dim, bias=fc_bias, dtype=dtype),
        "wo": N.linear_init(ks[3], n_heads * head_dim, dim, bias=fc_bias, dtype=dtype),
    }
    if use_qk_norm:
        p["q_norm"] = N.rmsnorm_init(head_dim, dtype)
        p["k_norm"] = N.rmsnorm_init(head_dim, dtype)
    return p


def attention_apply(params, x, *, n_heads, n_kv_heads, head_dim, cross_x=None,
                    key_padding_mask=None, rope_tables=None, norm_eps=1e-5,
                    compute_dtype=None, attend_fn=None):
    """x: (B, Tq, dim); cross_x: (B, Tk, dim) or None for self-attention.

    NOTE (parity): the reference splits heads as reshape(B,T,C//H,H).permute,
    i.e. head h takes strided channels [h::H]; we match torch checkpoints by
    converting weights at load time instead (see checkpoint.py), and use the
    contiguous (T, H, D) split here, which is layout-friendlier on TPU.
    """
    src = x if cross_x is None else cross_x
    b, tq, _ = x.shape
    tk = src.shape[1]
    q = N.linear(params["wq"], x, compute_dtype).reshape(b, tq, n_heads, head_dim)
    k = N.linear(params["wk"], src, compute_dtype).reshape(b, tk, n_kv_heads, head_dim)
    v = N.linear(params["wv"], src, compute_dtype).reshape(b, tk, n_kv_heads, head_dim)
    if (
        cross_x is None
        and attend_fn is None
        and rope_tables is not None
        and "q_norm" in params
        and n_kv_heads == n_heads
        and head_dim % 128 == 0
        and tq <= 512
    ):
        from sam_audio_tpu.ops.fused_attention import (
            fused_attention_enabled,
            fused_glue_attention,
        )

        if fused_attention_enabled():
            # one Pallas kernel for qk-norm + rope + masked SDPA (short
            # sequences; see ops/fused_attention.py)
            out = fused_glue_attention(
                q, k, v, params["q_norm"]["weight"], params["k_norm"]["weight"],
                rope_tables[0], rope_tables[1],
                key_padding_mask=key_padding_mask, eps=norm_eps,
            )
            out = out.reshape(b, tq, n_heads * head_dim)
            return N.linear(params["wo"], out, compute_dtype)
    if "q_norm" in params:
        q = N.rmsnorm(params["q_norm"], q, norm_eps)
        k = N.rmsnorm(params["k_norm"], k, norm_eps)
    if rope_tables is not None:
        # split-half rotary (q/k projection channels are deinterleaved at
        # init/conversion time — checkpoint.deinterleave_qk_heads): aligned
        # half-width multiplies instead of stride-2 lane relayouts
        cos, sin = rope_tables
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
    if n_kv_heads != n_heads:
        rep = n_heads // n_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    out = (attend_fn or attend)(q, k, v, key_padding_mask=key_padding_mask)
    out = out.reshape(b, tq, n_heads * head_dim)
    return N.linear(params["wo"], out, compute_dtype)


# ---------------------------------------------------------------------------
# DiT block (reference: sam_audio/model/transformer.py:291-391)
# ---------------------------------------------------------------------------


def dit_block_init(key, cfg: TransformerConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    head_dim = cfg.head_dim
    p = {
        "attention": attention_init(
            ks[0], cfg.dim, head_dim, cfg.n_heads, cfg.n_heads,
            use_qk_norm=cfg.qk_norm, fc_bias=cfg.fc_bias, dtype=dtype,
        ),
        "cross_attention": attention_init(
            ks[1], cfg.dim, head_dim, cfg.n_heads, cfg.n_heads,
            use_qk_norm=cfg.qk_norm, fc_bias=cfg.fc_bias, dtype=dtype,
        ),
        "feed_forward": N.feedforward_init(
            ks[2], cfg.dim, cfg.ffn_hidden_dim, cfg.non_linearity, cfg.fc_bias, dtype
        ),
        "attention_norm": N.rmsnorm_init(cfg.dim, dtype),
        "ffn_norm": N.rmsnorm_init(cfg.dim, dtype),
        "scale_shift_table": jax.random.normal(ks[3], (6, cfg.dim), dtype)
        / cfg.dim**0.5,
    }
    return p


def dit_block_apply(params, h, *, cfg: TransformerConfig, cross_x, t0,
                    padding_mask, memory_padding_mask, rope_tables,
                    compute_dtype=None, dropout_rng=None, attend_fn=None):
    """h: (B, T, dim); t0: (B, 6*dim) shared timestep projection.

    `attend_fn` overrides SELF-attention only (e.g. the ring
    context-parallel kernel, parallel/sp.py); cross-attention keys are the
    replicated text memory, so it always uses the local path."""
    b = h.shape[0]
    biases = params["scale_shift_table"][None].astype(jnp.float32) + t0.reshape(
        b, 6, -1
    ).astype(jnp.float32)
    biases = biases.astype(h.dtype)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
        biases[:, i][:, None, :] for i in range(6)
    )

    h_attn = attention_apply(
        params["attention"],
        N.modulate(N.rmsnorm(params["attention_norm"], h, cfg.norm_eps),
                   shift_msa, scale_msa),
        n_heads=cfg.n_heads, n_kv_heads=cfg.n_heads, head_dim=cfg.head_dim,
        key_padding_mask=padding_mask, rope_tables=rope_tables,
        norm_eps=cfg.norm_eps, compute_dtype=compute_dtype,
        attend_fn=attend_fn,
    )
    h = h + N.gate(h_attn, gate_msa)

    h_cross = attention_apply(
        params["cross_attention"], h, cross_x=cross_x,
        n_heads=cfg.n_heads, n_kv_heads=cfg.n_heads, head_dim=cfg.head_dim,
        key_padding_mask=memory_padding_mask, norm_eps=cfg.norm_eps,
        compute_dtype=compute_dtype,
    )
    h = h + h_cross  # un-gated cross-attn residual (reference: transformer.py:382-388)

    h_ff = N.feedforward(
        params["feed_forward"],
        N.modulate(N.rmsnorm(params["ffn_norm"], h, cfg.norm_eps),
                   shift_mlp, scale_mlp),
        cfg.non_linearity, compute_dtype,
        dropout_rate=cfg.dropout if dropout_rng is not None else 0.0,
        dropout_rng=dropout_rng,
    )
    return h + N.gate(h_ff, gate_mlp)


# ---------------------------------------------------------------------------
# Patcher conv stem (reference: sam_audio/model/patcher.py:144-164)
# ---------------------------------------------------------------------------


def _conv_block_init(key, in_ch, out_ch, kernel_size=3, dtype=jnp.float32):
    return {
        "groupnorm": C.groupnorm_init(in_ch, dtype),
        "project": C.conv1d_init(key, in_ch, out_ch, kernel_size, bias=True,
                                 dtype=dtype),
    }


def _conv_block_apply(params, x, num_groups=1, compute_dtype=None):
    x = C.groupnorm(params["groupnorm"], x, num_groups)
    x = jax.nn.silu(x)
    return C.audiocraft_conv1d(params["project"], x, compute_dtype=compute_dtype)


def patcher_init(key, in_channels, out_channels, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "block1": _conv_block_init(k1, in_channels, out_channels, dtype=dtype),
        "block2": _conv_block_init(k2, out_channels, out_channels, dtype=dtype),
    }
    if in_channels != out_channels:
        p["to_out"] = C.conv1d_init(k3, in_channels, out_channels, 1, dtype=dtype)
    return p


def patcher_apply(params, x, compute_dtype=None):
    """ResnetBlock1d with patch_size=1 (reference: patcher.py:104-164). x: (B,C,T)."""
    h = _conv_block_apply(params["block1"], x, compute_dtype=compute_dtype)
    h = _conv_block_apply(params["block2"], h, compute_dtype=compute_dtype)
    if "to_out" in params:
        return h + C.conv1d(params["to_out"], x, compute_dtype=compute_dtype)
    return h + x


# ---------------------------------------------------------------------------
# Full DiT
# ---------------------------------------------------------------------------


def dit_init(key, cfg: TransformerConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    layer_keys = jax.random.split(ks[0], cfg.n_layers)
    # Stack per-layer params on a leading axis so the layer loop is lax.scan.
    layers = jax.vmap(lambda k: dit_block_init(k, cfg, dtype))(layer_keys)
    p = {
        "layers": layers,
        "norm": N.rmsnorm_init(cfg.dim, dtype),
        "output": N.linear_init(ks[1], cfg.dim, cfg.out_channels, bias=cfg.fc_bias,
                                dtype=dtype),
        "x_embedder": patcher_init(ks[2], cfg.dim, cfg.dim, dtype),
        "y_embedder": {
            "projection": N.projection_init(
                ks[3], cfg.context_dim, cfg.dim, cfg.context_non_linearity,
                cfg.fc_bias, dtype,
            )
        },
        "t_embedder": N.timestep_embedder_init(
            ks[4], cfg.dim, cfg.frequency_embedding_dim,
            cfg.timestep_non_linearity, cfg.fc_bias, dtype,
        ),
        "t_block": N.linear_init(ks[5], cfg.dim, cfg.dim * 6, bias=cfg.t_block_bias,
                                 dtype=dtype),
        "final_layer_scale_shift_table": jax.random.normal(ks[6], (2, cfg.dim), dtype)
        / cfg.dim**0.5,
    }
    if cfg.context_norm:
        p["y_embedder"]["norm"] = N.rmsnorm_init(cfg.context_dim, dtype)
    if cfg.in_channels is not None:
        p["data_proj"] = N.linear_init(ks[7], cfg.in_channels, cfg.dim, bias=True,
                                       dtype=dtype)
    return p


def dit_prepare(params, x, time, *, cfg: TransformerConfig, memory=None,
                compute_dtype=None, dropout_rng=None):
    """Stem + embedders (everything before the layer scan). Returns
    (h, t, t0, y, rope_tables, layer_rngs, out_rng). Split out so the
    sequence-parallel path (parallel/sp.py) shares it bit-exactly."""
    if "data_proj" in params:
        x = N.linear(params["data_proj"], x, compute_dtype)

    # Patcher stem operates channels-first.
    h = patcher_apply(params["x_embedder"], jnp.swapaxes(x, 1, 2),
                      compute_dtype=compute_dtype)
    h = jnp.swapaxes(h, 1, 2)

    stem_rng = out_rng = layer_rngs = t_rng = y_rng = None
    if dropout_rng is not None:
        stem_rng, out_rng, t_rng, y_rng, lkey = jax.random.split(dropout_rng, 5)
        layer_rngs = jax.random.split(lkey, cfg.n_layers)
        h = N.dropout(h, cfg.dropout, stem_rng)  # reference transformer.py:488

    t = N.timestep_embedder(
        params["t_embedder"], time, cfg.frequency_embedding_dim,
        cfg.timestep_non_linearity, compute_dtype,
        dropout_rate=cfg.dropout if t_rng is not None else 0.0,
        dropout_rng=t_rng,
    )  # (B, dim)
    t0 = N.get_nonlinearity(cfg.t_block_non_linearity)(t)
    t0 = N.linear(params["t_block"], t0, compute_dtype)  # (B, 6*dim)

    y = None
    if memory is not None:
        ym = memory
        if "norm" in params["y_embedder"]:
            ym = N.rmsnorm(params["y_embedder"]["norm"], ym, cfg.norm_eps)
        if compute_dtype is not None:
            ym = ym.astype(compute_dtype)
        y = N.projection(
            params["y_embedder"]["projection"], ym,
            cfg.context_non_linearity, compute_dtype,
            dropout_rate=cfg.context_embedder_dropout
            if y_rng is not None else 0.0,
            dropout_rng=y_rng,
        )

    rope_tables = None
    if cfg.use_rope:
        theta = max(10000, 2 * cfg.max_positions)
        rope_tables = precompute_rope(cfg.head_dim, h.shape[1], theta)
    return h, t, t0, y, rope_tables, layer_rngs, out_rng


def dit_finalize(params, h, t, *, cfg: TransformerConfig, compute_dtype=None,
                 out_rng=None):
    """Final adaLN modulate + output head (per-token; shared with sp.py)."""
    shift, scale = (
        params["final_layer_scale_shift_table"][None].astype(jnp.float32)
        + t[:, None].astype(jnp.float32)
    ).astype(h.dtype).swapaxes(0, 1)
    shift = shift[:, None, :]
    scale = scale[:, None, :]

    h = N.rmsnorm(params["norm"], h, cfg.norm_eps)
    h = N.modulate(h, shift, scale)
    if out_rng is not None:
        h = N.dropout(h, cfg.dropout, out_rng)  # reference transformer.py:517
    return N.linear(params["output"], h, compute_dtype)


def dit_apply(params, x, time, *, cfg: TransformerConfig, padding_mask=None,
              memory=None, memory_padding_mask=None, compute_dtype=None,
              remat: bool = False, dropout_rng=None, unroll: int | None = None):
    """x: (B, T, in_channels or dim); time: (B,); memory: (B, L, context_dim).

    Returns (B, T, out_channels). Reference: sam_audio/model/transformer.py:473-524.
    `remat=True` rematerializes each layer in the backward pass (training
    memory ~ one layer's activations instead of n_layers); `remat="dots"`
    additionally SAVES every non-batched matmul output (qkv/out/ffn
    projections) so the re-forward replays only elementwise/attention work —
    fewer backward FLOPs for ~one layer's dot outputs of extra HBM per layer.
    `dropout_rng` enables training dropout at the reference's sites
    (post-stem, FFN hidden, pre-output; rate cfg.dropout).
    `unroll` unrolls the layer scan (XLA can then overlap one layer's
    VPU/HBM glue with the next layer's matmuls); None reads
    SAM_AUDIO_SCAN_UNROLL (default 1). n_layers must divide by it.
    """
    if unroll is None:
        unroll = int(os.environ.get("SAM_AUDIO_SCAN_UNROLL", "1"))
    h, t, t0, y, rope_tables, layer_rngs, out_rng = dit_prepare(
        params, x, time, cfg=cfg, memory=memory, compute_dtype=compute_dtype,
        dropout_rng=dropout_rng,
    )
    with_dropout = layer_rngs is not None

    def scan_body(carry, xs):
        layer_params, layer_rng = xs if with_dropout else (xs, None)
        out = dit_block_apply(
            layer_params, carry, cfg=cfg, cross_x=y, t0=t0,
            padding_mask=padding_mask, memory_padding_mask=memory_padding_mask,
            rope_tables=rope_tables, compute_dtype=compute_dtype,
            dropout_rng=layer_rng,
        )
        return out, None

    if remat:
        if remat == "dots":
            policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        elif remat is True or remat == "full":
            policy = None
        else:
            raise ValueError(f"unknown remat policy {remat!r}")
        scan_body = jax.checkpoint(scan_body, policy=policy)
    xs = (params["layers"], layer_rngs) if with_dropout else params["layers"]
    h, _ = jax.lax.scan(scan_body, h, xs, unroll=unroll)

    return dit_finalize(params, h, t, cfg=cfg, compute_dtype=compute_dtype,
                        out_rng=out_rng)
