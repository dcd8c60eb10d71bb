"""Int8 weight quantization for MXU serving (opt-in, non-parity).

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (measured 269 vs
152 TFLOP/s at 8k^3 on this chip), so quantizing the DiT's hot matmuls buys
throughput on the 32-NFE ODE hot loop at a small, bounded accuracy cost —
an opt-in serving mode in the spirit of `separate(preview_nfe=...)`.

Scheme (standard W8A8 dynamic):
  * weights: symmetric per-output-channel int8, scale = max|w_row| / 127,
    quantized ONCE at load time (`quantize_linear` / `quantize_dit_params`);
  * activations: symmetric per-token dynamic int8 (one max-abs VPU pass);
  * matmul: `lax.dot_general` int8 x int8 with int32 accumulation on the MXU;
  * dequant fused into the epilogue: y = y_i32 * (s_act * s_w) + bias.

`ops.nn.linear` dispatches here automatically when a param dict carries
"w8" instead of "weight", so quantizing the param tree switches the model
without touching any call site. Norms, softmax, RoPE, convs, and the output
head stay bf16/fp32.

No reference counterpart (the reference serves fp32/bf16 torch only;
sam_audio/model/transformer.py). This is a TPU-native extension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_linear(params):
    """{"weight": (out, in) float, ["bias"]} -> {"w8", "w_scale", ["bias"]}.

    Works on scan-stacked weights too ((L, out, in): scales are (L, out)).
    """
    w = params["weight"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w8 = jnp.round(w / scale).astype(jnp.int8)
    out = {"w8": w8, "w_scale": scale.squeeze(-1)}
    if "bias" in params:
        out["bias"] = params["bias"]
    return out


def linear_int8(params, x, compute_dtype=None):
    """y = x @ w8.T * (s_act * s_w) + bias, int8 on the MXU.

    x: (..., in). Per-token dynamic activation quantization; the max-abs
    pass and the dequant multiply fuse into the surrounding XLA program.
    """
    del compute_dtype  # accumulation dtype is fixed by the int8 path
    xf = x.astype(jnp.float32)
    s_act = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_act = jnp.maximum(s_act, 1e-12) / 127.0
    x8 = jnp.round(xf / s_act).astype(jnp.int8)
    y = jax.lax.dot_general(
        x8, params["w8"],
        dimension_numbers=(((x8.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_act * params["w_scale"].astype(jnp.float32))
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_linear_int4(params, group_size: int = 128):
    """{"weight": (..., out, in)} -> {"w4", "w4_scale", ["bias"]}.

    Int4 WEIGHT STORAGE for the weight-HBM-bound k=1 latency case: symmetric
    per-(out, in-group) scales (group_size along the in axis), values in
    [-7, 7], two nibbles packed into one uint8. The matmul itself runs bf16
    after an on-the-fly dequant — the TPU MXU has no int4 mode and at small
    batch the matmul is bandwidth-bound, so halving the weight bytes read is
    the whole win (int4 x int4 MXU products are also numerically riskier).

    Pack layout (OUT-axis packing, lane-friendly): the uint8 at position
    (j, i) holds out-row j in its LOW nibble and out-row j + out/2 in its
    HIGH nibble, so w4 is (out/2, in) — the lane (in) axis keeps the
    original 128-aligned stride for every DiT shape (2048 and the FFN's
    5504), and unpacking is two shifts + one out-axis concat. The group size
    is the largest divisor of in that is <= group_size, recovered at call
    time from the w4/w4_scale shapes.
    """
    w = params["weight"].astype(jnp.float32)
    out_in = w.shape
    assert out_in[-2] % 2 == 0, out_in
    g = group_size
    while out_in[-1] % g != 0:
        g -= 1
    wg = w.reshape(*out_in[:-1], out_in[-1] // g, g)
    amax = jnp.max(jnp.abs(wg), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int8)
    q = q.reshape(out_in)
    half = out_in[-2] // 2
    lo = q[..., :half, :]
    hi = q[..., half:, :]
    packed = (lo & 0x0F).astype(jnp.uint8) | (
        (hi.astype(jnp.uint8) & 0x0F) << 4
    )
    out = {"w4": packed, "w4_scale": scale.squeeze(-1).astype(jnp.float32)}
    if "bias" in params:
        out["bias"] = params["bias"]
    return out


def _unpack_int4(packed, scale, compute_dtype):
    """(..., out/2, in) uint8 + (..., out, in/g) scales -> (..., out, in)
    dequantized. The group size is derived from the shapes."""
    lo = (packed << 4).astype(jnp.int8) >> 4  # arithmetic shift sign-extends
    hi = packed.astype(jnp.int8) >> 4
    q = jnp.concatenate([lo, hi], axis=-2)
    shape = q.shape
    group_size = shape[-1] // scale.shape[-1]
    wg = q.reshape(*shape[:-1], shape[-1] // group_size, group_size)
    wf = wg.astype(jnp.float32) * scale[..., None]
    return wf.reshape(shape).astype(compute_dtype or jnp.bfloat16)


def linear_int4(params, x, compute_dtype=None):
    """y = x @ dequant(w4).T + bias. w4 is (out/2, in) at call time (scan
    strips the stacked layer axis, same as linear_int8).

    Two paths:
      * Pallas kernel (ops/int4_matmul.py) for small token counts on TPU —
        the k=1 latency case where the matmul is weight-HBM-bound and the
        win is reading half the bytes with in-kernel unpack;
      * XLA fallback: dequantize then matmul (materializes bf16 weights —
        measured SLOWER than int8/bf16 at k=8; the packed format is a
        latency/footprint tool, not a throughput one).
    """
    dtype = compute_dtype or jnp.bfloat16
    lead = x.shape[:-1]
    tokens = 1
    for s in lead:
        tokens *= s
    n_groups = params["w4_scale"].shape[-1]
    if (
        jax.default_backend() == "tpu"
        and tokens <= 256  # f32 accumulator must fit VMEM (see int4_matmul)
        and x.shape[-1] % 128 == 0
        and (x.shape[-1] // n_groups) % 128 == 0  # lane-aligned group blocks
        and params["w4"].ndim == 2
    ):
        from sam_audio_tpu.ops.int4_matmul import matmul_int4

        y = matmul_int4(x.reshape(tokens, x.shape[-1]).astype(dtype),
                        params["w4"], params["w4_scale"])
        y = y.reshape(*lead, y.shape[-1])
    else:
        w = _unpack_int4(params["w4"], params["w4_scale"], dtype)
        y = jnp.einsum("...i,oi->...o", x.astype(dtype), w)
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y.astype(x.dtype)


# Param-dict keys inside a stacked DiT layer tree whose Linears get quantized.
# The final "output" head, t_block, embedders, and the Patcher stem stay
# full-precision (small share of time; precision-sensitive).
_DIT_LAYER_LINEARS = (
    ("attention", "wq"), ("attention", "wk"), ("attention", "wv"),
    ("attention", "wo"),
    ("cross_attention", "wq"), ("cross_attention", "wk"),
    ("cross_attention", "wv"), ("cross_attention", "wo"),
    ("feed_forward", "w1"), ("feed_forward", "w2"), ("feed_forward", "w3"),
)


def quantize_dit_params(dit_params, bits: int = 8):
    """Quantize the hot matmuls of a DiT param tree (models/dit.dit_init
    layout, scan-stacked layers). Returns a new tree; non-quantized leaves
    are shared, not copied. bits=8 -> W8A8 MXU path; bits=4 -> packed int4
    weight storage with bf16 dequant (k=1 latency mode)."""
    quant = {8: quantize_linear, 4: quantize_linear_int4}[bits]
    out = dict(dit_params)
    layers = dict(dit_params["layers"])
    for path in _DIT_LAYER_LINEARS:
        group, name = path
        if group not in layers:
            continue
        g = dict(layers[group])
        if name in g and "weight" in g[name]:
            g[name] = quant(g[name])
        layers[group] = g
    out["layers"] = layers
    return out


def quantize_sam_audio_params(params, bits: int = 8):
    """Quantize the DiT inside a full SAMAudio param tree (+ the big input
    projection). Codec, T5, and towers stay full-precision."""
    out = dict(params)
    out["transformer"] = quantize_dit_params(params["transformer"], bits)
    if "proj" in params:
        quant = {8: quantize_linear, 4: quantize_linear_int4}[bits]
        out["proj"] = quant(params["proj"])
    return out


def _quantize_groups(tree, paths):
    """Quantize {group: {name: linear}} entries found at `paths` in a layer
    dict (missing names — e.g. converted checkpoints with fused qkv under a
    different key — stay full precision)."""
    out = dict(tree)
    for group, name in paths:
        if group not in out:
            continue
        g = dict(out[group])
        if name in g and isinstance(g[name], dict) and "weight" in g[name] \
                and getattr(g[name]["weight"], "ndim", 0) >= 2:
            g[name] = quantize_linear(g[name])
        out[group] = g
    return out


_PEAV_LAYER_LINEARS = (
    ("attn", "wq"), ("attn", "wk"), ("attn", "wv"), ("attn", "wo"),
    ("attn", "in_proj"),  # fused-qkv naming family from converted towers
    ("mlp", "fc1"), ("mlp", "fc2"), ("mlp", "w1"), ("mlp", "w2"),
    ("mlp", "w3"),
)

_MODERNBERT_LAYER_LINEARS = (
    ("attn", "Wqkv"), ("attn", "Wo"), ("mlp", "Wi"), ("mlp", "Wo"),
)


def quantize_peav_params(peav_params):
    """Int8 for a PE-AV transformer tower (models/peav.py layout,
    scan-stacked layers)."""
    out = dict(peav_params)
    out["layers"] = _quantize_groups(peav_params["layers"],
                                     _PEAV_LAYER_LINEARS)
    return out


_PE_LAYER_LINEARS = (
    ("attn", "wq"), ("attn", "wk"), ("attn", "wv"), ("attn", "wo"),
    ("mlp", "fc1"), ("mlp", "fc2"),
)


def quantize_pe_params(pe_params):
    """Int8 serving mode for the PE-Core CLIP vision tower
    (models/pe_clip.py layout, scan-stacked layers): the ViT block matmuls
    run W8A8 on the MXU; patch embed, cls/pos tables, norms, the attention
    pool, and the output projection (all tiny) stay full precision."""
    out = dict(pe_params)
    out["layers"] = _quantize_groups(pe_params["layers"], _PE_LAYER_LINEARS)
    return out


def quantize_modernbert_params(mb_params):
    """Int8 for the ModernBERT text tower (models/modernbert.py layout,
    python-list layers)."""
    out = dict(mb_params)
    out["layers"] = [
        _quantize_groups(layer, _MODERNBERT_LAYER_LINEARS)
        for layer in mb_params["layers"]
    ]
    return out


def _quantize_flat(d, names):
    """Quantize flat {name: linear} entries present in a (possibly stacked)
    dict."""
    out = dict(d)
    for name in names:
        if name in out and isinstance(out[name], dict) \
                and "weight" in out[name] \
                and getattr(out[name]["weight"], "ndim", 0) >= 2:
            out[name] = quantize_linear(out[name])
    return out


def quantize_clap_params(clap_params):
    """Int8 serving mode for the CLAP scorer: HTSAT swin blocks (qkv/proj +
    MLP) and the RoBERTa text tower run W8A8; mel filterbank, patch embed,
    norms, relative-position tables, and the projection MLPs (tiny) stay
    full-precision."""
    out = dict(clap_params)
    audio = dict(out["audio_branch"])
    audio["stages"] = [
        {**stage,
         "blocks": [_quantize_flat(blk, ("qkv", "proj", "fc1", "fc2"))
                    for blk in stage["blocks"]]}
        for stage in audio["stages"]
    ]
    out["audio_branch"] = audio
    text = dict(out["text_branch"])
    layers = _quantize_flat(text["layers"], ("fc1", "fc2"))
    layers = dict(layers)
    layers["attn"] = _quantize_flat(layers["attn"], ("wq", "wk", "wv", "wo"))
    text["layers"] = layers
    out["text_branch"] = text
    return out


def quantize_imagebind_params(ib_params):
    """Int8 serving mode for the ImageBind scorer: both branch trunks
    (PE-AV-layout ViTs) run W8A8; stems, cls/pos tables, norms, and head
    projections (tiny) stay full-precision."""
    out = {}
    for branch in ("audio", "vision"):
        b = dict(ib_params[branch])
        b["trunk"] = quantize_peav_params(b["trunk"])
        out[branch] = b
    return out


def quantize_judge_params(judge_params):
    """Int8 serving mode for the judge scorer stack: both PE-AV towers and
    the ModernBERT text tower run W8A8 on the MXU; the DAC-VAE encoder,
    fusion projections (small), head, and norms stay full-precision."""
    out = dict(judge_params)
    for tower in ("transformer", "finetune_transformer"):
        if tower in out:
            out[tower] = quantize_peav_params(out[tower])
    if "text_model" in out:
        out["text_model"] = quantize_modernbert_params(out["text_model"])
    return out
