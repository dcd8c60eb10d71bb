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


def quantize_dit_params(dit_params):
    """Quantize the hot matmuls of a DiT param tree (models/dit.dit_init
    layout, scan-stacked layers). Returns a new tree; non-quantized leaves
    are shared, not copied."""
    out = dict(dit_params)
    layers = dict(dit_params["layers"])
    for path in _DIT_LAYER_LINEARS:
        group, name = path
        if group not in layers:
            continue
        g = dict(layers[group])
        if name in g and "weight" in g[name]:
            g[name] = quantize_linear(g[name])
        layers[group] = g
    out["layers"] = layers
    return out


def quantize_sam_audio_params(params):
    """Quantize the DiT inside a full SAMAudio param tree (+ the big input
    projection). Codec, T5, and towers stay full-precision."""
    out = dict(params)
    out["transformer"] = quantize_dit_params(params["transformer"])
    if "proj" in params:
        out["proj"] = quantize_linear(params["proj"])
    return out
