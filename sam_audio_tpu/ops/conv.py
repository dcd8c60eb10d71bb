"""1-D convolution ops with the reference's padding semantics.

Covers:
  * audiocraft-style asymmetric/"extra" padding used by the Patcher stem
    (reference: sam_audio/model/patcher.py:11-67),
  * reflect padding with the small-input zero-extension trick
    (reference: patcher.py:24-32),
  * plain torch-Conv1d-equivalent convs and transposed convs for the DAC-VAE
    codec (encoder rates [2,8,10,12] / decoder rates [12,10,8,2],
    reference: sam_audio/model/codec.py, config.py:10-41),
  * GroupNorm and the Snake activation (DAC-style).

Weight layouts are torch's: Conv1d (out, in, k); ConvTranspose1d (in, out, k),
so converted checkpoints drop straight in. Arrays are channels-first (B, C, T).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Padding
# ---------------------------------------------------------------------------


def pad1d(x: jnp.ndarray, paddings: Tuple[int, int], mode: str = "constant",
          value: float = 0.0) -> jnp.ndarray:
    """Pad the last axis. For reflect mode on inputs shorter than the padding,
    zero-extend to the right first then trim (audiocraft trick,
    reference: sam_audio/model/patcher.py:11-34)."""
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0, paddings
    cfg = [(0, 0)] * (x.ndim - 1)
    if mode == "reflect":
        length = x.shape[-1]
        max_pad = max(padding_left, padding_right)
        extra_pad = 0
        if length <= max_pad:
            extra_pad = max_pad - length + 1
            x = jnp.pad(x, cfg + [(0, extra_pad)])
        padded = jnp.pad(x, cfg + [(padding_left, padding_right)], mode="reflect")
        end = padded.shape[-1] - extra_pad
        return padded[..., :end]
    return jnp.pad(x, cfg + [(padding_left, padding_right)], constant_values=value)


def get_extra_padding_for_conv1d(length: int, kernel_size: int, stride: int,
                                 padding_total: int = 0) -> int:
    """reference: sam_audio/model/patcher.py:37-45."""
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal_length - length


# ---------------------------------------------------------------------------
# Conv1d / ConvTranspose1d (torch-equivalent numerics)
# ---------------------------------------------------------------------------


def conv1d_init(key, in_channels, out_channels, kernel_size, bias=True, groups=1,
                dtype=jnp.float32):
    """torch.nn.Conv1d default init."""
    wkey, bkey = jax.random.split(key)
    fan_in = in_channels // groups * kernel_size
    scale = 1.0 / math.sqrt(fan_in)
    p = {
        "weight": jax.random.uniform(
            wkey, (out_channels, in_channels // groups, kernel_size), dtype,
            minval=-scale, maxval=scale,
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(
            bkey, (out_channels,), dtype, minval=-scale, maxval=scale
        )
    return p


def conv1d(params, x, stride: int = 1, padding=0, dilation: int = 1, groups: int = 1,
           compute_dtype=None):
    """x: (B, C_in, T); weight: (C_out, C_in/groups, K). `padding` is an int
    (symmetric, like torch) or an explicit (left, right) tuple."""
    w = params["weight"]
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        x = x.astype(compute_dtype)
    if isinstance(padding, int):
        padding = (padding, padding)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32 if compute_dtype is None else None,
    )
    if "bias" in params:
        b = params["bias"]
        if compute_dtype is not None:
            b = b.astype(compute_dtype)
        out = out + b[None, :, None]
    return out.astype(x.dtype)


def conv_transpose1d_init(key, in_channels, out_channels, kernel_size, bias=True,
                          dtype=jnp.float32):
    """torch.nn.ConvTranspose1d default init (weight layout (in, out, k))."""
    wkey, bkey = jax.random.split(key)
    fan_in = out_channels * kernel_size  # torch uses weight.size(1)*k for transpose
    scale = 1.0 / math.sqrt(fan_in)
    p = {
        "weight": jax.random.uniform(
            wkey, (in_channels, out_channels, kernel_size), dtype,
            minval=-scale, maxval=scale,
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(
            bkey, (out_channels,), dtype, minval=-scale, maxval=scale
        )
    return p


def conv_transpose1d(params, x, stride: int = 1, padding: int = 0,
                     output_padding: int = 0, compute_dtype=None):
    """torch.nn.ConvTranspose1d numerics: out_len = (T-1)*stride - 2*padding + K
    + output_padding. Implemented as an input-dilated convolution with the
    kernel flipped — identical math, XLA-friendly."""
    w = params["weight"]  # (in, out, k)
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        x = x.astype(compute_dtype)
    k = w.shape[-1]
    # Gradient-of-conv formulation: flip kernel, swap in/out channel axes.
    w_flip = jnp.flip(w, axis=-1).swapaxes(0, 1)  # (out, in, k)
    pad_left = k - 1 - padding
    pad_right = k - 1 - padding + output_padding
    out = jax.lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1,),
        padding=[(pad_left, pad_right)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32 if compute_dtype is None else None,
    )
    if "bias" in params:
        b = params["bias"]
        if compute_dtype is not None:
            b = b.astype(compute_dtype)
        out = out + b[None, :, None]
    return out.astype(x.dtype)


def audiocraft_conv1d(params, x, stride: int = 1, dilation: int = 1,
                      pad_mode: str = "constant", compute_dtype=None):
    """Conv1d with audiocraft auto-padding (reference: patcher.py:48-67):
    pads so every input frame is covered, asymmetric for odd strides."""
    k = params["weight"].shape[-1]
    effective_k = (k - 1) * dilation + 1
    padding_total = effective_k - stride
    extra_padding = get_extra_padding_for_conv1d(
        x.shape[-1], effective_k, stride, padding_total
    )
    padding_right = padding_total // 2
    padding_left = padding_total - padding_right
    x = pad1d(x, (padding_left, padding_right + extra_padding), mode=pad_mode)
    return conv1d(params, x, stride=stride, padding=0, dilation=dilation,
                  compute_dtype=compute_dtype)


# ---------------------------------------------------------------------------
# GroupNorm (torch.nn.GroupNorm numerics, channels-first)
# ---------------------------------------------------------------------------


def groupnorm_init(num_channels: int, dtype=jnp.float32):
    return {"weight": jnp.ones((num_channels,), dtype),
            "bias": jnp.zeros((num_channels,), dtype)}


def groupnorm(params, x, num_groups: int, eps: float = 1e-5):
    """x: (B, C, T)."""
    b, c, t = x.shape
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(b, num_groups, c // num_groups * t)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, c, t)
    out = normed * params["weight"][None, :, None] + params["bias"][None, :, None]
    return out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Snake activation (DAC-style, per-channel alpha)
# ---------------------------------------------------------------------------


def snake_init(channels: int, dtype=jnp.float32):
    return {"alpha": jnp.ones((1, channels, 1), dtype)}


# cos(sqrt(u)) on u in [0, pi^2], Chebyshev-fit power basis, max err 2.6e-8.
_COS_POLY = (0.9999999738700588, -0.49999985125182195, 0.041666462324917386,
             -0.0013887731716129153, 2.4769052460238803e-05,
             -2.7075446763970063e-07, 1.7243750503357124e-09)
_TWO_PI = 6.283185307179586


def _sin2_fast(z):
    """sin^2(z) = (1 - cos(2z))/2 with cheap range reduction + even minimax
    polynomial (~12 VPU ops vs ~25 for the libm-style sin lowering; the
    decoder's Snake is sin-throughput-bound on TPU). f32 absolute error
    <= 4e-5 for |z| < 320 — far below bf16 resolution."""
    z2 = 2.0 * z
    r = z2 - _TWO_PI * jnp.round(z2 * (1.0 / _TWO_PI))
    u = r * r
    acc = jnp.asarray(_COS_POLY[-1], z.dtype)
    for c in _COS_POLY[-2::-1]:
        acc = acc * u + c
    return 0.5 * (1.0 - acc)


def snake(params, x, fast: Optional[bool] = None):
    """x + (1/alpha) * sin^2(alpha x), alpha per channel. x: (B, C, T).

    fast=None uses the polynomial sin^2 when x is bf16 (its error is orders
    of magnitude below bf16 rounding) and exact sin for f32 inputs, keeping
    fp32 golden-parity paths bit-stable."""
    if fast is None:
        fast = x.dtype == jnp.bfloat16
    alpha = params["alpha"].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    sin2 = _sin2_fast(alpha * xf) if fast else jnp.square(jnp.sin(alpha * xf))
    out = xf + (1.0 / (alpha + 1e-9)) * sin2
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Weight-norm folding (checkpoints store weight_g / weight_v)
# ---------------------------------------------------------------------------


def fold_weight_norm(weight_g: jnp.ndarray, weight_v: jnp.ndarray,
                     dim: int = 0) -> jnp.ndarray:
    """w = g * v / ||v|| with the norm over all axes except `dim`
    (torch.nn.utils.weight_norm semantics)."""
    axes = tuple(i for i in range(weight_v.ndim) if i != dim)
    norm = jnp.sqrt(jnp.sum(jnp.square(weight_v), axis=axes, keepdims=True))
    return weight_g * weight_v / norm
