"""Pallas fused kernels for the DAC-VAE conv stacks.

The codec decoder dominates separation latency after the DiT: its residual
units (snake -> dilated k7 conv -> snake -> k1 conv -> add) run at 48 kHz
sample rate with narrow channels (96-768). Measured on v5e (k=8-equivalent
B=9, 10 s): XLA runs one C=96/T=480k unit in ~60 ms and one C=192/T=240k unit
in ~70 ms — each of the 5 ops in the chain round-trips the ~0.8 GB activation
through HBM, and the standalone Snake alone costs ~12 ms (sin is ~20+ VPU ops
per element).

This kernel computes an ENTIRE residual unit per (batch, time-tile) grid step
in VMEM: the tile is read from HBM once and written once, the dilated k7 conv
is 7 accumulating (C_out, C_in) @ (C_in, T_tile) MXU matmuls on shifted
in-VMEM views, and both Snakes run on-tile. Halos come from THREE pipelined
views of the same input (prev/current/next tile) — plain BlockSpecs, so
Mosaic double-buffers the streams automatically (the round-1 kernel's manual
start();wait() DMA serialized every tile and lost to XLA).

Layout: (B, C, T) — the decoder's native layout — with T on lanes
(tiles are 128-aligned) and C on sublanes (96/192 are sublane-aligned for
bf16). Zero-padding conv semantics at the sequence edges are reproduced by
masking the halo at the first/last tile and by right-padding T with zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _snake_f32(x32, alpha, fast: bool):
    """x + sin^2(alpha x)/alpha in f32, matching ops.conv.snake's dtype
    policy: polynomial sin^2 on the bf16 path, exact sin otherwise."""
    if fast:
        from sam_audio_tpu.ops.conv import _sin2_fast

        return x32 + (1.0 / (alpha + 1e-9)) * _sin2_fast(alpha * x32)
    return x32 + (1.0 / (alpha + 1e-9)) * jnp.square(jnp.sin(alpha * x32))


def _res_unit_kernel(xl_ref, xc_ref, xr_ref, w7_ref, b7_ref, w1_ref, b1_ref,
                     a1_ref, a2_ref, out_ref, *, dilation: int,
                     kernel_size: int, out_dtype, fast_snake: bool):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    halo = (kernel_size - 1) * dilation // 2
    tile = xc_ref.shape[-1]

    xc = xc_ref[0]                                   # (C, tile) bf16
    left = xl_ref[0][:, tile - halo:]
    right = xr_ref[0][:, :halo]
    # zero-padding conv semantics at the sequence boundary
    left = jnp.where(t == 0, jnp.zeros_like(left), left)
    right = jnp.where(t == n_t - 1, jnp.zeros_like(right), right)
    xw = jnp.concatenate([left, xc, right], axis=1)  # (C, tile + 2*halo)

    a1 = a1_ref[...].astype(jnp.float32)             # (C, 1)
    a2 = a2_ref[...].astype(jnp.float32)
    s1 = _snake_f32(xw.astype(jnp.float32), a1, fast_snake).astype(xc.dtype)

    # dilated k7 conv == 7 accumulating MXU matmuls on shifted views
    acc = jnp.broadcast_to(b7_ref[...].astype(jnp.float32),
                           (xc.shape[0], tile))
    for j in range(kernel_size):
        acc = acc + jax.lax.dot(
            w7_ref[j], s1[:, j * dilation: j * dilation + tile],
            preferred_element_type=jnp.float32,
        )
    # match the XLA path: conv output materializes in bf16 before snake2
    h = acc.astype(xc.dtype)

    s2 = _snake_f32(h.astype(jnp.float32), a2, fast_snake).astype(xc.dtype)
    out = jax.lax.dot(w1_ref[...], s2, preferred_element_type=jnp.float32)
    out = out + b1_ref[...].astype(jnp.float32)
    out = out + xc.astype(jnp.float32)
    out_ref[0] = out.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("dilation", "block_t", "kernel_size",
                                    "interpret"))
def _fused_res_unit_padded(x, w7, b7, w1, b1, alpha1, alpha2, *,
                           dilation: int, block_t: int, kernel_size: int,
                           interpret: bool):
    """x: (B, C, T); w7: (K, C_out, C_in). Returns (B, C, T)."""
    b, c, t = x.shape
    k = kernel_size
    n_t = -(-t // block_t)
    t_pad = n_t * block_t
    if t_pad != t:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, t_pad - t)])

    kernel = functools.partial(_res_unit_kernel, dilation=dilation,
                               kernel_size=k, out_dtype=x.dtype,
                               fast_snake=x.dtype == jnp.bfloat16)
    view = lambda off: pl.BlockSpec(
        (1, c, block_t),
        lambda b_, i, off=off: (b_, 0, jnp.clip(i + off, 0, n_t - 1)),
    )
    const = lambda *shape: pl.BlockSpec(shape, lambda b_, i: (0,) * len(shape))
    out = pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[
            view(-1), view(0), view(+1),
            const(k, c, c),   # w7
            const(c, 1),      # b7
            const(c, c),      # w1
            const(c, 1),      # b1
            const(c, 1),      # alpha1
            const(c, 1),      # alpha2
        ],
        out_specs=pl.BlockSpec((1, c, block_t), lambda b_, i: (b_, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b, c, t_pad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, x, x, w7, b7, w1, b1, alpha1, alpha2)
    return out[:, :, :t] if t_pad != t else out


def _pick_block_t(c: int, t: int, k: int = 7) -> int:
    """128-aligned time tile: big enough to amortize per-program cost, small
    enough that 3 double-buffered views + f32 intermediates fit VMEM (and no
    bigger than the padded sequence itself)."""
    budget = 6 * 1024 * 1024
    t_ceil = -(-t // 128) * 128
    best = 0
    for mult in (1, 2, 4, 8, 12, 15, 16, 24, 30):
        bt = 128 * mult
        if bt > t_ceil and best:
            break
        # 3 views + out, double-buffered, bf16 + ~3 f32 tile temporaries
        vmem = 4 * 2 * c * bt * 2 + 3 * c * bt * 4 + (k + 1) * c * c * 2
        if vmem <= budget:
            best = bt
    return best


def fused_residual_unit(params, x, dilation: int, compute_dtype=jnp.bfloat16,
                        interpret=None):
    """Drop-in replacement for models.dacvae._residual_unit_apply.

    params: {snake1.alpha, conv1.{weight,bias}, snake2.alpha, conv2.{weight,bias}}
    x: (B, C, T). Returns None when the shape isn't eligible (caller falls
    back to the XLA path): C must be bf16-sublane aligned (C % 16 == 0) and
    T big enough to be worth tiling.
    """
    b, c, t = x.shape
    k = params["conv1"]["weight"].shape[-1]
    block_t = _pick_block_t(c, t, k)
    sublane = 16 if jnp.dtype(compute_dtype) == jnp.bfloat16 else 8
    if c % sublane != 0 or block_t == 0:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
        if not interpret and t < 16384:
            # narrow-time blocks (the codec's early-decoder/late-encoder
            # stages) stay on XLA: measured v5e crossover is in the tens of
            # thousands of samples (see module docstring)
            return None
    w7 = jnp.transpose(params["conv1"]["weight"], (2, 0, 1)).astype(
        compute_dtype)                                     # (K, C_out, C_in)
    b7 = params["conv1"].get("bias",
                             jnp.zeros((c,), jnp.float32)).reshape(c, 1)
    w1 = params["conv2"]["weight"][:, :, 0].astype(compute_dtype)  # (C, C)
    b1 = params["conv2"].get("bias",
                             jnp.zeros((c,), jnp.float32)).reshape(c, 1)
    a1 = params["snake1"]["alpha"].reshape(c, 1)
    a2 = params["snake2"]["alpha"].reshape(c, 1)
    return _fused_res_unit_padded(
        x.astype(compute_dtype), w7, b7, w1, b1, a1, a2,
        dilation=dilation, block_t=block_t, kernel_size=k, interpret=interpret,
    )
