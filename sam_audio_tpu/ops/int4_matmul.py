"""Pallas int4-weight matmul for the weight-HBM-bound small-batch case.

At k=1 serving (250 tokens), every DiT matmul is bandwidth-bound: the time is
weight-bytes / HBM-BW, not FLOPs. Packed int4 weights halve the bytes vs
int8 — but only if the unpack happens IN REGISTERS between the HBM read and
the MXU. XLA cannot do that (a jnp unpack materializes the full bf16 weight
matrix back to HBM; measured 439 ms vs int8's 215 ms at k=1), so this kernel
does the read -> shift/sign-extend -> dot -> scale chain per weight tile in
VMEM.

Layout (see ops/quant.quantize_linear_int4): w4 (out/2, in) uint8 carries
out-row j in the low nibble and out-row j+out/2 in the high nibble, keeping
the lane (in) axis 128-aligned for every DiT shape (2048 and 5504; out/2 =
2752 is NOT 128-aligned, which rules out out-axis grids — so the grid runs
over the CONTRACTION axis instead, one quantization group per step, with the
full (2, bt, out/2) accumulator resident in VMEM).

Per grid step i (covering in-columns [i*g, (i+1)*g)):
    y_lo += (x_i @ q_lo_i^T) * s_lo[:, i]     # scale is per (out, group),
    y_hi += (x_i @ q_hi_i^T) * s_hi[:, i]     # so it factors out of the dot

which is exact because group i's columns share one scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w4_ref, slo_ref, shi_ref, o_ref):
    f32 = jnp.float32
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        o_ref[:, :, :] = jnp.zeros_like(o_ref)

    x = x_ref[:, :]                                   # (bt, g)
    packed = w4_ref[:, :]                             # (half, g) uint8
    # nibble unpack in i32: Mosaic has no 8-bit vector shifts
    # (arith.shli on vector<i8> fails to legalize — measured on v5e)
    p32 = packed.astype(jnp.int32)
    lo = ((p32 << 28) >> 28).astype(x.dtype)          # sign-extended low
    hi = ((p32 << 24) >> 28).astype(x.dtype)          # sign-extended high

    def acc(plane, w, s_ref):
        part = jax.lax.dot_general(
            x, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )                                             # (bt, half)
        s = s_ref[i, :].astype(f32)                   # (half,)
        o_ref[plane, :, :] += part * s[None, :]

    acc(0, lo, slo_ref)
    acc(1, hi, shi_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def matmul_int4(x: jnp.ndarray, w4: jnp.ndarray, w4_scale: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """x: (bt, in) bf16/f32; w4: (out/2, in) uint8; w4_scale: (out, in/g).

    Returns (bt, out) in x.dtype (y = x @ dequant(w).T, no bias).
    bt should stay <= 256 (the f32 accumulator lives in VMEM).
    """
    bt, d_in = x.shape
    half, d_in2 = w4.shape
    assert d_in == d_in2, (x.shape, w4.shape)
    n_groups = w4_scale.shape[-1]
    g = d_in // n_groups

    bt_pad = max(-(-bt // 8) * 8, 8)
    if bt_pad != bt:
        x = jnp.pad(x, ((0, bt_pad - bt), (0, 0)))

    # transposed scale views: (n_groups, half) so the kernel reads one ROW
    # per grid step (a lane-aligned (half,) vector)
    slo = jnp.transpose(w4_scale[:half]).astype(jnp.float32)
    shi = jnp.transpose(w4_scale[half:]).astype(jnp.float32)

    y2 = pl.pallas_call(
        _kernel,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((bt_pad, g), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((half, g), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, half), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, half), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, bt_pad, half), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, bt_pad, half), jnp.float32),
        interpret=interpret,
    )(x, w4, slo, shi)
    y = jnp.concatenate([y2[0], y2[1]], axis=-1)
    return y[:bt].astype(x.dtype)
