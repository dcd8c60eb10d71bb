"""Parity of the fused short-attention glue kernel (ops/fused_attention.py)
vs the composite XLA chain: rmsnorm -> apply_rope_half -> sdpa
(reference chain: sam_audio/model/transformer.py:128-161 with qk_norm)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops.attention import sdpa
from sam_audio_tpu.ops.fused_attention import fused_glue_attention
from sam_audio_tpu.ops.rope import apply_rope_half, precompute_rope

B, T, H, D = 2, 250, 4, 128
EPS = 1e-5


def composite(q, k, v, qw, kw, cos, sin, mask):
    q = N.rmsnorm({"weight": qw}, q, EPS)
    k = N.rmsnorm({"weight": kw}, k, EPS)
    q = apply_rope_half(q, cos, sin)
    k = apply_rope_half(k, cos, sin)
    return sdpa(q, k, v, key_padding_mask=mask)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_glue_attention_matches_composite(dtype):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32)).astype(dtype)
    k = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32)).astype(dtype)
    v = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32)).astype(dtype)
    qw = jnp.asarray(1.0 + 0.1 * rng.randn(D).astype(np.float32))
    kw = jnp.asarray(1.0 + 0.1 * rng.randn(D).astype(np.float32))
    cos, sin = precompute_rope(D, T, 20000)
    # ragged key padding incl. one full row
    mask = np.ones((B, T), bool)
    mask[0, 200:] = False
    mask = jnp.asarray(mask)

    ref = composite(q, k, v, qw, kw, cos, sin, mask)
    out = fused_glue_attention(q, k, v, qw, kw, cos, sin, mask, eps=EPS,
                               interpret=True)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    a = np.asarray(out, np.float32)
    b = np.asarray(ref, np.float32)
    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(a, b, rtol=tol, atol=tol)


def test_fused_glue_attention_no_mask():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 64, 2, 128).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 64, 2, 128).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 64, 2, 128).astype(np.float32))
    w = jnp.ones((128,), jnp.float32)
    cos, sin = precompute_rope(128, 64, 20000)
    ref = composite(q, k, v, w, w, cos, sin, None)
    out = fused_glue_attention(q, k, v, w, w, cos, sin, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)
