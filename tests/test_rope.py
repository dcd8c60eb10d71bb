import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.ops.rope import apply_rope, precompute_rope


def reference_rope_oracle(x, theta):
    """Direct 2x2-rotation-matrix oracle of the reference semantics
    (rope.py:116-155): pairs (x[2i], x[2i+1]) rotated by pos*freq_i."""
    b, s, h, d = x.shape
    freqs = 1.0 / (theta ** (np.arange(0, d, 2)[: d // 2] / d))
    t = np.arange(s)
    ang = np.outer(t, freqs)  # (s, d/2)
    cos, sin = np.cos(ang), np.sin(ang)
    out = np.empty_like(x)
    out[..., 0::2] = x[..., 0::2] * cos[None, :, None, :] - x[..., 1::2] * sin[None, :, None, :]
    out[..., 1::2] = x[..., 0::2] * sin[None, :, None, :] + x[..., 1::2] * cos[None, :, None, :]
    return out


def test_apply_rope_matches_rotation_matrix_oracle():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 3, 8).astype(np.float32)
    theta = 20000.0
    cos, sin = precompute_rope(8, 16, theta)
    ours = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    oracle = reference_rope_oracle(x, theta)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)


def test_rope_preserves_norm():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 12, 2, 16).astype(np.float32)
    cos, sin = precompute_rope(16, 12, 10000.0)
    out = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-4
    )


def test_rope_relative_property():
    """Attention logits depend only on relative positions."""
    rng = np.random.RandomState(2)
    d = 8
    q = rng.randn(1, 1, 1, d).astype(np.float32)
    k = rng.randn(1, 1, 1, d).astype(np.float32)
    cos, sin = precompute_rope(d, 64, 10000.0)

    def dot_at(pos_q, pos_k):
        qq = np.zeros((1, 64, 1, d), np.float32)
        kk = np.zeros((1, 64, 1, d), np.float32)
        qq[0, pos_q] = q[0, 0]
        kk[0, pos_k] = k[0, 0]
        rq = np.asarray(apply_rope(jnp.asarray(qq), cos, sin))[0, pos_q, 0]
        rk = np.asarray(apply_rope(jnp.asarray(kk), cos, sin))[0, pos_k, 0]
        return float(rq @ rk)

    assert abs(dot_at(3, 7) - dot_at(13, 17)) < 1e-4
    assert abs(dot_at(0, 5) - dot_at(20, 25)) < 1e-4


def test_llama3_scaling_path():
    cos1, sin1 = precompute_rope(8, 16, 10000.0, scale_factor=1)
    cos2, sin2 = precompute_rope(8, 16, 10000.0, scale_factor=8)
    assert not np.allclose(np.asarray(cos1), np.asarray(cos2))


def test_apply_rope_half_matches_interleaved_via_permutation():
    from sam_audio_tpu.ops.rope import (
        apply_rope,
        apply_rope_half,
        precompute_rope,
        rope_deinterleave_perm,
    )

    b, s, h, d = 2, 16, 3, 8
    cos, sin = precompute_rope(d, s, theta=10000.0)
    x = jnp.asarray(np.random.RandomState(0).randn(b, s, h, d), jnp.float32)
    perm = rope_deinterleave_perm(d)
    ref = np.asarray(apply_rope(x, cos, sin))[..., perm]
    got = np.asarray(apply_rope_half(np.asarray(x)[..., perm], cos, sin))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
