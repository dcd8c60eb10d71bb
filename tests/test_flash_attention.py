"""Flash-attention kernel vs the XLA SDPA oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.ops.attention import sdpa
from sam_audio_tpu.ops.flash_attention import flash_attention


def _qkv(b=2, s=256, h=2, d=64, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(b, s, h, d).astype(np.float32) * 0.5
    k = rng.randn(b, s, h, d).astype(np.float32) * 0.5
    v = rng.randn(b, s, h, d).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_flash_matches_sdpa_no_mask():
    q, k, v = _qkv()
    ours = np.asarray(flash_attention(q, k, v, interpret=True))
    ref = np.asarray(sdpa(q, k, v))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_flash_matches_sdpa_with_padding_mask():
    q, k, v = _qkv(s=384)
    mask = np.ones((2, 384), bool)
    mask[0, 200:] = False
    mask[1, 100:] = False
    ours = np.asarray(flash_attention(q, k, v, key_padding_mask=jnp.asarray(mask),
                                      interpret=True))
    ref = np.asarray(sdpa(q, k, v, key_padding_mask=jnp.asarray(mask)))
    # only valid queries matter downstream; compare those
    np.testing.assert_allclose(ours[0], ref[0], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours[1], ref[1], rtol=2e-3, atol=2e-3)


def test_flash_non_block_multiple_lengths():
    q, k, v = _qkv(s=200)  # not a multiple of 128 -> internal padding
    ours = np.asarray(flash_attention(q, k, v, interpret=True))
    ref = np.asarray(sdpa(q, k, v))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_flash_bf16():
    q, k, v = _qkv()
    ours = np.asarray(
        flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                        v.astype(jnp.bfloat16), interpret=True)
        .astype(jnp.float32)
    )
    ref = np.asarray(sdpa(q, k, v))
    assert np.abs(ours - ref).max() < 0.05
