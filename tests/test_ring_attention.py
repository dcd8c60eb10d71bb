"""Ring (context-parallel) attention: exact parity with single-device SDPA
on the 8-virtual-CPU mesh, incl. key-padding masks and ragged batches."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from sam_audio_tpu.ops.attention import sdpa
from sam_audio_tpu.ops.ring_attention import ring_attention


def _mesh(n=8, axis="sp"):
    return Mesh(np.asarray(jax.devices("cpu")[:n]), axis_names=(axis,))


def _qkv(b=2, s=64, h=4, d=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (b, s, h, d), jnp.float32) for k in ks)


def test_ring_matches_sdpa_full_mask():
    q, k, v = _qkv()
    ref = np.asarray(sdpa(q, k, v))
    out = np.asarray(ring_attention(q, k, v, _mesh()))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_ring_matches_sdpa_with_key_padding():
    q, k, v = _qkv(seed=1)
    mask = np.ones((2, 64), bool)
    mask[0, 40:] = False   # ragged: item 0 pads a tail spanning 3 shards
    mask[1, ::7] = False   # scattered masked keys across every shard
    ref = np.asarray(sdpa(q, k, v, key_padding_mask=jnp.asarray(mask)))
    out = np.asarray(ring_attention(q, k, v, _mesh(),
                                    key_padding_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_ring_bf16_inputs_and_custom_scale():
    q, k, v = (x.astype(jnp.bfloat16) for x in _qkv(seed=2))
    ref = np.asarray(sdpa(q, k, v, scale=0.5), np.float32)
    out = np.asarray(ring_attention(q, k, v, _mesh(), scale=0.5), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_ring_rejects_indivisible_sequence():
    q, k, v = _qkv(s=60)
    try:
        ring_attention(q, k, v, _mesh())
    except ValueError as e:
        assert "divide" in str(e)
    else:
        raise AssertionError("expected ValueError for S=60 on 8 devices")


def test_ring_output_stays_sequence_sharded():
    q, k, v = _qkv(seed=3)
    mesh = _mesh()
    out = ring_attention(q, k, v, mesh)
    n_dev = len({s.device for s in out.addressable_shards})
    assert n_dev == 8, n_dev
