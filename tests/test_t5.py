"""T5 encoder parity against HF transformers (random-init T5EncoderModel built
from a local config — no network)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sam_audio_tpu.config import T5EncoderConfig
from sam_audio_tpu.checkpoint import convert_t5_state_dict
from sam_audio_tpu.models.t5 import t5_encode

transformers = pytest.importorskip("transformers")


def _tiny_hf_t5():
    cfg = transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=3, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    return transformers.T5EncoderModel(cfg).eval(), cfg


def test_t5_matches_hf_transformers():
    model, hf_cfg = _tiny_hf_t5()
    cfg = T5EncoderConfig(
        dim=32, num_layers=3, num_heads=4, head_dim=8, d_ff=64, vocab_size=128,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_t5_state_dict(sd, cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(2, 128, size=(3, 11)).astype(np.int32)
    mask = np.ones((3, 11), bool)
    mask[0, 7:] = False
    mask[2, 4:] = False
    ids[~mask] = 0

    ours = np.asarray(
        t5_encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    )
    with torch.no_grad():
        theirs = model(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    # only compare non-padded positions (HF zeroes grads not outputs, but
    # padded outputs are garbage-in-garbage-out in both)
    np.testing.assert_allclose(ours[mask], theirs[mask], rtol=1e-3, atol=1e-4)


def test_t5_long_sequence_buckets():
    """Exercise the logarithmic distance buckets (>max_exact)."""
    model, hf_cfg = _tiny_hf_t5()
    cfg = T5EncoderConfig(
        dim=32, num_layers=3, num_heads=4, head_dim=8, d_ff=64, vocab_size=128,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_t5_state_dict(sd, cfg)
    rng = np.random.RandomState(1)
    ids = rng.randint(2, 128, size=(1, 40)).astype(np.int32)
    mask = np.ones((1, 40), bool)
    ours = np.asarray(t5_encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    with torch.no_grad():
        theirs = model(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
