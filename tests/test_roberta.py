"""RoBERTa tower parity vs transformers.RobertaModel (the CLAP text branch,
reference ranking/clap.py:11-30 loads `text_branch` as an HF RobertaModel)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sam_audio_tpu.models.roberta import (
    RobertaConfig,
    convert_roberta_state_dict,
    roberta_encode,
    roberta_init,
)

transformers = pytest.importorskip("transformers")


def _tiny():
    hf_cfg = transformers.RobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    model = transformers.RobertaModel(hf_cfg).eval()
    cfg = RobertaConfig(vocab_size=120, hidden_size=32, num_layers=3,
                        num_heads=4, intermediate_size=48,
                        max_position_embeddings=40)
    return model, cfg


def test_roberta_matches_hf():
    model, cfg = _tiny()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_roberta_state_dict(sd, cfg)

    rng = np.random.RandomState(0)
    b, l = 2, 9
    ids = rng.randint(3, 120, (b, l)).astype(np.int64)
    mask = np.ones((b, l), np.int64)
    ids[1, 6:] = 1  # pad token
    mask[1, 6:] = 0

    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask))
    last, pooled = roberta_encode(params, jnp.asarray(ids), jnp.asarray(mask),
                                  cfg)
    np.testing.assert_allclose(
        np.asarray(last)[mask.astype(bool)],
        out.last_hidden_state.numpy()[mask.astype(bool)],
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_roberta_position_ids_offset():
    """Padding rows must not shift later positions (RoBERTa's cumsum scheme)."""
    from sam_audio_tpu.models.roberta import roberta_position_ids

    ids = jnp.asarray([[5, 6, 1, 1], [5, 6, 7, 8]])
    pos = np.asarray(roberta_position_ids(ids, 1))
    np.testing.assert_array_equal(pos, [[2, 3, 1, 1], [2, 3, 4, 5]])


def test_roberta_init_runs():
    cfg = RobertaConfig(vocab_size=50, hidden_size=16, num_layers=2,
                        num_heads=2, intermediate_size=24,
                        max_position_embeddings=20)
    params = roberta_init(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray([[4, 5, 6, 1]])
    last, pooled = roberta_encode(params, ids, (ids != 1).astype(jnp.int32), cfg)
    assert last.shape == (1, 4, 16) and pooled.shape == (1, 16)
    assert np.isfinite(np.asarray(last)).all()
