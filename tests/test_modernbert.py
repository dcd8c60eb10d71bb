"""ModernBERT parity vs HF transformers (random-init from config, no network)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sam_audio_tpu.config import ModernBertTextConfig
from sam_audio_tpu.models.modernbert import (
    convert_modernbert_state_dict,
    modernbert_encode,
)

transformers = pytest.importorskip("transformers")


def _tiny():
    hf_cfg = transformers.ModernBertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=5,
        num_attention_heads=4, intermediate_size=48,
        global_attn_every_n_layers=3, local_attention=8,
        max_position_embeddings=64,
        attention_dropout=0.0, embedding_dropout=0.0, mlp_dropout=0.0,
        global_rope_theta=160000.0, local_rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, cls_token_id=3,
        sep_token_id=4,
    )
    torch.manual_seed(0)
    model = transformers.ModernBertModel(hf_cfg).eval()
    cfg = ModernBertTextConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=5,
        num_attention_heads=4, intermediate_size=48,
        global_attn_every_n_layers=3, local_attention=8,
    )
    return model, cfg


def test_modernbert_matches_hf():
    model, cfg = _tiny()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_modernbert_state_dict(sd, cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(2, 128, size=(2, 24)).astype(np.int32)
    mask = np.ones((2, 24), bool)
    mask[1, 17:] = False
    ids[~mask] = 0

    last, hidden = modernbert_encode(
        params, jnp.asarray(ids), jnp.asarray(mask), cfg
    )
    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
            output_hidden_states=True,
        )
    theirs_last = out.last_hidden_state.numpy()
    np.testing.assert_allclose(
        np.asarray(last)[mask], theirs_last[mask], rtol=1e-3, atol=1e-4
    )
    assert len(hidden) == len(out.hidden_states)
    # the judge consumes an intermediate hidden layer (reference judge.py:74-88)
    for j in (1, 3, 5):
        np.testing.assert_allclose(
            np.asarray(hidden[j])[mask], out.hidden_states[j].numpy()[mask],
            rtol=1e-3, atol=1e-4,
        )
