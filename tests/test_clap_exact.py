"""Exact-architecture CLAP: full laion_clap state_dict conversion coverage,
embedding parity through the converted towers, rand_trunc, and the RoBERTa
byte-level BPE tokenizer vs HF's RobertaTokenizer on the same vocab files."""

import json

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from torch_htsat_oracle import HTSATOracle, default_tiny_melw

from sam_audio_tpu.models.clap import (
    ClapConfig,
    ClapModel,
    clap_audio_embed,
    clap_text_embed,
    convert_clap_state_dict,
    fit_duration_np,
)
from sam_audio_tpu.text_tokenizer import RobertaBPETokenizer

transformers = pytest.importorskip("transformers")

TINY = ClapConfig(
    sample_rate=8000, duration_s=1.0, n_fft=512, hop_length=400, n_mels=16,
    fmin=50.0, fmax=3500.0, spec_size=64, patch_size=4, audio_embed_dim=16,
    depths=(2, 2), audio_heads=(2, 4), window_size=4, text_vocab=120,
    text_hidden=32, text_layers=3, text_heads=4, text_intermediate=48,
    max_text_len=12, embed_dim=8,
)


def _full_laion_sd(seed=0):
    """Assemble a complete laion_clap-shaped state_dict (with DDP 'module.'
    prefix and the stale position_ids buffer, reference clap.py:23-27)."""
    torch.manual_seed(seed)
    htsat = HTSATOracle(default_tiny_melw()).eval()
    with torch.no_grad():
        htsat.bn0.running_mean.uniform_(-1, 1)
        htsat.bn0.running_var.uniform_(0.5, 2)
    roberta = transformers.RobertaModel(transformers.RobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )).eval()
    ap = torch.nn.Sequential(torch.nn.Linear(32, 8), torch.nn.ReLU(),
                             torch.nn.Linear(8, 8)).eval()
    tp = torch.nn.Sequential(torch.nn.Linear(32, 8), torch.nn.ReLU(),
                             torch.nn.Linear(8, 8)).eval()
    sd = {}
    sd.update({f"module.audio_branch.{k}": v.detach().numpy()
               for k, v in htsat.state_dict().items()})
    sd.update({f"module.text_branch.{k}": v.detach().numpy()
               for k, v in roberta.state_dict().items()})
    sd["module.text_branch.embeddings.position_ids"] = np.arange(40)[None]
    sd.update({f"module.audio_projection.{k}": v.detach().numpy()
               for k, v in ap.state_dict().items()})
    sd.update({f"module.text_projection.{k}": v.detach().numpy()
               for k, v in tp.state_dict().items()})
    sd["module.logit_scale_a"] = np.float32(np.log(1 / 0.07))
    sd["module.logit_scale_t"] = np.float32(np.log(1 / 0.07))
    return sd, htsat, roberta, ap, tp


def test_clap_conversion_complete_and_embeddings_match():
    sd, htsat, roberta, ap, tp = _full_laion_sd()
    params, unconverted = convert_clap_state_dict(sd, TINY)
    assert unconverted == [], unconverted

    rng = np.random.RandomState(1)
    wav = (0.4 * rng.randn(2, TINY.n_samples)).astype(np.float32).clip(-1, 1)
    ours_a = np.asarray(clap_audio_embed(params, TINY, jnp.asarray(wav)))
    with torch.no_grad():
        q = torch.from_numpy(wav).clamp(-1, 1)
        q = ((q * 32767.0).to(torch.int16)).float() / 32767.0
        ref = ap(htsat(q))
        ref = (ref / ref.norm(dim=-1, keepdim=True)).numpy()
    np.testing.assert_allclose(ours_a, ref, rtol=1e-3, atol=1e-3)

    ids = rng.randint(4, 120, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    ids[1, 6:] = 1
    mask[1, 6:] = 0
    ours_t = np.asarray(
        clap_text_embed(params, TINY, jnp.asarray(ids), jnp.asarray(mask))
    )
    with torch.no_grad():
        pooled = roberta(input_ids=torch.from_numpy(ids),
                         attention_mask=torch.from_numpy(mask)).pooler_output
        ref_t = tp(pooled)
        ref_t = (ref_t / ref_t.norm(dim=-1, keepdim=True)).numpy()
    np.testing.assert_allclose(ours_t, ref_t, rtol=2e-4, atol=2e-4)


def test_rand_trunc_seeded():
    wav = np.arange(100, dtype=np.float32)
    a = fit_duration_np(wav, 40, rand_trunc=True, rng=np.random.RandomState(3))
    b = fit_duration_np(wav, 40, rand_trunc=True, rng=np.random.RandomState(3))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (40,)
    # it is a contiguous crop of the original
    start = int(a[0])
    np.testing.assert_array_equal(a, wav[start : start + 40])
    # deterministic center-truncate differs in general
    c = fit_duration_np(wav, 40)
    np.testing.assert_array_equal(c, wav[30:70])


def test_roberta_bpe_matches_hf(tmp_path):
    """Our BPE vs transformers.RobertaTokenizer on the same vocab files."""
    byte_chars = "".join(
        chr(c) for c in list(range(ord("!"), ord("~") + 1))
    )
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in byte_chars:
        vocab.setdefault(ch, len(vocab))
    # Ġ = byte-level space marker
    for tok in ["Ġ", "he", "ll", "hell", "llo", "hello", "Ġw",
                "or", "ld", "orld", "world", "Ġworld", "Ġhello"]:
        vocab.setdefault(tok, len(vocab))
    merges = ["h e", "l l", "he ll", "l o", "ll o", "hell o", "Ġ w",
              "o r", "l d", "or ld", "w orld", "Ġw orld",
              "Ġ hello"]
    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(vocab), encoding="utf-8")
    # trailing newline matters: HF's slow tokenizer drops the last line
    merges_file.write_text("#version: 0.2\n" + "\n".join(merges) + "\n",
                           encoding="utf-8")

    hf = transformers.RobertaTokenizer(str(vocab_file), str(merges_file))
    ours = RobertaBPETokenizer.from_files(str(vocab_file), str(merges_file))

    texts = ["hello world", "world hello hello", "hexllo wyyorld !"]
    for text in texts:
        ref = hf(text, padding="max_length", truncation=True, max_length=12)
        ids, mask = ours([text], max_length=12)
        np.testing.assert_array_equal(ids[0], ref["input_ids"])
        np.testing.assert_array_equal(mask[0].astype(int),
                                      ref["attention_mask"])


def test_clap_model_scores_shape():
    import jax

    model = ClapModel.init_random(jax.random.PRNGKey(0), TINY)
    wav = jnp.zeros((3, TINY.n_samples), jnp.float32)
    emb = model.get_audio_embedding(wav)
    assert emb.shape == (3, 8)
    assert np.isfinite(np.asarray(emb)).all()


def test_get_roberta_tokenizer_env_dir(tmp_path, monkeypatch):
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "a": 4, "b": 5}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    monkeypatch.setenv("SAM_AUDIO_ROBERTA_TOKENIZER", str(tmp_path))
    from sam_audio_tpu.text_tokenizer import get_roberta_tokenizer

    tok = get_roberta_tokenizer()
    assert isinstance(tok, RobertaBPETokenizer)
    ids, mask = tok(["ab"], max_length=6)
    np.testing.assert_array_equal(ids[0][:4], [0, 4, 5, 2])
