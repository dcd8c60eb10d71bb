"""Reference-grounded FULL `separate()` parity.

Runs the ACTUAL reference orchestration end to end — processor batching,
`_get_forward_args` candidate expansion (model.py:208-229), the zeros-video
align path (model.py:185-191), the fixed-grid 32-NFE midpoint ODE
(model.py:274-291), the codec decode reshape to (2B, C, T) and (B, 2, -1)
(model.py:292-296), unbatch via `feature_idx_to_wav_idx` (model.py:298-305),
text-ranker argmax selection (model.py:318-330), and the list-valued
SeparationResult (model.py:332-338) — using the real /root/reference source
(real codec.py backed by the dacvae-layout oracle, real text_encoder.py with
an injected tiny local T5; see tests/reference_e2e.py), and compares decoded
WAVEFORMS against our `SAMAudio.separate()` loaded from the same
reference-shaped checkpoint through `load_sam_audio`.

Shared across both sides: noise, tokenizer, T5 weights, energy ranker.
This subsumes the per-stage gates (velocity field, ODE, codec) into one
pipeline-level waveform gate — the hermetic version of the BASELINE.md
<=1e-3 north star.
"""

import json

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from reference_e2e import (
    NpEnergyRanker,
    TinyTokenizer,
    TorchEnergyRanker,
    reference_e2e,
)
from reference_loader import load_reference_processor, ref_module

from sam_audio_tpu.checkpoint import convert_t5_state_dict, load_sam_audio
from sam_audio_tpu.processor import SAMAudioProcessor

transformers = pytest.importorskip("transformers")

CODEC = dict(encoder_dim=4, encoder_rates=[2, 4], latent_dim=16,
             decoder_dim=16, decoder_rates=[4, 2], codebook_dim=3,
             sample_rate=8000)
# reference T5EncoderConfig only takes name/max_length/pad_mode/dim
# (config.py:49-60); ours additionally pins the tiny JAX-side architecture.
REF_TEXT = dict(dim=16, max_length=16)
OUR_TEXT = dict(dim=16, max_length=16, num_layers=2, num_heads=4, head_dim=4,
                d_ff=32, vocab_size=128, relative_attention_num_buckets=8,
                relative_attention_max_distance=16)
COMMON = dict(
    in_channels=18,  # 3 * 2 * codebook_dim
    audio_codec=CODEC,
    vision_encoder={"dim": 12},
    transformer=dict(dim=32, n_heads=4, n_layers=2, dropout=0.0,
                     context_dim=32, max_positions=64,
                     frequency_embedding_dim=8, out_channels=6),
    num_anchors=3,
    anchor_embedding_dim=8,
    span_predictor=None,
)


def _tiny_hf_t5():
    cfg = transformers.T5Config(
        vocab_size=128, d_model=16, d_kv=4, d_ff=32, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
    )
    torch.manual_seed(7)
    return transformers.T5EncoderModel(cfg).eval()


def _build_both(tmp_path):
    t5 = _tiny_hf_t5()
    tok = TinyTokenizer()

    with reference_e2e(t5_model=t5, tokenizer=tok) as mmod:
        cfgmod = ref_module("config")
        torch.manual_seed(0)
        ref = mmod.SAMAudio(
            cfgmod.SAMAudioConfig(text_encoder=dict(REF_TEXT), **COMMON)
        ).eval()
        ref.text_ranker = TorchEnergyRanker()

        # published-key-set checkpoint: the text tower ships separately
        # (reference base.py:56-61 / model.py skip policy)
        sd = {k: v for k, v in ref.state_dict().items()
              if not k.startswith("text_encoder.")}
        assert any(k.startswith("audio_codec.") for k in sd)  # real codec now
        torch.save(sd, tmp_path / "checkpoint.pt")
        cfg = dict(COMMON)
        cfg["text_encoder"] = dict(OUR_TEXT)
        cfg["compute_dtype"] = "float32"
        (tmp_path / "config.json").write_text(json.dumps(cfg))

        ours = load_sam_audio(str(tmp_path), allow_random_towers=True)
        ours.params["text_encoder"] = convert_t5_state_dict(
            {k: v.detach().numpy() for k, v in t5.state_dict().items()},
            ours.cfg.text_encoder,
        )
        ours._tokenizer = tok
        ours.text_ranker = NpEnergyRanker()
        yield_ref = ref, mmod
    return yield_ref[0], ours


def test_full_separate_parity_reranked(tmp_path):
    """b=2 uneven-length items, k=3 candidates, anchors, shared noise."""
    ref, ours = _build_both(tmp_path)

    rng = np.random.RandomState(3)
    wav0 = (0.1 * rng.randn(1, 96)).astype(np.float32)
    wav1 = (0.1 * rng.randn(1, 72)).astype(np.float32)
    descriptions = ["a violin playing", "dog barking"]
    anchors = [[("+", 0.0, 0.004)], [("-", 0.002, 0.006)]]

    pmod = load_reference_processor()
    rproc = pmod.SAMAudioProcessor(audio_hop_length=8,
                                   audio_sampling_rate=8000)
    rbatch = rproc(descriptions=descriptions,
                   audios=[torch.from_numpy(wav0), torch.from_numpy(wav1)],
                   anchors=anchors)

    oproc = SAMAudioProcessor(audio_hop_length=8, audio_sampling_rate=8000)
    obatch = oproc(descriptions=descriptions, audios=[wav0, wav1],
                   anchors=anchors)

    b, k, t_frames, lat2c = 2, 3, 12, 2 * CODEC["codebook_dim"]
    noise = rng.randn(b * k, t_frames, lat2c).astype(np.float32)

    rres = ref.separate(rbatch, noise=torch.from_numpy(noise),
                        reranking_candidates=k)
    ores = ours.separate(obatch, noise=jnp.asarray(noise),
                         reranking_candidates=k)

    assert len(rres.target) == len(ores.target) == b
    for i, (want_len) in enumerate((96, 72)):
        rt = rres.target[i].numpy().reshape(-1)
        ot = np.asarray(ores.target[i]).reshape(-1)
        assert rt.shape == ot.shape == (want_len,)
        assert np.std(rt) > 1e-4  # non-vacuous: real decoded signal
        np.testing.assert_allclose(ot, rt, atol=2e-3, rtol=0,
                                   err_msg=f"target[{i}]")
        rr = rres.residual[i].numpy().reshape(-1)
        orr = np.asarray(ores.residual[i]).reshape(-1)
        assert rr.shape == orr.shape == (want_len,)
        np.testing.assert_allclose(orr, rr, atol=2e-3, rtol=0,
                                   err_msg=f"residual[{i}]")

    # the ranker must have had a real choice to make (candidates distinct)
    # and both sides must have made the same one
    tref = rres.target[0].numpy()
    scores = NpEnergyRanker()([np.stack([tref, tref * 0.5])])
    assert scores[0, 0] != scores[0, 1]


def test_full_separate_parity_single_candidate(tmp_path):
    """k=1 path: no ranker decision, covers the idx-0 gather + unbatch."""
    ref, ours = _build_both(tmp_path)
    ref.text_ranker = None
    ours.text_ranker = None

    rng = np.random.RandomState(11)
    wav = (0.1 * rng.randn(1, 80)).astype(np.float32)  # 80 -> 10 frames

    pmod = load_reference_processor()
    rproc = pmod.SAMAudioProcessor(audio_hop_length=8,
                                   audio_sampling_rate=8000)
    rbatch = rproc(descriptions=["rain"], audios=[torch.from_numpy(wav)])
    oproc = SAMAudioProcessor(audio_hop_length=8, audio_sampling_rate=8000)
    obatch = oproc(descriptions=["rain"], audios=[wav])

    noise = rng.randn(1, 10, 2 * CODEC["codebook_dim"]).astype(np.float32)
    rres = ref.separate(rbatch, noise=torch.from_numpy(noise))
    ores = ours.separate(obatch, noise=jnp.asarray(noise))

    rt = rres.target[0].numpy().reshape(-1)
    ot = np.asarray(ores.target[0]).reshape(-1)
    assert rt.shape == ot.shape == (80,)
    assert np.std(rt) > 1e-4
    np.testing.assert_allclose(ot, rt, atol=2e-3, rtol=0)
    rr = rres.residual[0].numpy().reshape(-1)
    orr = np.asarray(ores.residual[0]).reshape(-1)
    np.testing.assert_allclose(orr, rr, atol=2e-3, rtol=0)
