"""WavLM parity vs HF transformers (random weights, converted)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from sam_audio_tpu.models.wavlm import (
    WavLMConfig,
    convert_wavlm_state_dict,
    wavlm_encode,
)

TINY = dict(
    hidden_size=48,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=96,
    conv_dim=(24, 24, 24),
    conv_stride=(5, 2, 2),
    conv_kernel=(10, 3, 3),
    num_buckets=40,
    max_bucket_distance=100,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    do_stable_layer_norm=False,
    feat_extract_norm="group",
    hidden_dropout=0.0,
    activation_dropout=0.0,
    attention_dropout=0.0,
    feat_proj_dropout=0.0,
    layerdrop=0.0,
)


def _models():
    hf_cfg = transformers.WavLMConfig(**TINY)
    torch.manual_seed(0)
    hf = transformers.WavLMModel(hf_cfg).eval()
    cfg = WavLMConfig(
        hidden_size=TINY["hidden_size"],
        num_layers=TINY["num_hidden_layers"],
        num_heads=TINY["num_attention_heads"],
        intermediate_size=TINY["intermediate_size"],
        conv_dim=TINY["conv_dim"],
        conv_stride=TINY["conv_stride"],
        conv_kernel=TINY["conv_kernel"],
        num_buckets=TINY["num_buckets"],
        max_distance=TINY["max_bucket_distance"],
        num_conv_pos_embeddings=TINY["num_conv_pos_embeddings"],
        num_conv_pos_embedding_groups=TINY["num_conv_pos_embedding_groups"],
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, unconverted = convert_wavlm_state_dict(sd, cfg)
    assert unconverted == [], unconverted
    return hf, cfg, params


def test_wavlm_matches_hf():
    hf, cfg, params = _models()
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 800).astype(np.float32) * 0.1
    with torch.no_grad():
        theirs = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
    ours = np.asarray(wavlm_encode(params, cfg, jnp.asarray(wav)))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


def test_wavlm_hidden_states_and_gating_distinct_per_layer():
    hf, cfg, params = _models()
    rng = np.random.RandomState(1)
    wav = rng.randn(1, 640).astype(np.float32) * 0.1
    hs = wavlm_encode(params, cfg, jnp.asarray(wav),
                      output_hidden_states=True)
    assert len(hs) == cfg.num_layers + 1
    with torch.no_grad():
        theirs = hf(torch.from_numpy(wav), output_hidden_states=True)
    for ours_h, theirs_h in zip(hs, theirs.hidden_states):
        np.testing.assert_allclose(np.asarray(ours_h), theirs_h.numpy(),
                                   rtol=2e-3, atol=3e-4)


def test_wavlm_large_layout_matches_hf():
    """feat_extract_norm='layer' + do_stable_layer_norm=True (the wavlm-large
    layout): per-conv LayerNorm, conv biases, pre-LN encoder with the final
    LN after the stack."""
    large = dict(TINY, feat_extract_norm="layer", do_stable_layer_norm=True,
                 conv_bias=True)
    hf_cfg = transformers.WavLMConfig(**large)
    torch.manual_seed(1)
    hf = transformers.WavLMModel(hf_cfg).eval()
    cfg = WavLMConfig(
        hidden_size=TINY["hidden_size"],
        num_layers=TINY["num_hidden_layers"],
        num_heads=TINY["num_attention_heads"],
        intermediate_size=TINY["intermediate_size"],
        conv_dim=TINY["conv_dim"],
        conv_stride=TINY["conv_stride"],
        conv_kernel=TINY["conv_kernel"],
        num_buckets=TINY["num_buckets"],
        max_distance=TINY["max_bucket_distance"],
        num_conv_pos_embeddings=TINY["num_conv_pos_embeddings"],
        num_conv_pos_embedding_groups=TINY["num_conv_pos_embedding_groups"],
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, unconverted = convert_wavlm_state_dict(sd, cfg)
    assert unconverted == [], unconverted
    assert "layer_norm" in params["feature_extractor"][1]
    assert "bias" in params["feature_extractor"][0]

    rng = np.random.RandomState(2)
    wav = rng.randn(2, 800).astype(np.float32) * 0.1
    with torch.no_grad():
        theirs = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
    ours = np.asarray(wavlm_encode(params, cfg, jnp.asarray(wav)))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)
