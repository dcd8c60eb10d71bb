"""Faithful audiobox-aesthetics predictor: fairseq-layout checkpoint sniffing
+ WavLM-backed scoring pipeline (chunking, masked mean, de-normalization)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from sam_audio_tpu.models.aesthetics import (
    AXES,
    AudioboxAesthetics,
    AudioboxAestheticsConfig,
    convert_aes_checkpoint,
)
from sam_audio_tpu.models.wavlm import WavLMConfig

TINY_WAVLM = WavLMConfig(
    hidden_size=48, num_layers=2, num_heads=4, intermediate_size=96,
    conv_dim=(24, 24, 24), conv_stride=(5, 2, 2), conv_kernel=(10, 3, 3),
    num_buckets=40, max_distance=100, num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


def _hf_model():
    hf_cfg = transformers.WavLMConfig(
        hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=96, conv_dim=(24, 24, 24), conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3), num_buckets=40, max_bucket_distance=100,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        feat_extract_norm="group", do_stable_layer_norm=False,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0,
    )
    torch.manual_seed(0)
    return transformers.WavLMModel(hf_cfg).eval()


def _fairseq_keys(hf_sd):
    """Rename an HF WavLM state_dict into the fairseq/original spelling that
    audiobox-aesthetics checkpoints carry."""
    import re

    out = {}
    for k, v in hf_sd.items():
        if "masked_spec_embed" in k:
            continue
        nk = k
        nk = re.sub(r"feature_extractor\.conv_layers\.(\d+)\.conv\.",
                    r"feature_extractor.conv_layers.\1.0.", nk)
        nk = re.sub(r"feature_extractor\.conv_layers\.(\d+)\.layer_norm\.",
                    r"feature_extractor.conv_layers.\1.2.", nk)
        nk = nk.replace("feature_projection.projection.", "post_extract_proj.")
        if nk.startswith("feature_projection.layer_norm."):
            nk = "layer_norm." + nk[len("feature_projection.layer_norm."):]
        nk = nk.replace("encoder.pos_conv_embed.conv.", "encoder.pos_conv.0.")
        nk = nk.replace(".attention.gru_rel_pos_linear", ".self_attn.grep_linear")
        nk = nk.replace(".attention.gru_rel_pos_const", ".self_attn.grep_a")
        nk = nk.replace(".attention.rel_attn_embed",
                        ".self_attn.relative_attention_bias")
        nk = re.sub(r"\.attention\.(q|k|v|out)_proj", r".self_attn.\1_proj", nk)
        nk = nk.replace(".attention.", ".self_attn.")  # safety net
        nk = nk.replace(".layer_norm.", ".self_attn_layer_norm.") \
            if ".layers." in nk and ".layer_norm." in nk \
            and "final" not in nk and "self_attn" not in nk else nk
        nk = nk.replace(".feed_forward.intermediate_dense", ".fc1")
        nk = nk.replace(".feed_forward.output_dense", ".fc2")
        out[nk] = v
    return out


def _fake_checkpoint(tmp_path):
    hf = _hf_model()
    sd = {k: v for k, v in hf.state_dict().items()}
    fs = {f"model.encoder.{k}": v for k, v in _fairseq_keys(sd).items()}
    torch.manual_seed(1)
    h = 48
    for ax in AXES:
        fs[f"model.proj_{ax}.0.weight"] = torch.randn(h, h) * 0.05
        fs[f"model.proj_{ax}.0.bias"] = torch.zeros(h)
        fs[f"model.proj_{ax}.2.weight"] = torch.randn(1, h) * 0.05
        fs[f"model.proj_{ax}.2.bias"] = torch.zeros(1)
    blob = {
        "state_dict": fs,
        "target_transform": {ax: {"mean": 5.0, "std": 2.0} for ax in AXES},
    }
    path = str(tmp_path / "aes.pt")
    torch.save(blob, path)
    return hf, path


def test_convert_and_wavlm_parity(tmp_path):
    hf, path = _fake_checkpoint(tmp_path)
    cfg = AudioboxAestheticsConfig(wavlm=TINY_WAVLM)
    params, unconverted, cfg = convert_aes_checkpoint(path, cfg)
    assert unconverted == [], unconverted
    assert set(params["heads"]) == set(AXES)
    assert len(params["heads"]["CE"]) == 2  # 2-linear MLP head

    # tower numerics: converted fairseq spelling == HF forward
    from sam_audio_tpu.models.wavlm import wavlm_encode

    wav = np.random.RandomState(0).randn(1, 800).astype(np.float32) * 0.1
    with torch.no_grad():
        theirs = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
    ours = np.asarray(wavlm_encode(params["wavlm"], TINY_WAVLM,
                                   jnp.asarray(wav)))
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=3e-4)


def test_predictor_pipeline_chunks_and_denormalizes(tmp_path):
    _, path = _fake_checkpoint(tmp_path)
    cfg = AudioboxAestheticsConfig(wavlm=TINY_WAVLM, chunk_seconds=0.05)
    model = AudioboxAesthetics.from_torch_checkpoint(path, cfg)
    rng = np.random.RandomState(0)
    wavs = [rng.randn(2, 1600).astype(np.float32) * 0.1,  # stereo, 2 chunks
            rng.randn(700).astype(np.float32) * 0.1]      # mono, short
    out = model(wavs, sample_rate=16_000)
    assert len(out) == 2
    for row in out:
        assert set(row) == set(AXES)
        assert all(np.isfinite(v) for v in row.values())

    # de-normalization applied: y*2+5 vs a no-transform model
    model.params.pop("target_transform")
    raw = model(wavs, sample_rate=16_000)
    for a, b in zip(out, raw):
        for ax in AXES:
            np.testing.assert_allclose(a[ax], b[ax] * 2.0 + 5.0, rtol=1e-5)


def test_random_init_runs():
    model = AudioboxAesthetics.init_random(
        jax.random.PRNGKey(0), AudioboxAestheticsConfig(wavlm=TINY_WAVLM))
    wav = [np.zeros(400, np.float32)]
    out = model(wav, sample_rate=16_000)
    assert set(out[0]) == set(AXES)
