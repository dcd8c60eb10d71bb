"""PEAudioFrame-compatible span predictor: converter coverage + forward
parity vs a key-faithful torch oracle (reference model.py:96-102, 231-245:
PEAudioFrame consumes the first 128 latent channels + transformed text and
returns per-item (start, end) second spans)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from test_peav_converter import _fairseq_tower_sd, _make_layers, torch_tower

from sam_audio_tpu.models.span_predictor import (
    PEAudioFrameConfig,
    convert_peaudioframe_state_dict,
    frames_to_spans,
    peaudioframe_forward,
)

H, NH, NL = 32, 4, 2  # matches test_peav_converter globals
AUDIO_DIM, VOCAB, B, T, L = 12, 50, 2, 10, 4


def _reference_layout_sd(rng):
    layers = _make_layers(rng)
    sd = _fairseq_tower_sd("transformer.", rng, H, NL, 56)
    sd["text_embed.weight"] = (rng.randn(VOCAB, H) * 0.1).astype(np.float32)
    sd["data_proj.weight"] = (rng.randn(H, AUDIO_DIM) * 0.2).astype(np.float32)
    sd["data_proj.bias"] = np.zeros(H, np.float32)
    sd["head.weight"] = (rng.randn(1, H) * 0.2).astype(np.float32)
    sd["head.bias"] = np.zeros(1, np.float32)
    # the fairseq tower helper writes its own random tower weights; rebuild
    # `layers` role arrays FROM the sd so the torch oracle matches exactly
    for i, lay in enumerate(layers):
        Lp = f"transformer.layers.{i}"
        for role, name in (("wq", "self_attn.q_proj"), ("wk", "self_attn.k_proj"),
                           ("wv", "self_attn.v_proj"), ("wo", "self_attn.out_proj")):
            lay[role] = torch.from_numpy(sd[f"{Lp}.{name}.weight"])
            lay["b" + role[1]] = torch.from_numpy(sd[f"{Lp}.{name}.bias"])
        lay["ln1w"] = torch.from_numpy(sd[f"{Lp}.self_attn_layer_norm.weight"])
        lay["ln1b"] = torch.from_numpy(sd[f"{Lp}.self_attn_layer_norm.bias"])
        lay["ln2w"] = torch.from_numpy(sd[f"{Lp}.final_layer_norm.weight"])
        lay["ln2b"] = torch.from_numpy(sd[f"{Lp}.final_layer_norm.bias"])
        lay["fc1w"] = torch.from_numpy(sd[f"{Lp}.fc1.weight"])
        lay["fc1b"] = torch.from_numpy(sd[f"{Lp}.fc1.bias"])
        lay["fc2w"] = torch.from_numpy(sd[f"{Lp}.fc2.weight"])
        lay["fc2b"] = torch.from_numpy(sd[f"{Lp}.fc2.bias"])
    final = (torch.from_numpy(sd["transformer.final_layer_norm.weight"]),
             torch.from_numpy(sd["transformer.final_layer_norm.bias"]))
    return sd, layers, final


def test_peaudioframe_conversion_and_parity():
    rng = np.random.RandomState(0)
    sd, layers, final = _reference_layout_sd(rng)
    cfg = PEAudioFrameConfig(audio_dim=AUDIO_DIM, hidden=H, num_layers=NL,
                             num_heads=NH, vocab_size=VOCAB, pos="none")
    params, arch, unconverted = convert_peaudioframe_state_dict(sd, cfg)
    assert unconverted == [], unconverted
    assert arch["prenorm"] is True

    ids = rng.randint(1, VOCAB, (B, L)).astype(np.int32)
    tmask = np.ones((B, L), bool)
    tmask[0, 3:] = False
    audio = rng.randn(B, T, AUDIO_DIM).astype(np.float32)
    amask = np.ones((B, T), bool)
    amask[1, 7:] = False

    logits = np.asarray(peaudioframe_forward(
        params, cfg, jnp.asarray(audio), jnp.asarray(amask),
        jnp.asarray(ids), jnp.asarray(tmask),
    ))
    assert logits.shape == (B, T)

    # torch oracle: embed text, project audio, joint sequence through the
    # tower with the combined mask, head over the audio positions
    import test_peav_converter as tp

    emb = torch.from_numpy(sd["text_embed.weight"])[torch.from_numpy(ids.astype(np.int64))]
    aud = F.linear(torch.from_numpy(audio),
                   torch.from_numpy(sd["data_proj.weight"]),
                   torch.from_numpy(sd["data_proj.bias"]))
    x = torch.cat([emb, aud], dim=1)
    mask = torch.from_numpy(np.concatenate([tmask, amask], axis=1))
    old_b, old_t = tp.B, tp.T
    tp.B, tp.T = B, L + T  # torch_tower reads module globals for shapes
    try:
        with torch.no_grad():
            out = torch_tower(layers, x, mask, prenorm=True, final=final)
    finally:
        tp.B, tp.T = old_b, old_t
    ref = F.linear(out[:, -T:], torch.from_numpy(sd["head.weight"]),
                   torch.from_numpy(sd["head.bias"]))[..., 0].numpy()
    valid = amask
    np.testing.assert_allclose(logits[valid], ref[valid], rtol=2e-4, atol=2e-4)


def test_load_sam_audio_attaches_peaudioframe(tmp_path):
    """A snapshot with span_predictor/{params.npz,config.json} loads the
    weight-faithful executor and separate(predict_spans=True) runs with it."""
    import json

    import jax

    from sam_audio_tpu.checkpoint import load_sam_audio, save_params
    from sam_audio_tpu.config import tiny_test_config
    from sam_audio_tpu.models.sam_audio import sam_audio_init
    from sam_audio_tpu.models.span_predictor import PEAudioFrameModel
    from sam_audio_tpu.processor import SAMAudioProcessor

    cfg = tiny_test_config()
    save_params(str(tmp_path / "params.npz"),
                sam_audio_init(jax.random.PRNGKey(0), cfg))
    cfg_dict = {
        "in_channels": cfg.in_channels,
        "audio_codec": {"encoder_dim": 4, "encoder_rates": [2, 4],
                        "latent_dim": 16, "decoder_dim": 16,
                        "decoder_rates": [4, 2], "codebook_dim": 4,
                        "sample_rate": 8000},
        "text_encoder": {"dim": 16, "num_layers": 2, "num_heads": 2,
                         "head_dim": 8, "d_ff": 32, "vocab_size": 256},
        "vision_encoder": {"dim": 12, "image_size": 28, "patch_size": 14,
                           "width": 16, "vit_layers": 2, "vit_heads": 2},
        "num_anchors": 3, "anchor_embedding_dim": 8,
        "transformer": {"dim": 32, "n_heads": 2, "n_layers": 2,
                        "dropout": 0.0, "context_dim": 32,
                        "max_positions": 64, "frequency_embedding_dim": 8,
                        "out_channels": 8},
        "span_predictor": "pe-a-frame-large",
        "compute_dtype": "float32",
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg_dict))

    rng = np.random.RandomState(1)
    sd = _fairseq_tower_sd("transformer.", rng, H, NL, 56)
    sd["text_embed.weight"] = (rng.randn(300, H) * 0.1).astype(np.float32)
    sd["data_proj.weight"] = (rng.randn(H, 4) * 0.2).astype(np.float32)
    sd["data_proj.bias"] = np.zeros(H, np.float32)
    sd["head.weight"] = (rng.randn(1, H) * 0.2).astype(np.float32)
    sd["head.bias"] = np.zeros(1, np.float32)
    sp_cfg = PEAudioFrameConfig(audio_dim=4, hidden=H, num_layers=NL,
                                num_heads=NH, vocab_size=300, pos="none")
    sp_params, arch, unconverted = convert_peaudioframe_state_dict(sd, sp_cfg)
    assert unconverted == []
    sp_dir = tmp_path / "span_predictor"
    sp_dir.mkdir()
    save_params(str(sp_dir / "params.npz"), sp_params)
    (sp_dir / "config.json").write_text(json.dumps({
        "audio_dim": 4, "hidden": H, "num_layers": NL, "num_heads": NH,
        "vocab_size": 300, "pos": "none", **arch,
    }))

    model = load_sam_audio(str(tmp_path), allow_random_towers=True)
    assert isinstance(model.span_predictor, PEAudioFrameModel)

    proc = SAMAudioProcessor(audio_hop_length=8, audio_sampling_rate=8000)
    wav = 0.1 * np.random.RandomState(2).randn(1, 64).astype(np.float32)
    batch = proc(descriptions=["a beep"], audios=[wav])
    result = model.separate(batch, predict_spans=True,
                            rng=jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(result.target[0])).all()


def test_peaudioframe_spans_pipeline():
    probs = np.zeros((1, 20), np.float32)
    probs[0, 5:12] = 0.9
    spans = frames_to_spans(probs, np.ones((1, 20), bool), threshold=0.5,
                            min_duration_s=0.1, frame_rate=25.0)
    assert spans == [[(0.2, 0.48)]]
