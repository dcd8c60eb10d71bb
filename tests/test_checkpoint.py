import jax
import numpy as np

from sam_audio_tpu.checkpoint import (
    flatten_pytree,
    load_params,
    save_params,
    unflatten_pytree,
)
from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import sam_audio_init


def test_flatten_unflatten_roundtrip_with_lists():
    tree = {
        "a": {"weight": np.ones((2, 3))},
        "blocks": [
            {"w": np.zeros((2,))},
            {"w": np.ones((2,))},
        ],
    }
    flat = flatten_pytree(tree)
    assert "blocks/0/w" in flat and "a/weight" in flat
    back = unflatten_pytree(flat)
    assert isinstance(back["blocks"], list)
    np.testing.assert_array_equal(np.asarray(back["blocks"][1]["w"]), [1, 1])


def test_save_load_full_model(tmp_path):
    cfg = tiny_test_config()
    params = sam_audio_init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "params.npz")
    save_params(path, params)
    loaded = load_params(path)

    flat_a = flatten_pytree(params)
    flat_b = flatten_pytree(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), np.asarray(flat_b[k]))


def test_load_sam_audio_from_dir(tmp_path):
    import json

    from sam_audio_tpu.checkpoint import load_sam_audio

    cfg = tiny_test_config()
    params = sam_audio_init(jax.random.PRNGKey(0), cfg)
    save_params(str(tmp_path / "params.npz"), params)
    cfg_dict = {
        "in_channels": cfg.in_channels,
        "audio_codec": {
            "encoder_dim": 4, "encoder_rates": [2, 4], "latent_dim": 16,
            "decoder_dim": 16, "decoder_rates": [4, 2], "codebook_dim": 4,
            "sample_rate": 8000,
        },
        "text_encoder": {
            "dim": 16, "num_layers": 2, "num_heads": 2, "head_dim": 8,
            "d_ff": 32, "vocab_size": 256,
        },
        "transformer": {
            "dim": 32, "n_heads": 2, "n_layers": 2, "dropout": 0.0,
            "context_dim": 32, "max_positions": 64,
            "frequency_embedding_dim": 8, "out_channels": 8,
        },
        "span_predictor": None,
        "compute_dtype": "float32",
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    model = load_sam_audio(str(tmp_path), allow_random_towers=True)
    assert model.cfg.audio_codec.hop_length == 8
    assert "transformer" in model.params


def test_strict_conversion_rejects_unconsumed_keys():
    """A renamed/extra module in checkpoint.pt must fail loudly — silent key
    drops would produce a wrong model (the tower converters already check
    coverage; the main-model converter now does too)."""
    import pytest

    from sam_audio_tpu.checkpoint import convert_sam_audio_state_dict
    from test_sam_audio_torch_parity import CFG as cfg
    from test_sam_audio_torch_parity import SAMAudioOracle

    oracle = SAMAudioOracle().eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    sd["mystery_module.weight"] = sd[next(iter(sd))]
    with pytest.raises(ValueError, match="mystery_module"):
        convert_sam_audio_state_dict(sd, cfg)
    # tower keys are policy-skipped, strict=False tolerates anything
    del sd["mystery_module.weight"]
    sd["text_encoder.anything"] = sd[next(iter(sd))]
    convert_sam_audio_state_dict(sd, cfg)  # no raise
    sd["mystery_module.weight"] = sd[next(iter(sd))]
    convert_sam_audio_state_dict(sd, cfg, strict=False)  # no raise


def test_save_pretrained_roundtrip_exact_separation(tmp_path):
    """model.save_pretrained(dir) -> from_pretrained(dir) must reproduce the
    source model's separation bit-exactly — including a quantize()d model,
    whose w8 leaves round-trip through the npz snapshot and serve as-is."""
    import jax.numpy as jnp

    from sam_audio_tpu.models.sam_audio import SAMAudio
    from sam_audio_tpu.processor import SAMAudioProcessor

    cfg = tiny_test_config()
    model = SAMAudio.init_random(jax.random.PRNGKey(0), cfg)
    proc = SAMAudioProcessor(audio_hop_length=model.hop_length,
                             audio_sampling_rate=model.sample_rate)
    wav = np.random.RandomState(0).randn(1, 4 * model.hop_length) \
        .astype(np.float32) * 0.1
    batch = proc(descriptions=["tone"], audios=[wav])
    t_frames = batch.anchor_alignment.shape[-1]
    noise = jnp.asarray(
        np.random.RandomState(1).randn(
            1, t_frames, 2 * cfg.audio_codec.codebook_dim), jnp.float32)
    ref = model.separate(batch, noise=noise)

    out = model.save_pretrained(str(tmp_path / "snap"))
    loaded = SAMAudio.from_pretrained(out, allow_random_towers=True)
    got = loaded.separate(proc(descriptions=["tone"], audios=[wav]),
                          noise=noise)
    np.testing.assert_array_equal(np.asarray(got.target[0]),
                                  np.asarray(ref.target[0]))

    # quantized tree round-trip: w8/w_scale leaves survive the npz and the
    # loaded model dispatches straight onto the int8 path
    model.quantize()
    ref_q = model.separate(batch, noise=noise)
    out_q = model.save_pretrained(str(tmp_path / "snap_q"))
    loaded_q = SAMAudio.from_pretrained(out_q, allow_random_towers=True)
    assert "w8" in loaded_q.params["transformer"]["layers"]["attention"]["wq"]
    got_q = loaded_q.separate(proc(descriptions=["tone"], audios=[wav]),
                              noise=noise)
    np.testing.assert_array_equal(np.asarray(got_q.target[0]),
                                  np.asarray(ref_q.target[0]))
