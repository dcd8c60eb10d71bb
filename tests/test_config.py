import json

from sam_audio_tpu.config import (
    EnsembleRankerConfig,
    JudgeRankerConfig,
    SAMAudioConfig,
    SoundActivityRankerConfig,
    TransformerConfig,
    parse_ranker_config,
    tiny_test_config,
)


def test_defaults_match_reference():
    cfg = SAMAudioConfig()
    assert cfg.audio_codec.hop_length == 1920
    assert cfg.audio_codec.sample_rate == 48_000
    assert cfg.transformer.dim == 2048
    assert cfg.transformer.n_layers == 16
    assert cfg.in_channels == 768
    assert cfg.transformer.out_channels == 256


def test_ffn_hidden_dim_rounding():
    # reference transformer.py:179-185: 2/3 * 4 * 2048 = 5461 -> 5504 (x64)
    cfg = TransformerConfig()
    assert cfg.ffn_hidden_dim == 5504
    cfg2 = TransformerConfig(dim=32, ffn_exp=4, multiple_of=64)
    # 2/3*128 = 85 -> 128
    assert cfg2.ffn_hidden_dim == 128


def test_from_dict_roundtrip():
    d = {
        "in_channels": 768,
        "audio_codec": {"encoder_dim": 64, "encoder_rates": [2, 8, 10, 12]},
        "transformer": {"dim": 128, "n_layers": 2, "n_heads": 4},
        "text_encoder": {"name": "t5-base"},
        "span_predictor": None,
        "unknown_future_field": 123,
    }
    cfg = SAMAudioConfig.from_dict(json.loads(json.dumps(d)))
    assert cfg.transformer.dim == 128
    assert cfg.audio_codec.hop_length == 1920
    assert hash(cfg) is not None  # frozen/hashable -> usable as jit static arg


def test_ranker_config_parsing():
    d = {
        "kind": "ensemble",
        "rankers": {
            "judge": [{"kind": "judge"}, 0.7],
            "activity": [
                {"kind": "sound_activity", "metric": "recall"},
                0.3,
            ],
        },
    }
    cfg = parse_ranker_config(d)
    assert isinstance(cfg, EnsembleRankerConfig)
    items = dict(cfg.items())
    assert isinstance(items["judge"][0], JudgeRankerConfig)
    assert isinstance(items["activity"][0], SoundActivityRankerConfig)
    assert items["activity"][0].metric == "recall"
    assert items["judge"][1] == 0.7


def test_tiny_config_consistency():
    cfg = tiny_test_config()
    assert cfg.in_channels == 3 * 2 * cfg.audio_codec.codebook_dim
    assert cfg.transformer.out_channels == 2 * cfg.audio_codec.codebook_dim
