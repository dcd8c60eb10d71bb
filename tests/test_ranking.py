import numpy as np

from sam_audio_tpu.config import (
    SoundActivityRankerConfig,
    parse_ranker_config,
)
from sam_audio_tpu.ranking import create_ranker
from sam_audio_tpu.ranking.ranker import EnsembleRanker
from sam_audio_tpu.ranking.sound_activity import (
    SoundActivityRanker,
    compute_iou_recall_precision,
    detect_nonsilent,
)


def tone(duration_s, sr, freq=440.0, amp=0.5):
    t = np.arange(int(duration_s * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_iou_recall_precision():
    res = compute_iou_recall_precision([(0.0, 1.0)], [(0.5, 1.5)])
    assert abs(res["iou"] - 0.5 / 1.5) < 1e-9
    assert abs(res["recall"] - 0.5) < 1e-9
    assert abs(res["precision"] - 0.5) < 1e-9
    assert compute_iou_recall_precision([], [(0, 1)])["iou"] == 0


def test_detect_nonsilent_finds_tone_span():
    sr = 24000
    wav = np.concatenate([
        np.zeros(sr, np.float32),          # 1s silence
        tone(1.0, sr),                     # 1s tone
        np.zeros(sr, np.float32),          # 1s silence
    ])
    spans = detect_nonsilent(wav, sr)
    assert len(spans) == 1
    s, e = spans[0]
    assert 0.8 < s < 1.2
    assert 1.8 < e < 2.2


def test_detect_nonsilent_all_silent():
    assert detect_nonsilent(np.zeros(24000, np.float32), 24000) == []


def test_sound_activity_ranker_prefers_matching_candidate():
    sr = 48000
    cfg = SoundActivityRankerConfig()
    ranker = SoundActivityRanker(cfg)
    # candidate 0: tone in [1, 2]s; candidate 1: tone in [0, 1]s
    cand0 = np.concatenate([np.zeros(sr, np.float32), tone(1.0, sr),
                            np.zeros(sr, np.float32)])
    cand1 = np.concatenate([tone(1.0, sr), np.zeros(2 * sr, np.float32)])
    wavs = np.stack([cand0, cand1])
    spans = [[["+", 1.0, 2.0]]]
    scores = ranker(extracted_audio=[wavs], spans=spans, sample_rate=sr)
    assert scores.shape == (1, 2)
    assert scores[0, 0] > scores[0, 1]


def test_ensemble_ranker_weighting():
    class Const:
        def __init__(self, v):
            self.v = v

        def __call__(self, **kw):
            return np.full((2, 3), self.v, np.float32)

    ens = EnsembleRanker([Const(1.0), Const(2.0)], [0.25, 0.5])
    out = ens()
    np.testing.assert_allclose(out, np.full((2, 3), 1.25))


def test_factory_builds_ensemble():
    cfg = parse_ranker_config({
        "kind": "ensemble",
        "rankers": {"sa": [{"kind": "sound_activity"}, 1.0]},
    })
    ranker = create_ranker(cfg)
    assert isinstance(ranker, EnsembleRanker)
    assert create_ranker(None) is None


def test_weightless_rankers_fail_loud():
    """CLAP/ImageBind rankers without staged checkpoints must raise instead of
    silently scoring with random weights (reference always loads real ranker
    weights, sam_audio/model/base.py:56-61)."""
    import pytest

    from sam_audio_tpu.config import ClapRankerConfig, ImageBindRankerConfig
    from sam_audio_tpu.ranking.clap import ClapRanker
    from sam_audio_tpu.ranking.imagebind import ImageBindRanker

    with pytest.raises(ValueError, match="checkpoint"):
        _ = ClapRanker(ClapRankerConfig()).model
    with pytest.raises(ValueError, match="checkpoint"):
        _ = ImageBindRanker(ImageBindRankerConfig()).model
    # explicit opt-in still works (tests/benchmarks)
    assert ClapRanker(ClapRankerConfig(), allow_random=True) is not None


def test_create_ranker_threads_allow_random():
    from sam_audio_tpu.config import ClapRankerConfig

    r = create_ranker(ClapRankerConfig())
    assert r.allow_random is False
    r = create_ranker(ClapRankerConfig(), allow_random=True)
    assert r.allow_random is True


def test_encode_videos_fails_loud_without_vision_tower():
    import pytest

    from sam_audio_tpu.config import tiny_test_config
    from sam_audio_tpu.models.pe_clip import encode_videos
    from sam_audio_tpu.models.sam_audio import SAMAudio

    cfg = tiny_test_config()
    model = SAMAudio(cfg, {})  # not init_random: simulates a loaded model
    with pytest.raises(ValueError, match="vision"):
        encode_videos(model, [np.zeros((2, 3, 8, 8), np.float32)], 4)


def test_clap_ranker_rand_trunc_seeded():
    """Ranker-path truncation must use the reference's rand_trunc semantics
    (reference ranking/clap.py:59-61) reproducibly via an explicit seed."""
    from sam_audio_tpu.config import ClapRankerConfig
    from sam_audio_tpu.ranking.clap import ClapRanker

    captured = []

    class SpyModel:
        class cfg:
            n_samples = 100

        def get_audio_embedding(self, flat):
            captured.append(np.asarray(flat))
            return np.zeros((flat.shape[0], 4), np.float32)

        def get_text_embedding(self, texts):
            return np.zeros((len(texts), 4), np.float32)

    # 300-sample ramp: any window identifies its start offset
    wav = np.arange(300, dtype=np.float32)[None]
    ranker = ClapRanker(ClapRankerConfig(), model=SpyModel(), seed=123)
    ranker(extracted_audio=[wav], descriptions=["x"])
    ranker(extracted_audio=[wav], descriptions=["x"])
    a, b = captured
    np.testing.assert_array_equal(a, b)  # same seed -> same window
    start = int(a[0, 0])
    assert 0 <= start <= 200
    np.testing.assert_array_equal(a[0], np.arange(start, start + 100))
    # center-trunc would always start at 100; a different seed must be able
    # to produce a different window
    captured.clear()
    ranker2 = ClapRanker(ClapRankerConfig(), model=SpyModel(), seed=7)
    ranker2(extracted_audio=[wav], descriptions=["x"])
    assert int(captured[0][0, 0]) != start or start != 100


def test_predict_spans_fails_loud_without_predictor():
    import pytest

    from sam_audio_tpu.config import tiny_test_config
    from sam_audio_tpu.models.sam_audio import SAMAudio, sam_audio_init
    from sam_audio_tpu.processor import SAMAudioProcessor
    from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

    import jax

    cfg = tiny_test_config()
    model = SAMAudio(cfg, sam_audio_init(jax.random.PRNGKey(0), cfg),
                     tokenizer=ByteFallbackTokenizer(
                         cfg.text_encoder.vocab_size))  # loaded-model posture
    p = SAMAudioProcessor(audio_hop_length=cfg.audio_codec.hop_length,
                          audio_sampling_rate=cfg.audio_codec.sample_rate)
    batch = p(descriptions=["x"],
              audios=[np.zeros((1, 64), np.float32)])
    with pytest.raises(ValueError, match="span predictor"):
        model.separate(batch, predict_spans=True, rng=jax.random.PRNGKey(1))


def test_detect_nonsilent_short_clip_is_whole_clip():
    """pydub parity: a clip shorter than min_silence_len cannot contain
    silence, so the WHOLE clip is non-silent — an empty result would zero
    every sub-250 ms candidate's activity score."""
    sr = 24000
    wav = 0.3 * np.sin(2 * np.pi * 440 * np.arange(int(0.1 * sr)) / sr)
    spans = detect_nonsilent(wav.astype(np.float32), sr)
    assert spans == [(0.0, 0.1)]
    # zero-length input stays empty
    assert detect_nonsilent(np.zeros(0, np.float32), sr) == []
    # and the score is non-degenerate for a short matching candidate
    m = compute_iou_recall_precision(spans, [[0.0, 0.1]])
    assert m["iou"] > 0.99


def test_detect_nonsilent_scans_unaligned_final_window():
    """pydub always scans the final [last_start, end] window even when
    last_start is not a multiple of seek_step: trailing silence at an
    unaligned tail must be detected."""
    sr = 24000
    total_ms = 1003  # last_start = 753, not a multiple of 10
    n = int(total_ms * sr / 1000)
    t = np.arange(n) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    wav[int(0.753 * sr):] = 0.0  # silence only in the unaligned tail
    spans = detect_nonsilent(wav, sr)
    # the clip must NOT be reported non-silent to the very end
    assert spans, "tone must be detected"
    assert spans[-1][1] <= 0.76, spans
