"""Edge cases and numerical robustness across the pipeline."""

import jax
import numpy as np

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import SAMAudio
from sam_audio_tpu.processor import SAMAudioProcessor
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

CFG = tiny_test_config()


def make_model():
    return SAMAudio.init_random(
        jax.random.PRNGKey(0), CFG,
        tokenizer=ByteFallbackTokenizer(CFG.text_encoder.vocab_size),
    )


def make_proc():
    return SAMAudioProcessor(
        audio_hop_length=CFG.audio_codec.hop_length,
        audio_sampling_rate=CFG.audio_codec.sample_rate,
    )


def test_silent_input_no_nans():
    model = make_model()
    batch = make_proc()(descriptions=["silence"],
                        audios=[np.zeros((1, 64), np.float32)])
    res = model.separate(batch, rng=jax.random.PRNGKey(1))
    assert np.isfinite(res.target[0]).all()
    assert np.isfinite(res.residual[0]).all()


def test_single_frame_audio():
    model = make_model()
    # hop=8 in tiny config: 8 samples = exactly one latent frame
    batch = make_proc()(descriptions=["blip"],
                        audios=[np.ones((1, 8), np.float32) * 0.1])
    res = model.separate(batch, rng=jax.random.PRNGKey(2))
    assert res.target[0].shape == (8,)
    assert np.isfinite(res.target[0]).all()


def test_sub_frame_audio():
    model = make_model()
    # 3 samples < hop: ceil -> 1 frame, reflect pad inside codec
    batch = make_proc()(descriptions=["tick"],
                        audios=[np.ones((1, 3), np.float32) * 0.1])
    res = model.separate(batch, rng=jax.random.PRNGKey(3))
    # unbatch length = feature_idx_to_wav_idx(1) = hop
    assert res.target[0].shape == (8,)


def test_empty_description():
    model = make_model()
    batch = make_proc()(descriptions=[""],
                        audios=[np.ones((1, 24), np.float32) * 0.1])
    res = model.separate(batch, rng=jax.random.PRNGKey(4))
    assert np.isfinite(res.target[0]).all()


def test_loud_input_clipping_range():
    model = make_model()
    batch = make_proc()(descriptions=["loud"],
                        audios=[np.ones((1, 64), np.float32) * 10.0])
    res = model.separate(batch, rng=jax.random.PRNGKey(5))
    assert np.isfinite(res.target[0]).all()
    # decoder output is tanh-bounded
    assert np.abs(res.target[0]).max() <= 1.0


def test_highly_uneven_batch_lengths():
    model = make_model()
    batch = make_proc()(
        descriptions=["a", "b"],
        audios=[np.ones((1, 8), np.float32) * 0.1,
                np.ones((1, 160), np.float32) * 0.1],
    )
    res = model.separate(batch, rng=jax.random.PRNGKey(6))
    assert res.target[0].shape == (8,)
    assert res.target[1].shape == (160,)
    assert np.isfinite(res.target[0]).all()


def test_anchor_span_past_audio_end():
    model = make_model()
    # span extends far beyond the clip; alignment writes clip to valid frames
    batch = make_proc()(
        descriptions=["x"],
        audios=[np.ones((1, 40), np.float32) * 0.1],
        anchors=[[("+", 0.0, 999.0)]],
    )
    res = model.separate(batch, rng=jax.random.PRNGKey(7))
    assert np.isfinite(res.target[0]).all()


def test_tokenizer_edge_cases():
    tok = ByteFallbackTokenizer(256)
    ids, mask = tok(["", "hello", "é" * 600], max_length=16)
    assert ids.shape[0] == 3
    assert ids.shape[1] <= 16
    assert mask[0].sum() == 1  # just EOS
    assert (ids >= 0).all() and (ids < 256).all()
