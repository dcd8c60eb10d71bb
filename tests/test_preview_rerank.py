"""Preview-NFE reranking: rank on cheap solves, full-quality solve for the
winner only. The returned audio must equal a direct k=1 full solve of the
selected noise."""

import jax
import numpy as np

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import SAMAudio
from sam_audio_tpu.processor import SAMAudioProcessor
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

CFG = tiny_test_config()


class PickSecond:
    def __call__(self, extracted_audio, **kw):
        k = extracted_audio[0].shape[0]
        scores = np.zeros((len(extracted_audio), k), np.float32)
        scores[:, 1] = 1.0
        return scores


def test_preview_rerank_matches_full_solve_of_winner():
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), CFG,
        tokenizer=ByteFallbackTokenizer(CFG.text_encoder.vocab_size),
    )
    model.text_ranker = PickSecond()
    p = SAMAudioProcessor(
        audio_hop_length=CFG.audio_codec.hop_length,
        audio_sampling_rate=CFG.audio_codec.sample_rate,
    )
    rng = np.random.RandomState(0)
    audios = [rng.randn(1, 64).astype(np.float32) * 0.1]
    batch = p(descriptions=["x"], audios=audios)
    t = batch.anchor_alignment.shape[-1]
    k = 3
    noise = rng.randn(k, t, 2 * CFG.audio_codec.codebook_dim).astype(np.float32)

    fast = model.separate(batch, noise=noise, reranking_candidates=k,
                          preview_nfe=4)

    # direct k=1 full solve of the winning (index 1) noise
    batch2 = p(descriptions=["x"], audios=audios)
    direct = model.separate(batch2, noise=noise[1:2], reranking_candidates=1)

    np.testing.assert_allclose(fast.target[0], direct.target[0],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(fast.residual[0], direct.residual[0],
                               rtol=1e-4, atol=1e-5)


def test_preview_rerank_ignored_without_ranker():
    model = SAMAudio.init_random(
        jax.random.PRNGKey(1), CFG,
        tokenizer=ByteFallbackTokenizer(CFG.text_encoder.vocab_size),
    )
    p = SAMAudioProcessor(
        audio_hop_length=CFG.audio_codec.hop_length,
        audio_sampling_rate=CFG.audio_codec.sample_rate,
    )
    batch = p(descriptions=["x"], audios=[np.ones((1, 40), np.float32) * 0.1])
    res = model.separate(batch, reranking_candidates=2, preview_nfe=4,
                         rng=jax.random.PRNGKey(2))
    assert np.isfinite(res.target[0]).all()
