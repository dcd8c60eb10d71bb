"""SAMAudio.shard(): one-liner multi-chip placement; separate() still works
and matches single-device output."""

import jax
import numpy as np

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import SAMAudio
from sam_audio_tpu.parallel.mesh import make_mesh
from sam_audio_tpu.processor import SAMAudioProcessor
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

CFG = tiny_test_config()


def test_shard_api_end_to_end():
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), CFG,
        tokenizer=ByteFallbackTokenizer(CFG.text_encoder.vocab_size),
    )
    p = SAMAudioProcessor(
        audio_hop_length=CFG.audio_codec.hop_length,
        audio_sampling_rate=CFG.audio_codec.sample_rate,
    )
    rng = np.random.RandomState(0)
    audios = [rng.randn(1, 64).astype(np.float32) * 0.1 for _ in range(2)]
    batch = p(descriptions=["a", "b"], audios=audios)
    noise = rng.randn(2, 8, 8).astype(np.float32)

    ref = model.separate(batch, noise=noise)

    model.shard(make_mesh(dp=2, tp=4))
    wq = model.params["transformer"]["layers"]["attention"]["wq"]["weight"]
    assert len({s.device for s in wq.addressable_shards}) == 8

    batch2 = p(descriptions=["a", "b"], audios=audios)
    out = model.separate(batch2, noise=noise)
    np.testing.assert_allclose(out.target[0], ref.target[0], rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(out.residual[1], ref.residual[1], rtol=1e-3,
                               atol=1e-4)
