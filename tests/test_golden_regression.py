"""Golden regression fixtures: frozen outputs of the tiny model under fixed
params + fixed noise. Catches unintended numerical drift from future
refactors (kernel swaps, layout changes, dtype policy edits) — legitimate
changes must regenerate the fixture and say so in the commit:

    python tests/test_golden_regression.py --regenerate
"""

import os

import jax
import numpy as np

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import SAMAudio
from sam_audio_tpu.processor import SAMAudioProcessor
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_tiny_separate.npz")


def _compute():
    cfg = tiny_test_config()
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), cfg,
        tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size),
    )
    proc = SAMAudioProcessor(
        audio_hop_length=cfg.audio_codec.hop_length,
        audio_sampling_rate=cfg.audio_codec.sample_rate,
    )
    rng = np.random.RandomState(123)
    audios = [rng.randn(1, 64).astype(np.float32) * 0.1,
              rng.randn(1, 40).astype(np.float32) * 0.1]
    batch = proc(descriptions=["dog barking", "rain"], audios=audios)
    t_frames = batch.anchor_alignment.shape[-1]
    noise = rng.randn(2, t_frames, 2 * cfg.audio_codec.codebook_dim).astype(
        np.float32
    )
    res = model.separate(batch, noise=noise)
    return {
        "target0": np.asarray(res.target[0]),
        "target1": np.asarray(res.target[1]),
        "residual0": np.asarray(res.residual[0]),
    }


def test_golden_separate_outputs():
    assert os.path.exists(FIXTURE), (
        "fixture missing; run: python tests/test_golden_regression.py "
        "--regenerate"
    )
    got = _compute()
    with np.load(FIXTURE) as ref:
        for key in ("target0", "target1", "residual0"):
            np.testing.assert_allclose(
                got[key], ref[key], rtol=1e-4, atol=1e-4,
                err_msg=f"{key} drifted from the golden fixture — if the "
                        "change is intentional, regenerate and document it",
            )


if __name__ == "__main__":
    import sys

    if "--regenerate" in sys.argv:
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez(FIXTURE, **_compute())
        print(f"wrote {FIXTURE}")
