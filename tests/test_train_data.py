"""Training pipeline end to end: waveform triples -> featurized batch ->
flow-matching steps reduce the loss."""

import jax
import numpy as np

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import sam_audio_init
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer
from sam_audio_tpu.train.data import FlowMatchingDataPipeline, TrainExample
from sam_audio_tpu.train.flow_matching import Trainer

CFG = tiny_test_config()


def make_examples(n=3, t=64, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        target = rng.randn(t).astype(np.float32) * 0.2
        residual = rng.randn(t).astype(np.float32) * 0.2
        out.append(TrainExample(
            mixture=target + residual,
            target=target,
            residual=residual,
            description=f"sound {i}",
            anchors=[("+", 0.0, 0.004)] if i == 0 else None,
        ))
    return out


def test_pipeline_shapes():
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    pipe = FlowMatchingDataPipeline(
        CFG, params, ByteFallbackTokenizer(CFG.text_encoder.vocab_size),
        bucket_seconds=0.0,
    )
    batch = pipe.make_batch(make_examples())
    b = 3
    t_frames = 64 // CFG.audio_codec.hop_length
    c2 = 2 * CFG.audio_codec.codebook_dim
    assert batch["audio_features"].shape == (b, t_frames, c2)
    assert batch["target_latents"].shape == (b, t_frames, c2)
    assert batch["audio_pad_mask"].shape == (b, t_frames)
    assert batch["anchor_alignment"].shape == (b, t_frames)
    assert np.isfinite(np.asarray(batch["target_latents"])).all()
    # target latents: first half from target stem, second from residual stem
    assert not np.allclose(
        np.asarray(batch["target_latents"])[..., : c2 // 2],
        np.asarray(batch["target_latents"])[..., c2 // 2:],
    )


def test_training_on_pipeline_batches_reduces_loss():
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    pipe = FlowMatchingDataPipeline(
        CFG, params, ByteFallbackTokenizer(CFG.text_encoder.vocab_size),
        bucket_seconds=0.0,
    )
    batch = pipe.make_batch(make_examples())
    trainer = Trainer(CFG, params, learning_rate=3e-3)
    losses = [float(trainer.step(batch, jax.random.PRNGKey(5))["loss"])
              for _ in range(10)]
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
