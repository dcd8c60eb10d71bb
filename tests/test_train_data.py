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


def test_text_bucketing_pins_width_and_preserves_loss():
    """Real-data batches vary in tokenized text length; bucketing the width
    to multiples of text_bucket bounds the number of compiled train-step
    programs. Padded positions carry mask=False, so the loss is unchanged
    (the T5 self-attention and the DiT cross-attention both honor the
    mask)."""
    from sam_audio_tpu.train.data import pad_text_to_bucket
    from sam_audio_tpu.train.flow_matching import flow_matching_loss

    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    tok = ByteFallbackTokenizer(CFG.text_encoder.vocab_size)
    exs = make_examples()
    exs[1].description = "a much longer description of the sound"

    tight = FlowMatchingDataPipeline(CFG, params, tok, bucket_seconds=0.0,
                                     text_bucket=1)
    bucketed = FlowMatchingDataPipeline(CFG, params, tok, bucket_seconds=0.0,
                                        text_bucket=16)
    b_tight = tight.make_batch(exs)
    b_buck = bucketed.make_batch(exs)
    lt = int(b_tight["text_features"].shape[1])
    lb = int(b_buck["text_features"].shape[1])
    assert lb % 16 == 0 and lb >= lt
    # masked-pad invariance end to end through the loss
    l1 = float(flow_matching_loss(params, CFG, b_tight,
                                  jax.random.PRNGKey(7)))
    l2 = float(flow_matching_loss(params, CFG, b_buck,
                                  jax.random.PRNGKey(7)))
    np.testing.assert_allclose(l1, l2, rtol=2e-5)
    # the helper itself: width rounds up, mask marks only real tokens
    ids, mask = tok(["ab", "abcdef"], max_length=64)
    pids, pmask = pad_text_to_bucket(ids, mask, 16)
    assert pids.shape[1] == 16
    assert np.asarray(pmask)[:, np.asarray(ids).shape[1]:].sum() == 0


def test_anchor_width_pinned_across_batches():
    """anchor_ids width must not vary batch-to-batch (each distinct width
    is a fresh train-step compile): the pipeline pins it to pad_anchors_to
    for typical anchor counts."""
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    tok = ByteFallbackTokenizer(CFG.text_encoder.vocab_size)
    pipe = FlowMatchingDataPipeline(CFG, params, tok, bucket_seconds=0.0)
    one = pipe.make_batch(make_examples())          # one anchored example
    exs = make_examples()
    exs[0].anchors = [("+", 0.0, 0.004), ("-", 0.004, 0.008)]
    two = pipe.make_batch(exs)                      # two anchors
    assert one["anchor_ids"].shape[1] == two["anchor_ids"].shape[1]
