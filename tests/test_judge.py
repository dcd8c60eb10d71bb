import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import (
    DACVAEConfig,
    JudgeRankerConfig,
    ModernBertTextConfig,
    PEAVTransformerConfig,
    SAMAudioJudgeConfig,
)
from sam_audio_tpu.models.judge import (
    SAMAudioJudgeModel,
    judge_forward,
    judge_forward_grouped,
    judge_init,
)
from sam_audio_tpu.processor import SAMAudioJudgeProcessor
from sam_audio_tpu.ranking.judge import JudgeRanker
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

CFG = SAMAudioJudgeConfig(
    audio_codec=DACVAEConfig(
        encoder_dim=4, encoder_rates=(2, 4), latent_dim=16, decoder_dim=16,
        decoder_rates=(4, 2), codebook_dim=4, sample_rate=8000,
    ),
    transformer=PEAVTransformerConfig(hidden_size=16, num_layers=2, num_heads=2),
    finetune_transformer=PEAVTransformerConfig(hidden_size=12, num_layers=1,
                                               num_heads=2),
    text_model=ModernBertTextConfig(
        vocab_size=300, hidden_size=16, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=24,
        global_attn_every_n_layers=3, local_attention=8,
    ),
    nth_text_layer=2,
    bottleneck_dim=8,
    compute_dtype="float32",
)


def test_judge_forward_shapes():
    params = judge_init(jax.random.PRNGKey(0), CFG)
    b, tw, l = 2, 64, 6
    rng = np.random.RandomState(0)
    out = judge_forward(
        params, CFG,
        input_ids=jnp.asarray(rng.randint(3, 300, (b, l)).astype(np.int32)),
        input_values=jnp.asarray(rng.randn(b, 1, tw).astype(np.float32)),
        separated_values=jnp.asarray(rng.randn(b, 1, tw).astype(np.float32)),
        padding_mask=jnp.ones((b, tw), bool),
    )
    for field in (out.overall, out.recall, out.precision, out.faithfulness):
        assert field.shape == (b, 1)
        assert np.isfinite(np.asarray(field)).all()


def test_judge_denormalization():
    params = judge_init(jax.random.PRNGKey(0), CFG)
    params["mean"] = jnp.asarray([10.0, 20.0, 30.0, 40.0])
    params["std"] = jnp.asarray([0.0, 0.0, 0.0, 0.0])  # zero std -> constant
    rng = np.random.RandomState(1)
    out = judge_forward(
        params, CFG,
        input_ids=jnp.asarray(rng.randint(3, 300, (1, 4)).astype(np.int32)),
        input_values=jnp.asarray(rng.randn(1, 1, 32).astype(np.float32)),
        separated_values=jnp.asarray(rng.randn(1, 1, 32).astype(np.float32)),
    )
    np.testing.assert_allclose(np.asarray(out.overall), [[10.0]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.faithfulness), [[40.0]], atol=1e-5)


def test_judge_forward_grouped_matches_flat():
    """judge_forward_grouped (mixture-side towers once per item, features
    repeated k* on device) must equal judge_forward on the k-repeated flat
    pair batch — the serving dedup is exact parity, incl. padding masks."""
    params = judge_init(jax.random.PRNGKey(0), CFG)
    hop = CFG.audio_codec.hop_length
    rng = np.random.RandomState(3)
    b, k, l = 2, 3, 5
    t_pad = 6 * hop
    sizes = [4 * hop, 6 * hop]
    ids = rng.randint(3, 300, (b, l)).astype(np.int32)
    mix = np.zeros((b, 1, t_pad), np.float32)
    sep = np.zeros((b * k, 1, t_pad), np.float32)
    for i in range(b):
        mix[i, 0, : sizes[i]] = rng.randn(sizes[i]) * 0.1
        for j in range(k):
            sep[i * k + j, 0, : sizes[i]] = rng.randn(sizes[i]) * 0.1
    pad_mask = np.arange(t_pad)[None, :] < np.asarray(sizes)[:, None]

    grouped = judge_forward_grouped(
        params, CFG, input_ids=jnp.asarray(ids), input_values=jnp.asarray(mix),
        separated_values=jnp.asarray(sep), padding_mask=jnp.asarray(pad_mask),
        k=k,
    )
    flat = judge_forward(
        params, CFG,
        input_ids=jnp.asarray(np.repeat(ids, k, axis=0)),
        input_values=jnp.asarray(np.repeat(mix, k, axis=0)),
        separated_values=jnp.asarray(sep),
        padding_mask=jnp.asarray(np.repeat(pad_mask, k, axis=0)),
    )
    for g, f in ((grouped.overall, flat.overall), (grouped.recall, flat.recall),
                 (grouped.precision, flat.precision),
                 (grouped.faithfulness, flat.faithfulness)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(f),
                                   rtol=1e-5, atol=1e-5)


def test_judge_ranker_scores_shape():
    model = SAMAudioJudgeModel.init_random(jax.random.PRNGKey(0), CFG)
    processor = SAMAudioJudgeProcessor(
        audio_hop_length=CFG.audio_codec.hop_length,
        audio_sampling_rate=CFG.audio_codec.sample_rate,
        tokenizer=ByteFallbackTokenizer(300),
    )
    ranker = JudgeRanker(JudgeRankerConfig(), model=model, processor=processor)
    rng = np.random.RandomState(0)
    b, k, t = 2, 3, 48
    extracted = [rng.randn(k, t).astype(np.float32) for _ in range(b)]
    mixtures = [rng.randn(k, t).astype(np.float32) for _ in range(b)]
    scores = ranker(
        extracted_audio=extracted, input_audio=mixtures,
        descriptions=["dog", "cat"], sample_rate=8000,
    )
    assert scores.shape == (b, k)
    assert np.isfinite(scores).all()


def test_judge_processor_reflect_pad():
    processor = SAMAudioJudgeProcessor(
        audio_hop_length=8, audio_sampling_rate=8000,
        tokenizer=ByteFallbackTokenizer(300),
    )
    out = processor._process_audio([np.ones((1, 13), np.float32)])
    # padded to next hop multiple (16)
    assert out["input_values"].shape == (1, 1, 16)
    assert out["padding_mask"].shape == (1, 16)


def test_judge_score_on_device_matches_host_path():
    """The on-device judge scoring fast path (used by separate()) must match
    the host processor+forward path when true lengths are hop multiples
    (reflect-pad no-op)."""
    model = SAMAudioJudgeModel.init_random(jax.random.PRNGKey(0), CFG)
    processor = SAMAudioJudgeProcessor(
        audio_hop_length=CFG.audio_codec.hop_length,
        audio_sampling_rate=CFG.audio_codec.sample_rate,
        tokenizer=ByteFallbackTokenizer(300),
    )
    ranker = JudgeRanker(JudgeRankerConfig(), model=model, processor=processor)
    hop = CFG.audio_codec.hop_length
    rng = np.random.RandomState(0)
    b, k = 2, 3
    sizes = [4 * hop, 6 * hop]
    t_pad = 6 * hop
    tgt = np.zeros((b, k, t_pad), np.float32)
    mix = np.zeros((b, 1, t_pad), np.float32)
    for i in range(b):
        tgt[i, :, : sizes[i]] = rng.randn(k, sizes[i]) * 0.1
        mix[i, 0, : sizes[i]] = rng.randn(sizes[i]) * 0.1

    assert ranker.supports_on_device(sizes, CFG.audio_codec.sample_rate)
    assert not ranker.supports_on_device([hop + 1], CFG.audio_codec.sample_rate)

    dev = np.asarray(ranker.score_on_device(
        jnp.asarray(tgt), sizes, ["a", "b"], mixtures=jnp.asarray(mix)))

    # host path: per-item true-length slices through the judge processor
    host = ranker(
        extracted_audio=[tgt[i, :, : sizes[i]] for i in range(b)],
        input_audio=[np.broadcast_to(mix[i, 0, : sizes[i]],
                                     (k, sizes[i])) for i in range(b)],
        descriptions=["a", "b"],
        sample_rate=CFG.audio_codec.sample_rate,
    )
    assert dev.shape == (b, k)
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-4)


def test_quantized_judge_close_to_fp():
    """int8 judge scorer (quantize()): scores stay strongly correlated with
    the fp forward on the tiny model."""
    model = SAMAudioJudgeModel.init_random(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(0)
    b, tw, l = 3, 64, 6
    kwargs = dict(
        input_ids=jnp.asarray(rng.randint(3, 300, (b, l)).astype(np.int32)),
        input_values=jnp.asarray(rng.randn(b, 1, tw).astype(np.float32) * 0.1),
        separated_values=jnp.asarray(
            rng.randn(b, 1, tw).astype(np.float32) * 0.1),
        padding_mask=jnp.ones((b, tw), bool),
    )
    ref = np.asarray(model(**kwargs).overall)
    model.quantize()
    q = model.params["transformer"]["layers"]["attn"]["wq"]
    assert "w8" in q and q["w8"].shape[0] == CFG.transformer.num_layers
    assert "w8" in model.params["text_model"]["layers"][0]["attn"]["Wqkv"]
    out = np.asarray(model(**kwargs).overall)
    assert np.isfinite(out).all()
    denom = np.abs(ref).mean() + 1e-6
    assert np.abs(out - ref).mean() / denom < 0.2, (out, ref)


def test_judge_processor_accepts_bare_arrays():
    """A bare numpy array is ONE clip (the reference has a dedicated
    non-list branch): 1-D input used to crash iterating 0-d scalars, and a
    (C, T) array was silently mis-batched as C mono items."""
    proc = SAMAudioJudgeProcessor(
        audio_hop_length=8, audio_sampling_rate=8000,
        tokenizer=ByteFallbackTokenizer(300),
    )
    mono = np.random.RandomState(0).randn(160).astype(np.float32) * 0.1
    out = proc(input_audio=mono, sampling_rate=proc.audio_sampling_rate)
    assert out["input_values"].shape[0] == 1  # one batch item
    stereo = np.random.RandomState(1).randn(2, 160).astype(np.float32) * 0.1
    out2 = proc(input_audio=stereo, sampling_rate=proc.audio_sampling_rate)
    assert out2["input_values"].shape[0] == 1  # one clip, not two items
    listed = proc(input_audio=[mono], sampling_rate=proc.audio_sampling_rate)
    np.testing.assert_array_equal(out["input_values"],
                                  listed["input_values"])
