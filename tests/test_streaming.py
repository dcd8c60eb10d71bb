import jax
import numpy as np

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import SAMAudio
from sam_audio_tpu.streaming import _crossfade_weights, separate_streaming
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

CFG = tiny_test_config()


def make_model():
    return SAMAudio.init_random(
        jax.random.PRNGKey(0), CFG,
        tokenizer=ByteFallbackTokenizer(CFG.text_encoder.vocab_size),
    )


def test_crossfade_weights_equal_power():
    w = _crossfade_weights(64, 16)
    # overlap-add of tail of one window and head of the next sums to 1 (power)
    combined = w[-16:] ** 2 + w[:16] ** 2
    np.testing.assert_allclose(combined, 1.0, atol=1e-6)
    assert (w[16:-16] == 1).all()


def test_streaming_matches_direct_for_short_audio():
    model = make_model()
    wav = np.random.RandomState(0).randn(64).astype(np.float32) * 0.1
    res = separate_streaming(model, "dog", wav, window_s=1.0, overlap_s=0.1,
                             rng=jax.random.PRNGKey(5))
    assert res.num_windows == 1
    assert res.target.shape == (64,)


def test_streaming_long_audio_shapes_and_continuity():
    model = make_model()
    sr = CFG.audio_codec.sample_rate  # 8000
    t = np.arange(4 * sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    res = separate_streaming(model, "tone", wav, window_s=1.0, overlap_s=0.25,
                             rng=jax.random.PRNGKey(6))
    assert res.num_windows > 2
    assert res.target.shape == wav.shape
    assert res.residual.shape == wav.shape
    assert np.isfinite(res.target).all()
    # no dead zones: overlap-add normalization covered every sample
    assert np.abs(res.target).max() > 0


def test_streaming_anchor_clipping():
    model = make_model()
    sr = CFG.audio_codec.sample_rate
    wav = np.random.RandomState(1).randn(2 * sr).astype(np.float32) * 0.1
    res = separate_streaming(
        model, "x", wav, window_s=1.0, overlap_s=0.25,
        anchors=[("+", 0.5, 1.5)], rng=jax.random.PRNGKey(7),
    )
    assert res.target.shape == wav.shape
    assert np.isfinite(res.target).all()


def test_streaming_deterministic():
    model = make_model()
    wav = np.random.RandomState(2).randn(12000).astype(np.float32) * 0.1
    r1 = separate_streaming(model, "a", wav, window_s=1.0, overlap_s=0.2,
                            rng=jax.random.PRNGKey(9))
    r2 = separate_streaming(model, "a", wav, window_s=1.0, overlap_s=0.2,
                            rng=jax.random.PRNGKey(9))
    np.testing.assert_array_equal(r1.target, r2.target)


def test_batched_windows_match_sequential():
    """batch_windows groups windows into one separate() call; noise is keyed
    by absolute window index so the output is grouping-invariant up to float
    reassociation in the batched matmuls (incl. the padded last group)."""
    model = make_model()
    wav = np.random.RandomState(3).randn(520).astype(np.float32) * 0.1
    kw = dict(window_s=0.02, overlap_s=0.004, rng=jax.random.PRNGKey(7))
    seq = separate_streaming(model, "dog", wav, **kw)
    assert seq.num_windows == 4  # bw=3 -> groups [3, 1(padded)]; bw=5 -> [4(padded)]
    for bw in (2, 3, 4, 5):
        got = separate_streaming(model, "dog", wav, batch_windows=bw, **kw)
        assert got.num_windows == seq.num_windows
        np.testing.assert_allclose(got.target, seq.target, atol=1e-5)
        np.testing.assert_allclose(got.residual, seq.residual, atol=1e-5)


def test_batched_windows_with_anchors_and_k():
    model = make_model()
    wav = np.random.RandomState(4).randn(400).astype(np.float32) * 0.1
    kw = dict(window_s=0.02, overlap_s=0.004, rng=jax.random.PRNGKey(8),
              anchors=[("+", 0.0, 0.03)], reranking_candidates=2)
    seq = separate_streaming(model, "dog", wav, **kw)
    got = separate_streaming(model, "dog", wav, batch_windows=3, **kw)
    np.testing.assert_allclose(got.target, seq.target, atol=1e-6)


def test_streaming_with_masked_video_windows():
    """Visual prompting composes with streaming: each window is conditioned
    on its own frame slice; strided PE encode passes through."""
    from sam_audio_tpu.models.pe_clip import PerceptionEncoder
    from sam_audio_tpu.processor import SAMAudioProcessor

    model = make_model()
    model.vision_encoder = PerceptionEncoder.init_random(
        jax.random.PRNGKey(1), CFG.vision_encoder
    )
    model.params["align_masked_video"]["gate"] = (
        model.params["align_masked_video"]["gate"] + 1.0
    )
    sr = CFG.audio_codec.sample_rate
    hop = CFG.audio_codec.hop_length
    rng = np.random.RandomState(0)
    wav = rng.randn(sr // 4).astype(np.float32) * 0.1  # 0.25 s, 2000 samples

    n_frames = -(-wav.shape[-1] // hop)  # 1 frame per latent frame
    video = rng.randint(0, 255, (n_frames, 3, 14, 14), np.uint8)
    mask = np.zeros_like(video)
    mask[:, :, :7] = 1
    p = SAMAudioProcessor(audio_hop_length=hop, audio_sampling_rate=sr)
    masked = p.mask_videos([video], [mask])[0]

    res_v = separate_streaming(
        model, "on-screen sound", wav, window_s=0.1, overlap_s=0.02,
        rng=jax.random.PRNGKey(5), masked_video=masked, visual_stride=2,
    )
    assert res_v.num_windows > 1
    assert res_v.target.shape == wav.shape
    assert np.isfinite(res_v.target).all()

    res_t = separate_streaming(
        model, "on-screen sound", wav, window_s=0.1, overlap_s=0.02,
        rng=jax.random.PRNGKey(5),
    )
    assert np.abs(res_v.target - res_t.target).max() > 1e-6


def test_streaming_masked_video_native_fps_mapping():
    """A video at a DIFFERENT frame rate than 1/latent-frame is nearest-
    mapped over the whole clip: with identical frames the output must equal
    the full-rate identical-frame run (mapping of a constant is constant),
    and low-fps input must not silently clamp to the final frames."""
    from sam_audio_tpu.models.pe_clip import PerceptionEncoder
    from sam_audio_tpu.processor import SAMAudioProcessor

    model = make_model()
    model.vision_encoder = PerceptionEncoder.init_random(
        jax.random.PRNGKey(1), CFG.vision_encoder
    )
    model.params["align_masked_video"]["gate"] = (
        model.params["align_masked_video"]["gate"] + 1.0
    )
    sr = CFG.audio_codec.sample_rate
    hop = CFG.audio_codec.hop_length
    rng = np.random.RandomState(0)
    wav = rng.randn(sr // 4).astype(np.float32) * 0.1
    total_f = -(-wav.shape[-1] // hop)

    frame = rng.randint(0, 255, (1, 3, 14, 14), np.uint8)
    p = SAMAudioProcessor(audio_hop_length=hop, audio_sampling_rate=sr)

    def run(n_frames):
        video = np.repeat(frame, n_frames, axis=0)
        mask = np.zeros_like(video)
        mask[:, :, :7] = 1
        masked = p.mask_videos([video], [mask])[0]
        return separate_streaming(
            model, "on-screen sound", wav, window_s=0.1, overlap_s=0.02,
            rng=jax.random.PRNGKey(5), masked_video=masked,
        )

    res_full = run(total_f)   # 1 frame per latent frame (reference rate)
    res_low = run(5)          # low-fps video spanning the same clip
    assert res_low.num_windows > 1
    np.testing.assert_allclose(res_low.target, res_full.target,
                               rtol=1e-5, atol=1e-6)


def test_separate_auto_dispatches_long_clips_to_streaming():
    """Clips beyond the RoPE direct bound route through streaming windows
    (one warmed program for any duration). The reference hard-fails past
    max_positions=10000 frames ~= 400 s (reference transformer.py:404-409);
    here the same separate() call completes."""
    from sam_audio_tpu.processor import SAMAudioProcessor

    model = make_model()
    sr = CFG.audio_codec.sample_rate
    hop = CFG.audio_codec.hop_length  # 8
    n = CFG.transformer.max_positions * hop * 4  # 4x the direct bound
    wav = np.random.RandomState(3).randn(n).astype(np.float32) * 0.1
    proc = SAMAudioProcessor(audio_hop_length=hop, audio_sampling_rate=sr)
    batch = proc(descriptions=["dog"], audios=[wav[None]])
    res = model.separate(batch, rng=jax.random.PRNGKey(11))
    assert res.target[0].shape == (n,)
    assert res.residual[0].shape == (n,)
    assert np.isfinite(res.target[0]).all()
    assert res.noise is None  # streamed: noise is drawn per window


def test_separate_max_direct_seconds_matches_streaming():
    """A lowered per-call limit routes even short clips through windows,
    and the result is exactly separate_streaming at the same window/rng."""
    from sam_audio_tpu.processor import SAMAudioProcessor

    model = make_model()
    sr = CFG.audio_codec.sample_rate
    hop = CFG.audio_codec.hop_length
    wav = np.random.RandomState(4).randn(2 * sr).astype(np.float32) * 0.1
    proc = SAMAudioProcessor(audio_hop_length=hop, audio_sampling_rate=sr)
    batch = proc(descriptions=["cat"], audios=[wav[None]])
    key = jax.random.PRNGKey(21)
    res = model.separate(batch, rng=key, max_direct_seconds=0.02)
    ref = separate_streaming(model, "cat", wav, window_s=0.02,
                             rng=jax.random.fold_in(key, 0))
    assert ref.num_windows > 1
    np.testing.assert_allclose(res.target[0], ref.target, rtol=1e-5,
                               atol=1e-6)


def test_separate_long_with_explicit_noise_stays_direct():
    model = make_model()
    from sam_audio_tpu.processor import SAMAudioProcessor

    sr = CFG.audio_codec.sample_rate
    hop = CFG.audio_codec.hop_length
    n = CFG.transformer.max_positions * hop * 2
    wav = np.random.RandomState(5).randn(n).astype(np.float32) * 0.1
    proc = SAMAudioProcessor(audio_hop_length=hop, audio_sampling_rate=sr)
    batch = proc(descriptions=["dog"], audios=[wav[None]])
    t_frames = batch.anchor_alignment.shape[-1]
    noise = np.asarray(jax.random.normal(
        jax.random.PRNGKey(9),
        (1, t_frames, 2 * CFG.audio_codec.codebook_dim), np.float32))
    res = model.separate(batch, noise=noise)
    assert res.noise is not None  # direct path keeps the injected noise
    assert res.target[0].shape == (n,)


def test_separate_long_forwards_batch_windows():
    """model.streaming_batch_windows reaches the auto-dispatch: long-clip
    serving can opt into the batched-window regime (measured 1.4-1.6x
    sustained throughput over bw=1, PARITY.md) without calling
    separate_streaming directly."""
    import sam_audio_tpu.streaming as streaming_mod
    from sam_audio_tpu.processor import SAMAudioProcessor

    model = make_model()
    model.streaming_batch_windows = 2
    seen = {}
    real = streaming_mod.separate_streaming

    def spy(m, d, w, **kw):
        seen.update(kw)
        return real(m, d, w, **kw)

    streaming_mod.separate_streaming = spy
    try:
        sr = CFG.audio_codec.sample_rate
        hop = CFG.audio_codec.hop_length
        n = CFG.transformer.max_positions * hop * 2
        proc = SAMAudioProcessor(audio_hop_length=hop,
                                 audio_sampling_rate=sr)
        batch = proc(descriptions=["dog"],
                     audios=[np.zeros((1, n), np.float32)])
        res = model.separate(batch, rng=jax.random.PRNGKey(2))
        assert res.target[0].shape == (n,)
    finally:
        streaming_mod.separate_streaming = real
    assert seen.get("batch_windows") == 2


def test_preview_nfe_validated_at_api_boundary():
    """Odd preview_nfe used to surface as an obscure ODE step-divisibility
    error from deep inside the solver; the API now rejects it up front."""
    import pytest

    from sam_audio_tpu.processor import SAMAudioProcessor

    model = make_model()
    sr = CFG.audio_codec.sample_rate
    hop = CFG.audio_codec.hop_length
    proc = SAMAudioProcessor(audio_hop_length=hop, audio_sampling_rate=sr)
    batch = proc(descriptions=["dog"],
                 audios=[np.zeros((1, 64), np.float32)])
    with pytest.raises(ValueError, match="preview_nfe must be an even"):
        model.separate(batch, reranking_candidates=2, preview_nfe=7)
    with pytest.raises(ValueError, match="preview_nfe must be an even"):
        model.separate(batch, preview_nfe=0)


def test_separate_long_predict_spans_raises():
    import pytest

    model = make_model()
    from sam_audio_tpu.models.span_predictor import SpanPredictor
    from sam_audio_tpu.processor import SAMAudioProcessor

    model.span_predictor = SpanPredictor.init_random(jax.random.PRNGKey(0))
    sr = CFG.audio_codec.sample_rate
    hop = CFG.audio_codec.hop_length
    n = CFG.transformer.max_positions * hop * 2
    proc = SAMAudioProcessor(audio_hop_length=hop, audio_sampling_rate=sr)
    batch = proc(descriptions=["dog"],
                 audios=[np.zeros((1, n), np.float32)])
    with pytest.raises(ValueError, match="max_direct_seconds"):
        model.separate(batch, predict_spans=True, rng=jax.random.PRNGKey(1))
