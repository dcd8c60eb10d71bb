"""Visual prompting end-to-end: masked video -> PE vision tower ->
AlignModalities fusion -> separate -> ImageBind visual reranking."""

import jax
import numpy as np

from sam_audio_tpu.config import ImageBindRankerConfig, tiny_test_config
from sam_audio_tpu.models.imagebind import ImageBindConfig, ImageBindModel
from sam_audio_tpu.models.pe_clip import PerceptionEncoder
from sam_audio_tpu.models.sam_audio import SAMAudio
from sam_audio_tpu.processor import SAMAudioProcessor
from sam_audio_tpu.ranking.imagebind import ImageBindRanker
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

CFG = tiny_test_config()


def make_model():
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), CFG,
        tokenizer=ByteFallbackTokenizer(CFG.text_encoder.vocab_size),
    )
    model.vision_encoder = PerceptionEncoder.init_random(
        jax.random.PRNGKey(1), CFG.vision_encoder
    )
    return model


def make_batch(k_videos=1):
    p = SAMAudioProcessor(
        audio_hop_length=CFG.audio_codec.hop_length,
        audio_sampling_rate=CFG.audio_codec.sample_rate,
    )
    rng = np.random.RandomState(0)
    audios = [rng.randn(1, 64).astype(np.float32) * 0.1]
    video = rng.randint(0, 255, (6, 3, 14, 14), np.uint8)
    mask = np.zeros_like(video)
    mask[:, :, :7] = 1
    masked = p.mask_videos([video], [mask])
    return p(descriptions=["on-screen sound"], audios=audios,
             masked_videos=masked)


def test_visual_prompt_changes_output():
    model = make_model()
    # make the video gate nonzero so visual conditioning contributes
    model.params["align_masked_video"]["gate"] = (
        model.params["align_masked_video"]["gate"] + 1.0
    )
    batch_v = make_batch()
    noise = np.zeros((1, batch_v.anchor_alignment.shape[-1],
                      2 * CFG.audio_codec.codebook_dim), np.float32)
    res_v = model.separate(batch_v, noise=noise)

    p = SAMAudioProcessor(
        audio_hop_length=CFG.audio_codec.hop_length,
        audio_sampling_rate=CFG.audio_codec.sample_rate,
    )
    rng = np.random.RandomState(0)
    batch_t = p(descriptions=["on-screen sound"],
                audios=[rng.randn(1, 64).astype(np.float32) * 0.1])
    res_t = model.separate(batch_t, noise=noise)
    assert np.abs(res_v.target[0] - res_t.target[0]).max() > 1e-6
    assert np.isfinite(res_v.target[0]).all()


def test_visual_reranking_path():
    model = make_model()
    tiny_ib = ImageBindConfig(
        sample_rate=8000, clip_duration_s=0.25, num_audio_clips=2, n_mels=32,
        target_frames=16, n_fft=128, hop_length=64, audio_patch=8,
        audio_hidden=16, audio_layers=1, audio_heads=2, image_size=32,
        image_patch=16, num_video_clips=2, vision_hidden=16, vision_layers=1,
        vision_heads=2, embed_dim=8,
    )
    model.visual_ranker = ImageBindRanker(
        ImageBindRankerConfig(),
        model=ImageBindModel.init_random(jax.random.PRNGKey(2), tiny_ib),
    )
    batch = make_batch()
    res = model.separate(batch, reranking_candidates=2,
                         rng=jax.random.PRNGKey(3))
    assert res.target[0].shape == (64,)
    assert np.isfinite(res.target[0]).all()


def test_separate_uses_on_device_imagebind_path():
    """separate() with an ImageBind visual ranker and unpadded equal-length
    candidates must score on device and pick the same winner as the host
    path."""
    model = make_model()
    tiny_ib = ImageBindConfig(
        sample_rate=8000, clip_duration_s=0.25, num_audio_clips=2, n_mels=32,
        target_frames=16, n_fft=128, hop_length=64, audio_patch=8,
        audio_hidden=16, audio_layers=1, audio_heads=2, image_size=32,
        image_patch=16, num_video_clips=2, vision_hidden=16, vision_layers=1,
        vision_heads=2, embed_dim=8,
    )
    ib_model = ImageBindModel.init_random(jax.random.PRNGKey(2), tiny_ib)
    ranker = ImageBindRanker(ImageBindRankerConfig(), model=ib_model)
    model.visual_ranker = ranker

    p = SAMAudioProcessor(
        audio_hop_length=CFG.audio_codec.hop_length,
        audio_sampling_rate=CFG.audio_codec.sample_rate,
    )
    rng = np.random.RandomState(0)
    # long enough for real mel content (>= one 25 ms kaldi window after the
    # device path's 8 kHz resample), hop-aligned so sizes == padded length
    audios = [rng.randn(1, 2048).astype(np.float32) * 0.1]
    video = rng.randint(0, 255, (6, 3, 14, 14), np.uint8)
    mask = np.zeros_like(video)
    mask[:, :, :7] = 1
    batch = p(descriptions=["on-screen sound"], audios=audios,
              masked_videos=p.mask_videos([video], [mask]))
    t = batch.anchor_alignment.shape[-1]
    k = 2
    noise = rng.randn(k, t, 2 * CFG.audio_codec.codebook_dim).astype(
        np.float32)

    calls = {"device": 0}
    orig = ranker.score_on_device

    def spy(*a, **kw):
        calls["device"] += 1
        return orig(*a, **kw)

    ranker.score_on_device = spy
    res_dev = model.separate(batch, noise=noise, reranking_candidates=k)
    assert calls["device"] == 1

    ranker2 = ImageBindRanker(ImageBindRankerConfig(), model=ib_model)
    ranker2.supports_on_device = lambda *a, **kw: False
    model.visual_ranker = ranker2
    res_host = model.separate(batch, noise=noise, reranking_candidates=k)
    np.testing.assert_allclose(np.asarray(res_dev.target[0]),
                               np.asarray(res_host.target[0]),
                               rtol=1e-5, atol=1e-6)


def test_interp_strided_features_exact_on_linear_ramp():
    from sam_audio_tpu.models.pe_clip import interp_strided_features

    # features that are linear in the frame index are reproduced exactly
    n, stride, d = 11, 3, 4
    idx_s = np.arange(0, n, stride, dtype=np.float32)  # encoded positions
    feats_s = np.outer(idx_s, np.arange(1, d + 1, dtype=np.float32))
    out = np.asarray(interp_strided_features(jax.numpy.asarray(feats_s),
                                             n, stride))
    # positions past the last encoded frame clamp to it
    full = np.outer(np.minimum(np.arange(n), idx_s[-1]).astype(np.float32),
                    np.arange(1, d + 1, dtype=np.float32))
    np.testing.assert_allclose(out, full, rtol=1e-6, atol=1e-6)
    # constant features stay constant
    const = np.ones((len(idx_s), d), np.float32) * 7.0
    out_c = np.asarray(interp_strided_features(jax.numpy.asarray(const),
                                               n, stride))
    np.testing.assert_allclose(out_c, np.ones((n, d), np.float32) * 7.0)


def test_visual_stride_static_video_matches_full_encode():
    """A static video (identical frames) must give IDENTICAL conditioning
    features under any stride — lerp between equal features is a no-op —
    so separate(visual_stride=N) equals the default exactly."""
    model = make_model()
    model.params["align_masked_video"]["gate"] = (
        model.params["align_masked_video"]["gate"] + 1.0
    )
    p = SAMAudioProcessor(
        audio_hop_length=CFG.audio_codec.hop_length,
        audio_sampling_rate=CFG.audio_codec.sample_rate,
    )
    rng = np.random.RandomState(0)
    audios = [rng.randn(1, 64).astype(np.float32) * 0.1]
    frame = rng.randint(0, 255, (1, 3, 14, 14), np.uint8)
    video = np.repeat(frame, 6, axis=0)
    mask = np.zeros_like(video)
    mask[:, :, :7] = 1

    def batch():
        return p(descriptions=["on-screen sound"], audios=audios,
                 masked_videos=p.mask_videos([video], [mask]))

    noise = np.zeros((1, batch().anchor_alignment.shape[-1],
                      2 * CFG.audio_codec.codebook_dim), np.float32)
    res_full = model.separate(batch(), noise=noise)
    res_s2 = model.separate(batch(), noise=noise, visual_stride=2)
    res_s4 = model.separate(batch(), noise=noise, visual_stride=4)
    np.testing.assert_allclose(res_s2.target[0], res_full.target[0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(res_s4.target[0], res_full.target[0],
                               rtol=1e-5, atol=1e-6)


def test_visual_stride_moving_video_runs_and_conditions():
    model = make_model()
    model.params["align_masked_video"]["gate"] = (
        model.params["align_masked_video"]["gate"] + 1.0
    )
    batch = make_batch()
    noise = np.zeros((1, batch.anchor_alignment.shape[-1],
                      2 * CFG.audio_codec.codebook_dim), np.float32)
    res = model.separate(batch, noise=noise, visual_stride=3)
    assert np.isfinite(res.target[0]).all()
    # still visually conditioned: differs from the text-only path
    p = SAMAudioProcessor(
        audio_hop_length=CFG.audio_codec.hop_length,
        audio_sampling_rate=CFG.audio_codec.sample_rate,
    )
    rng = np.random.RandomState(0)
    batch_t = p(descriptions=["on-screen sound"],
                audios=[rng.randn(1, 64).astype(np.float32) * 0.1])
    res_t = model.separate(batch_t, noise=noise)
    assert np.abs(res.target[0] - res_t.target[0]).max() > 1e-6


def test_visual_stride_smooth_video_feature_error_bounded():
    """Mechanism gate for visual_stride: on a temporally smooth video,
    interpolated strided features approximate the full per-frame encode.
    Deterministic (fixed seeds); measured rel-L2 at stride 2 ~ a few
    percent on the tiny random tower."""
    from sam_audio_tpu.models.pe_clip import PerceptionEncoder

    enc = PerceptionEncoder.init_random(jax.random.PRNGKey(1),
                                        CFG.vision_encoder)
    rng = np.random.RandomState(0)
    s = CFG.vision_encoder.image_size
    # smooth video: lerp between two keyframes over 12 frames
    a = rng.rand(3, s, s).astype(np.float32)
    b = rng.rand(3, s, s).astype(np.float32)
    ts = np.linspace(0.0, 1.0, 12, dtype=np.float32)[:, None, None, None]
    video = ((1 - ts) * a + ts * b) * 255.0

    model = make_model()
    model.vision_encoder = enc
    full = np.asarray(model._encode_videos([video], 12))
    s2 = np.asarray(model._encode_videos([video], 12, stride=2))
    rel = np.linalg.norm(s2 - full) / (np.linalg.norm(full) + 1e-9)
    assert rel < 0.25, rel
    # stride 1 is the identity path
    s1 = np.asarray(model._encode_videos([video], 12, stride=1))
    np.testing.assert_allclose(s1, full)
