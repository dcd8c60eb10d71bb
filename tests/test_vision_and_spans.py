import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import PerceptionEncoderConfig, tiny_test_config
from sam_audio_tpu.models.pe_clip import (
    PerceptionEncoder,
    encode_images,
    pe_clip_init,
    preprocess_frames,
)
from sam_audio_tpu.models.span_predictor import (
    SpanPredictor,
    SpanPredictorConfig,
    frames_to_spans,
    span_predictor_forward,
    span_predictor_init,
)

VCFG = PerceptionEncoderConfig(
    dim=12, width=16, vit_layers=2, vit_heads=2, image_size=28, patch_size=14,
    batch_size=4,
)


def test_preprocess_resizes_and_normalizes():
    frames = np.full((3, 3, 14, 14), 255, np.uint8)
    out = np.asarray(preprocess_frames(jnp.asarray(frames), VCFG))
    assert out.shape == (3, 3, 28, 28)
    np.testing.assert_allclose(out, 1.0, atol=1e-5)  # (255/255 - .5)/.5 = 1


def test_encode_images_normalized():
    params = pe_clip_init(jax.random.PRNGKey(0), VCFG)
    x = jnp.asarray(np.random.RandomState(0).rand(5, 3, 28, 28).astype(np.float32))
    out = np.asarray(encode_images(params, x, VCFG))
    assert out.shape == (5, VCFG.dim)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-4)


def test_rope2d_tables_and_encode():
    from sam_audio_tpu.ops.rope import apply_rope, precompute_rope_2d

    hd = 8  # head dim: 4 x-pairs? no — d_half=4 angles/token (2 x + 2 y)
    cos, sin = precompute_rope_2d(hd, grid=2, n_prefix_tokens=1)
    assert cos.shape == (5, 4) and sin.shape == (5, 4)
    # prefix (CLS) token: identity rotation
    np.testing.assert_allclose(np.asarray(cos[0]), 1.0)
    np.testing.assert_allclose(np.asarray(sin[0]), 0.0)
    # token (y=0,x=0) also rotates by 0; (y=1,x=1) has max angles
    np.testing.assert_allclose(np.asarray(sin[1]), 0.0, atol=1e-12)
    assert np.any(np.asarray(sin[4]) != 0.0)
    # rotation preserves norms
    x = jnp.asarray(np.random.RandomState(0).randn(1, 5, 2, hd), jnp.float32)
    y = apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)
    # axial structure: tokens sharing an x coordinate share the x half of the
    # angle ladder. grid order is row-major (y, x): tokens 1..4 = (0,0),(0,1),
    # (1,0),(1,1); token 2=(0,1) and 4=(1,1) share x=1.
    d4 = hd // 4
    np.testing.assert_allclose(np.asarray(cos[2, :d4]), np.asarray(cos[4, :d4]))

    # the config switch changes outputs but keeps them normalized
    cfg2 = PerceptionEncoderConfig(**{**VCFG.__dict__, "use_rope2d": True})
    params = pe_clip_init(jax.random.PRNGKey(0), VCFG)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 28, 28).astype(np.float32))
    base = np.asarray(encode_images(params, x, VCFG))
    roped = np.asarray(encode_images(params, x, cfg2))
    np.testing.assert_allclose(np.linalg.norm(roped, axis=-1), 1.0, rtol=1e-4)
    assert np.abs(base - roped).max() > 1e-4


def test_perception_encoder_chunking_and_padding():
    enc = PerceptionEncoder.init_random(jax.random.PRNGKey(0), VCFG)
    videos = [
        np.random.RandomState(1).randint(0, 255, (6, 3, 14, 14), np.uint8),
        np.random.RandomState(2).randint(0, 255, (3, 3, 14, 14), np.uint8),
    ]
    out = np.asarray(enc(videos))  # chunked: 6 > batch_size=4
    assert out.shape == (2, 6, VCFG.dim)
    # second video padded with zeros past frame 3
    assert np.abs(out[1, 3:]).max() == 0.0
    # chunking must not change results
    enc_big = PerceptionEncoder(
        PerceptionEncoderConfig(**{**VCFG.__dict__, "batch_size": 100}),
        enc.params,
    )
    out2 = np.asarray(enc_big(videos))
    np.testing.assert_allclose(out, out2, rtol=1e-4, atol=1e-5)


def test_span_predictor_shapes():
    cfg = SpanPredictorConfig(audio_dim=8, text_dim=16, hidden=16, n_layers=2,
                              n_heads=2)
    params = span_predictor_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    logits = span_predictor_forward(
        params, cfg,
        jnp.asarray(rng.randn(2, 10, 8).astype(np.float32)),
        jnp.ones((2, 10), bool),
        jnp.asarray(rng.randn(2, 5, 16).astype(np.float32)),
        jnp.ones((2, 5), bool),
    )
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_frames_to_spans():
    probs = np.array([
        [0.9, 0.9, 0.1, 0.1, 0.8, 0.8, 0.8, 0.1],
        [0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1],
    ])
    mask = np.ones((2, 8), bool)
    spans = frames_to_spans(probs, mask, threshold=0.5, min_duration_s=0.05,
                            frame_rate=10.0)
    assert spans[0] == [(0.0, 0.2), (0.4, 0.7)]
    assert spans[1] == []
    # min duration filters the first (2-frame) span at a 3-frame minimum
    spans2 = frames_to_spans(probs, mask, threshold=0.5, min_duration_s=0.3,
                             frame_rate=10.0)
    assert spans2[0] == [(0.4, 0.7)]


def test_separate_with_predict_spans_end_to_end():
    from sam_audio_tpu.models.sam_audio import SAMAudio
    from sam_audio_tpu.processor import SAMAudioProcessor
    from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

    cfg = tiny_test_config()
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), cfg,
        tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size),
    )
    sp_cfg = SpanPredictorConfig(
        audio_dim=2 * cfg.audio_codec.codebook_dim,
        text_dim=cfg.text_encoder.dim, hidden=16, n_layers=1, n_heads=2,
        threshold=0.0,  # predict everything as active -> spans exist
    )
    model.span_predictor = SpanPredictor.init_random(jax.random.PRNGKey(1),
                                                     sp_cfg)
    # span predictor slices the first audio_dim latent channels; our tiny
    # codec gives 2*codebook_dim channels after stacking = 8
    sp_cfg2 = sp_cfg.__class__(**{**sp_cfg.__dict__,
                                  "audio_dim": cfg.audio_codec.codebook_dim})
    model.span_predictor = SpanPredictor(
        sp_cfg2, span_predictor_init(jax.random.PRNGKey(1), sp_cfg2)
    )
    p = SAMAudioProcessor(
        audio_hop_length=cfg.audio_codec.hop_length,
        audio_sampling_rate=cfg.audio_codec.sample_rate,
    )
    batch = p(descriptions=["dog"],
              audios=[np.random.RandomState(0).randn(1, 64).astype(np.float32)])
    res = model.separate(batch, predict_spans=True, rng=jax.random.PRNGKey(2))
    assert res.target[0].shape == (64,)
    # spans were predicted and converted to "+" anchors
    assert batch.anchors is not None
    assert all(a[0][0] == "+" for a in batch.anchors if a)
