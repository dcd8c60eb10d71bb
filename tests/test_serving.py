import jax
import numpy as np

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import SAMAudio
from sam_audio_tpu.serving import SeparationPipeline, SeparationRequest
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer


def make_pipeline(**kw):
    cfg = tiny_test_config()
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), cfg,
        tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size),
    )
    return SeparationPipeline(model, bucket_seconds=0.01, **kw)


def test_pipeline_orders_and_buckets():
    pipe = make_pipeline(max_batch=2)
    rng = np.random.RandomState(0)
    lengths = [64, 200, 60, 210]
    reqs = [
        SeparationRequest(description=f"req{i}",
                          audio=rng.randn(1, n).astype(np.float32) * 0.1)
        for i, n in enumerate(lengths)
    ]
    out = pipe.run(reqs)
    assert len(out) == 4
    for resp, n in zip(out, lengths):
        # unpadded length = ceil(n/hop)*hop (hop=8 in tiny config)
        expected = -(-n // 8) * 8
        assert resp.target.shape == (expected,)
        assert np.isfinite(resp.target).all()
    # items 0 and 2 (similar lengths) shared a bucket
    assert out[0].metadata["bucket"] == out[2].metadata["bucket"]
    assert out[0].metadata["batch_size"] == 2


def test_pipeline_file_input(tmp_path):
    from sam_audio_tpu.audio_io import write_wav

    pipe = make_pipeline()
    wav = (0.3 * np.sin(np.linspace(0, 60, 400))).astype(np.float32)
    path = str(tmp_path / "in.wav")
    write_wav(path, wav, 8000)
    out = pipe.run([SeparationRequest(description="tone", audio=path)])
    assert out[0].target.shape == (400,)


def test_pipeline_empty():
    pipe = make_pipeline()
    assert pipe.run([]) == []


def test_pipeline_stage_timers_populated():
    pipe = make_pipeline()
    reqs = [SeparationRequest(description="x",
                              audio=np.zeros((1, 64), np.float32))]
    pipe.run(reqs)
    summary = pipe.timer.summary()
    assert {"host_decode", "preprocess", "separate"} <= set(summary)


def test_pipeline_visual_request_with_stride():
    from sam_audio_tpu.models.pe_clip import PerceptionEncoder
    from sam_audio_tpu.processor import SAMAudioProcessor

    cfg = tiny_test_config()
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), cfg,
        tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size),
    )
    model.vision_encoder = PerceptionEncoder.init_random(
        jax.random.PRNGKey(1), cfg.vision_encoder
    )
    pipe = SeparationPipeline(model, bucket_seconds=0.01, visual_stride=2)
    rng = np.random.RandomState(0)
    p = SAMAudioProcessor(
        audio_hop_length=cfg.audio_codec.hop_length,
        audio_sampling_rate=cfg.audio_codec.sample_rate,
    )
    video = rng.randint(0, 255, (6, 3, 14, 14), np.uint8)
    mask = np.zeros_like(video)
    mask[:, :, :7] = 1
    masked = p.mask_videos([video], [mask])[0]
    out = pipe.run([SeparationRequest(
        description="on-screen sound",
        audio=rng.randn(1, 64).astype(np.float32) * 0.1,
        masked_video=masked,
    )])
    assert out[0].target.shape == (64,)
    assert np.isfinite(out[0].target).all()


def test_mixed_anchor_and_video_requests_split_and_serve():
    """A planned group mixing anchored/anchor-less and video/non-video
    requests must serve ALL of them: None anchor rows used to crash
    process_anchors, and None video rows crashed load_video. Video and
    non-video requests dispatch as separate groups (visual conditioning is
    per-batch and a mixed batch would change everyone's compiled program)."""
    from sam_audio_tpu.models.pe_clip import PerceptionEncoder
    from sam_audio_tpu.processor import SAMAudioProcessor

    cfg = tiny_test_config()
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), cfg,
        tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size),
    )
    model.vision_encoder = PerceptionEncoder.init_random(
        jax.random.PRNGKey(1), cfg.vision_encoder
    )
    pipe = SeparationPipeline(model, bucket_seconds=0.01, max_batch=4)
    rng = np.random.RandomState(0)
    p = SAMAudioProcessor(
        audio_hop_length=cfg.audio_codec.hop_length,
        audio_sampling_rate=cfg.audio_codec.sample_rate,
    )
    video = rng.randint(0, 255, (6, 3, 14, 14), np.uint8)
    masked = p.mask_videos([video], [np.zeros_like(video)])[0]
    wav = rng.randn(1, 64).astype(np.float32) * 0.1
    out = pipe.run([
        SeparationRequest(description="anchored", audio=wav,
                          anchors=[("+", 0.0, 0.005)]),
        SeparationRequest(description="plain", audio=wav),
        SeparationRequest(description="visual", audio=wav,
                          masked_video=masked),
    ])
    assert len(out) == 3
    assert all(np.isfinite(r.target).all() for r in out)
    # same length bucket, but the visual request dispatched separately
    assert out[0].metadata["batch_size"] == 2
    assert out[1].metadata["batch_size"] == 2
    assert out[2].metadata["batch_size"] == 1


def test_group_pads_to_warmed_grid():
    """Dispatched groups pad up to the pow2 batch grid so intermediate
    sizes reuse warmed programs (mirrors server.py's pad_batch_sizes)."""
    pipe = make_pipeline(max_batch=4)
    rng = np.random.RandomState(0)
    reqs = [SeparationRequest(description=f"r{i}",
                              audio=rng.randn(1, 64).astype(np.float32) * 0.1)
            for i in range(3)]
    out = pipe.run(reqs)
    for r in out:
        assert r.metadata["batch_size"] == 3
        assert r.metadata["dispatch_size"] == 4
    # opt-out dispatches the true size
    pipe2 = make_pipeline(max_batch=4, pad_batch_sizes=False)
    out2 = pipe2.run(reqs)
    assert out2[0].metadata["dispatch_size"] == 3


def test_warmup_precompiles_buckets():
    pipe = make_pipeline(max_batch=2)
    unit = pipe.model.hop_length * pipe.bucket_steps
    # two durations mapping to distinct buckets; batch sizes clamp to
    # max_batch and dedupe
    sr = pipe.model.sample_rate
    warmed = pipe.warmup(seconds=[unit / sr, 3 * unit / sr],
                         batch_sizes=[1, 2, 5])
    assert warmed == [(unit, 1), (unit, 2), (3 * unit, 1), (3 * unit, 2)]
    # warmed shapes serve real traffic (same bucket/batch -> cached program)
    rng = np.random.RandomState(1)
    reqs = [
        SeparationRequest(description="a", audio=rng.randn(1, unit)
                          .astype(np.float32) * 0.1),
        SeparationRequest(description="b", audio=rng.randn(1, unit - 2)
                          .astype(np.float32) * 0.1),
    ]
    out = pipe.run(reqs)
    assert len(out) == 2
    assert all(np.isfinite(r.target).all() for r in out)
    assert out[0].metadata["bucket"] == unit
