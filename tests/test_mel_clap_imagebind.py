import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import ClapRankerConfig, ImageBindRankerConfig
from sam_audio_tpu.models.clap import (
    ClapConfig,
    ClapModel,
    fit_duration,
    quantize_roundtrip,
)
from sam_audio_tpu.models.imagebind import (
    ImageBindConfig,
    ImageBindModel,
    audio_to_melclips,
    video_to_clips,
)
from sam_audio_tpu.ops.mel import mel_filterbank, mel_spectrogram, stft_power
from sam_audio_tpu.ranking.clap import ClapRanker
from sam_audio_tpu.ranking.imagebind import ImageBindRanker

TINY_CLAP = ClapConfig(
    sample_rate=8000, duration_s=0.5, n_fft=256, hop_length=128, n_mels=16,
    fmin=10.0, fmax=4000.0, spec_size=64, patch_size=4, audio_embed_dim=8,
    depths=(1, 1), audio_heads=(2, 2), window_size=4, text_vocab=300,
    text_hidden=16, text_layers=1, text_heads=2, text_intermediate=24,
    max_text_len=16, embed_dim=8,
)
TINY_IB = ImageBindConfig(
    sample_rate=8000, clip_duration_s=0.25, num_audio_clips=2, n_mels=32,
    target_frames=16, n_fft=128, hop_length=64, audio_patch=8,
    audio_hidden=16, audio_layers=1, audio_heads=2, image_size=32,
    image_patch=16, num_video_clips=2, vision_hidden=16, vision_layers=1,
    vision_heads=2, embed_dim=8,
)


def test_stft_matches_numpy():
    x = np.random.RandomState(0).randn(1, 512).astype(np.float32)
    n_fft, hop = 128, 64
    ours = np.asarray(stft_power(jnp.asarray(x), n_fft, hop, center=False))
    window = np.hanning(n_fft + 1)[:-1]
    frames = np.stack([x[0, i * hop : i * hop + n_fft] * window
                       for i in range(1 + (512 - n_fft) // hop)])
    ref = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    np.testing.assert_allclose(ours[0], ref, rtol=1e-3, atol=1e-4)


def test_mel_filterbank_properties():
    fb = mel_filterbank(8000, 256, 16, 10.0, 4000.0)
    assert fb.shape == (129, 16)
    assert (fb >= 0).all()
    # every mel band has some support
    assert (fb.sum(0) > 0).all()


def test_mel_spectrogram_tone_peak():
    sr, n_fft, hop = 8000, 256, 128
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    mel = np.asarray(mel_spectrogram(jnp.asarray(tone[None]), sample_rate=sr,
                                     n_fft=n_fft, hop_length=hop, n_mels=16,
                                     fmin=10.0, fmax=4000.0))
    fb = mel_filterbank(8000, 256, 16, 10.0, 4000.0)
    freqs = np.linspace(0, 4000, 129)
    band_center = (fb * freqs[:, None]).sum(0) / np.maximum(fb.sum(0), 1e-9)
    peak_band = mel.mean(axis=(0, 1)).argmax()
    assert abs(band_center[peak_band] - 1000) < 400


def test_quantize_roundtrip_and_fit_duration():
    wav = jnp.asarray(np.linspace(-1.2, 1.2, 100, dtype=np.float32)[None])
    q = np.asarray(quantize_roundtrip(wav))
    assert q.max() <= 1.0 and q.min() >= -1.0
    short = fit_duration(jnp.ones((1, 30)), 100)
    assert short.shape == (1, 100)
    np.testing.assert_allclose(np.asarray(short), 1.0)  # repeat-pad
    long = fit_duration(jnp.asarray(np.arange(200, dtype=np.float32)[None]), 100)
    assert long.shape == (1, 100)
    assert long[0, 0] == 50  # center truncation


def test_clap_ranker_shapes_and_self_consistency():
    model = ClapModel.init_random(jax.random.PRNGKey(0), TINY_CLAP)
    ranker = ClapRanker(ClapRankerConfig(), model=model)
    rng = np.random.RandomState(0)
    b, k, t = 2, 3, 4000
    extracted = [rng.randn(k, t).astype(np.float32) * 0.1 for _ in range(b)]
    scores = ranker(extracted_audio=extracted, descriptions=["dog", "cat"],
                    sample_rate=8000)
    assert scores.shape == (b, k)
    assert np.isfinite(scores).all()
    assert (np.abs(scores) <= 1.0 + 1e-5).all()  # cosine of unit vectors


def test_imagebind_ranker_shapes():
    model = ImageBindModel.init_random(jax.random.PRNGKey(0), TINY_IB)
    ranker = ImageBindRanker(ImageBindRankerConfig(), model=model)
    rng = np.random.RandomState(0)
    b, k, t = 2, 2, 4000
    extracted = [rng.randn(k, t).astype(np.float32) * 0.1 for _ in range(b)]
    videos = [rng.randint(0, 255, (6, 3, 48, 64), np.uint8) for _ in range(b)]
    scores = ranker(extracted_audio=extracted, videos=videos, sample_rate=8000)
    assert scores.shape == (b, k)
    assert np.isfinite(scores).all()


def test_audio_to_melclips_shape():
    wav = np.random.RandomState(0).randn(6000).astype(np.float32)
    clips = audio_to_melclips(wav, TINY_IB)
    assert clips.shape == (2, 16, 32)


def test_clip_start_times_constant_clips_sampler():
    # pytorchvideo ConstantClipsPerVideoSampler: starts spaced by
    # max(D - dur, 0)/n, NOT a linspace over [0, D - dur]
    from sam_audio_tpu.models.imagebind import clip_start_times

    starts = clip_start_times(10.0, 2.0, 3)
    np.testing.assert_allclose(starts, [0.0, 8.0 / 3.0, 16.0 / 3.0])
    np.testing.assert_allclose(clip_start_times(1.0, 2.0, 3), [0.0, 0.0, 0.0])


def test_kaldi_fbank_frame_count_and_imagebind_shape():
    from sam_audio_tpu.ops.mel import kaldi_fbank

    wav = np.random.RandomState(0).randn(32000).astype(np.float32)
    fb = kaldi_fbank(wav, sample_frequency=16000, num_mel_bins=128)
    # snip_edges framing: 1 + (32000 - 400)//160 = 198 frames (ImageBind then
    # zero-pads the frame axis to 204)
    assert fb.shape == (198, 128)
    assert np.isfinite(fb).all()


def test_kaldi_fbank_dc_offset_invariance():
    from sam_audio_tpu.ops.mel import kaldi_fbank

    rng = np.random.RandomState(1)
    wav = rng.randn(4000).astype(np.float32)
    a = kaldi_fbank(wav, sample_frequency=16000, num_mel_bins=32)
    b = kaldi_fbank(wav + 5.0, sample_frequency=16000, num_mel_bins=32)
    # remove_dc_offset subtracts the per-frame mean: constant offsets vanish
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_kaldi_fbank_power_log_scaling():
    from sam_audio_tpu.ops.mel import kaldi_fbank

    rng = np.random.RandomState(2)
    wav = (rng.randn(4000) * 0.5).astype(np.float32)
    a = kaldi_fbank(wav, sample_frequency=16000, num_mel_bins=32)
    b = kaldi_fbank(4.0 * wav, sample_frequency=16000, num_mel_bins=32)
    # natural log of a POWER spectrum: x4 amplitude -> +2 ln 4 everywhere
    # (holds wherever the eps floor is not hit; this signal is loud enough)
    np.testing.assert_allclose(b - a, 2.0 * np.log(4.0), atol=1e-3)


def test_kaldi_fbank_tone_peak_and_mel_banks():
    from sam_audio_tpu.ops.mel import kaldi_fbank, kaldi_mel_banks

    banks = kaldi_mel_banks(40, 512, 16000.0)
    assert banks.shape == (40, 257)
    assert (banks >= 0).all()
    assert banks[:, -1].max() == 0.0  # zero-padded Nyquist column
    assert (banks.sum(1) > 0).all()

    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    fb = kaldi_fbank(tone, sample_frequency=sr, num_mel_bins=40)
    peak = fb.mean(0).argmax()
    # kaldi mel grid between 20 Hz and nyquist: find the bin whose center
    # is nearest 1 kHz
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
    centers = mel(20.0) + (np.arange(40) + 1) * (mel(8000.0) - mel(20.0)) / 41
    hz_centers = 700.0 * (np.exp(centers / 1127.0) - 1.0)
    expected = int(np.abs(hz_centers - 1000.0).argmin())
    assert abs(int(peak) - expected) <= 1


def test_kaldi_fbank_short_input_returns_empty_and_melclips_pad():
    from sam_audio_tpu.ops.mel import kaldi_fbank

    fb = kaldi_fbank(np.zeros(100, np.float32), sample_frequency=16000,
                     num_mel_bins=32)
    assert fb.shape == (0, 32)
    # a fully-silent short audio: melclips = log(eps) frames + zero padding,
    # all finite after normalization
    wav = np.zeros(500, np.float32)
    clips = audio_to_melclips(wav, TINY_IB)
    assert clips.shape == (2, 16, 32)
    assert np.isfinite(clips).all()


def test_video_to_clips_shape():
    frames = np.random.RandomState(0).randint(0, 255, (10, 3, 40, 60), np.uint8)
    clips = video_to_clips(frames, TINY_IB)
    assert clips.shape == (2, 3, 32, 32)
    assert clips.max() <= 1.0


def test_clap_score_on_device_matches_host_path():
    """separate()'s on-device CLAP fast path must score identically to the
    host path when clips fit the 10 s window (no truncation -> the paths
    share exact repeatpad semantics)."""
    import jax.numpy as jnp

    model = ClapModel.init_random(jax.random.PRNGKey(3), TINY_CLAP)
    ranker = ClapRanker(ClapRankerConfig(), model=model)
    bsz, k = 2, 3
    n = TINY_CLAP.n_samples
    rng = np.random.RandomState(0)
    sizes = [n // 2, n - 7]  # true lengths below the window
    t_pad = n  # padded row length
    tgt = np.zeros((bsz, k, t_pad), np.float32)
    for i in range(bsz):
        tgt[i, :, : sizes[i]] = rng.randn(k, sizes[i]) * 0.1

    assert ranker.supports_on_device(sizes, TINY_CLAP.sample_rate)
    assert not ranker.supports_on_device([n + 1], TINY_CLAP.sample_rate)
    assert not ranker.supports_on_device(sizes, 16000)

    dev = np.asarray(ranker.score_on_device(jnp.asarray(tgt), sizes,
                                            ["a", "b"]))
    host = ranker(
        extracted_audio=[tgt[i, :, : sizes[i]] for i in range(bsz)],
        descriptions=["a", "b"],
        sample_rate=TINY_CLAP.sample_rate,
    )
    assert dev.shape == (bsz, k)
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-5)


def test_separate_uses_on_device_clap_path():
    """separate() with a ClapRanker whose window fits must take the
    on-device scoring path and pick the same winner as the host path."""
    import jax.numpy as jnp  # noqa: F401

    from sam_audio_tpu.config import tiny_test_config
    from sam_audio_tpu.models.sam_audio import SAMAudio
    from sam_audio_tpu.processor import SAMAudioProcessor
    from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

    cfg = tiny_test_config()
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), cfg,
        tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size))
    # CLAP pipeline at the model's sample rate so the device gate opens
    clap_cfg = TINY_CLAP.__class__(**{
        **TINY_CLAP.__dict__, "sample_rate": cfg.audio_codec.sample_rate})
    clap = ClapModel.init_random(jax.random.PRNGKey(1), clap_cfg)
    ranker = ClapRanker(ClapRankerConfig(), model=clap)
    model.text_ranker = ranker

    p = SAMAudioProcessor(audio_hop_length=cfg.audio_codec.hop_length,
                          audio_sampling_rate=cfg.audio_codec.sample_rate)
    rng = np.random.RandomState(0)
    batch = p(descriptions=["a tone"],
              audios=[rng.randn(1, 96).astype(np.float32) * 0.1])
    t = batch.anchor_alignment.shape[-1]
    k = 3
    noise = rng.randn(k, t, 2 * cfg.audio_codec.codebook_dim).astype(
        np.float32)

    calls = {"device": 0, "host": 0}
    orig_dev = ranker.score_on_device
    orig_host = ranker.__call__

    def spy_dev(*a, **kw):
        calls["device"] += 1
        return orig_dev(*a, **kw)

    ranker.score_on_device = spy_dev
    res_dev = model.separate(batch, noise=noise, reranking_candidates=k)
    assert calls["device"] == 1

    # force the host path (same ranker model, identical inputs): outputs
    # must match because device/host scoring is bit-faithful
    ranker.score_on_device = orig_dev
    ranker2 = ClapRanker(ClapRankerConfig(), model=clap)
    ranker2.supports_on_device = lambda *a, **kw: False
    model.text_ranker = ranker2
    batch2 = p(descriptions=["a tone"],
               audios=[np.asarray(batch.audios)[0, :, :96]])
    res_host = model.separate(batch2, noise=noise, reranking_candidates=k)
    np.testing.assert_allclose(np.asarray(res_dev.target[0]),
                               np.asarray(res_host.target[0]),
                               rtol=1e-5, atol=1e-6)
    del orig_host


def test_quantized_clap_close_to_fp():
    """int8 CLAP scorer (ClapModel.quantize()): embeddings stay strongly
    correlated with fp on the tiny model, and candidate rankings survive."""
    model = ClapModel.init_random(jax.random.PRNGKey(5), TINY_CLAP)
    rng = np.random.RandomState(0)
    wavs = rng.randn(4, TINY_CLAP.n_samples).astype(np.float32) * 0.1
    import jax.numpy as jnp

    ref = np.asarray(model.get_audio_embedding(jnp.asarray(wavs)))
    model.quantize()
    blk = model.params["audio_branch"]["stages"][0]["blocks"][0]
    assert "w8" in blk["qkv"]
    assert "w8" in model.params["text_branch"]["layers"]["attn"]["wq"]
    out = np.asarray(model.get_audio_embedding(jnp.asarray(wavs)))
    assert np.isfinite(out).all()
    # embeddings are L2-normalized; cosine per row must stay high
    cos = np.sum(ref * out, axis=-1)
    assert (cos > 0.98).all(), cos


def test_kaldi_fbank_jax_matches_numpy():
    """Jittable Kaldi fbank (f32, DFT-matmul rFFT) vs the numpy f64 oracle."""
    from sam_audio_tpu.ops.mel import kaldi_fbank, kaldi_fbank_jax

    rng = np.random.RandomState(0)
    wav = (rng.randn(3, 1600) * 0.3).astype(np.float32)
    ours = np.asarray(kaldi_fbank_jax(jnp.asarray(wav)))
    assert ours.shape == (3, 8, 128)
    for i in range(3):
        ref = kaldi_fbank(wav[i])
        np.testing.assert_allclose(ours[i], ref, rtol=1e-3, atol=2e-3)
    # below one 25 ms window -> zero frames (kaldi min_duration behavior)
    assert kaldi_fbank_jax(jnp.zeros((2, 100))).shape == (2, 0, 128)


def test_audio_to_melclips_jax_matches_numpy():
    from sam_audio_tpu.models.imagebind import audio_to_melclips_jax

    rng = np.random.RandomState(1)
    wav = (rng.randn(2, 5000) * 0.3).astype(np.float32)
    ours = np.asarray(audio_to_melclips_jax(jnp.asarray(wav), TINY_IB))
    assert ours.shape == (2, 2, 16, 32)
    for i in range(2):
        ref = audio_to_melclips(wav[i], TINY_IB)
        np.testing.assert_allclose(ours[i], ref, rtol=1e-3, atol=2e-3)


def test_imagebind_score_on_device_matches_host():
    """On-device ImageBind scoring (resample -> mel clips -> audio tower in
    one compiled program) vs the host numpy pipeline."""
    model = ImageBindModel.init_random(jax.random.PRNGKey(0), TINY_IB)
    ranker = ImageBindRanker(ImageBindRankerConfig(), model=model)
    rng = np.random.RandomState(0)
    b, k, t = 2, 3, 4000
    tgt = (rng.randn(b, k, t) * 0.1).astype(np.float32)
    videos = [rng.randint(0, 255, (6, 3, 48, 64), np.uint8) for _ in range(b)]

    assert ranker.supports_on_device([t, t], TINY_IB.sample_rate)
    assert not ranker.supports_on_device([t, t - 1], TINY_IB.sample_rate)

    dev = np.asarray(ranker.score_on_device(
        jnp.asarray(tgt), [t, t], videos, sample_rate=TINY_IB.sample_rate))
    host = ranker(extracted_audio=[tgt[i] for i in range(b)], videos=videos,
                  sample_rate=TINY_IB.sample_rate)
    assert dev.shape == (b, k)
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-4)

    # resampling path: jittable conv resampler vs the numpy one
    dev16 = np.asarray(ranker.score_on_device(
        jnp.asarray(tgt), [t, t], videos, sample_rate=16000))
    host16 = ranker(extracted_audio=[tgt[i] for i in range(b)], videos=videos,
                    sample_rate=16000)
    np.testing.assert_allclose(dev16, host16, rtol=5e-3, atol=5e-3)
