"""Int8 serving mode (ops/quant.py): numerics and end-to-end wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import TransformerConfig, tiny_test_config
from sam_audio_tpu.models.dit import dit_apply, dit_init
from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops.quant import (
    linear_int8,
    quantize_dit_params,
    quantize_linear,
    quantize_sam_audio_params,
)

CFG = TransformerConfig(
    dim=32, n_heads=4, n_layers=3, dropout=0.0, context_dim=16,
    max_positions=64, frequency_embedding_dim=8, out_channels=6,
    in_channels=None,
)


def test_linear_int8_close_to_exact():
    rng = np.random.RandomState(0)
    p = {
        "weight": jnp.asarray(rng.randn(24, 48).astype(np.float32) * 0.1),
        "bias": jnp.asarray(rng.randn(24).astype(np.float32)),
    }
    x = jnp.asarray(rng.randn(5, 7, 48).astype(np.float32))
    exact = N.linear(p, x)
    q = quantize_linear(p)
    approx = linear_int8(q, x)
    assert q["w8"].dtype == jnp.int8
    assert q["w_scale"].shape == (24,)
    # W8A8 error bound: ~1% relative on well-scaled gaussian data
    rel = np.abs(np.asarray(approx - exact)) / (np.abs(np.asarray(exact)) + 1e-2)
    assert float(np.median(rel)) < 0.02, float(np.median(rel))


def test_linear_dispatches_on_quantized_params():
    rng = np.random.RandomState(1)
    p = {"weight": jnp.asarray(rng.randn(8, 16).astype(np.float32))}
    x = jnp.asarray(rng.randn(3, 16).astype(np.float32))
    q = quantize_linear(p)
    np.testing.assert_allclose(
        np.asarray(N.linear(q, x)), np.asarray(linear_int8(q, x))
    )


def test_quantized_dit_matches_fp_closely():
    params = dit_init(jax.random.PRNGKey(0), CFG)
    qparams = quantize_dit_params(params)
    # stacked-layer leaves quantized with per-(layer, out_channel) scales
    assert qparams["layers"]["attention"]["wq"]["w8"].shape == (
        CFG.n_layers, CFG.dim, CFG.dim)
    assert qparams["layers"]["attention"]["wq"]["w_scale"].shape == (
        CFG.n_layers, CFG.dim)
    # head and embedders stay full-precision
    assert "weight" in qparams["output"]
    assert "weight" in qparams["t_block"]

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 10, CFG.dim).astype(np.float32))
    time = jnp.asarray(rng.rand(2).astype(np.float32))
    memory = jnp.asarray(rng.randn(2, 5, CFG.context_dim).astype(np.float32))
    ref = np.asarray(dit_apply(params, x, time, cfg=CFG, memory=memory))
    out = np.asarray(dit_apply(qparams, x, time, cfg=CFG, memory=memory))
    assert np.isfinite(out).all()
    denom = np.sqrt(np.mean(ref * ref)) + 1e-9
    rel_rmse = np.sqrt(np.mean((out - ref) ** 2)) / denom
    assert rel_rmse < 0.05, rel_rmse


def test_separate_with_quantized_model_runs():
    from sam_audio_tpu.models.sam_audio import SAMAudio
    from sam_audio_tpu.processor import SAMAudioProcessor

    from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

    cfg = tiny_test_config()
    tok = ByteFallbackTokenizer(cfg.text_encoder.vocab_size)
    model = SAMAudio.init_random(jax.random.PRNGKey(0), cfg, tokenizer=tok)
    ref_model = SAMAudio.init_random(jax.random.PRNGKey(0), cfg, tokenizer=tok)
    processor = SAMAudioProcessor(
        audio_hop_length=cfg.audio_codec.hop_length,
        audio_sampling_rate=cfg.audio_codec.sample_rate,
    )
    rng = np.random.RandomState(3)
    wav = rng.randn(1, 800).astype(np.float32) * 0.1
    batch = processor(descriptions=["a tone"], audios=[wav])
    t_frames = batch.anchor_alignment.shape[-1]
    noise = jax.random.normal(
        jax.random.PRNGKey(9),
        (1, t_frames, 2 * cfg.audio_codec.codebook_dim), jnp.float32)

    ref = ref_model.separate(batch, rng=jax.random.PRNGKey(1), noise=noise)
    model.quantize()
    assert "w8" in model.params["transformer"]["layers"]["attention"]["wq"]
    out = model.separate(batch, rng=jax.random.PRNGKey(1), noise=noise)

    a = np.asarray(out.target[0])
    b = np.asarray(ref.target[0])
    assert np.isfinite(a).all()
    # same noise, quantized weights: outputs strongly correlated with exact
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.9, corr


def test_quantized_params_shard_and_match_on_mesh():
    """shard() after quantize(): w8/w_scale leaves get real TP placements and
    the sharded quantized program matches the single-device quantized one."""
    from sam_audio_tpu.models.sam_audio import sam_audio_init, separate_latents
    from sam_audio_tpu.parallel.mesh import (
        make_mesh,
        param_partition_spec,
        shard_batch,
        shard_params,
    )

    # rule sanity: w8 shards like weight; w_scale follows the out axis on
    # column-parallel and stays replicated on row-parallel
    assert param_partition_spec(
        "transformer/layers/attention/wq/w8", 3) == jax.sharding.PartitionSpec(
            None, "tp", None)
    assert param_partition_spec(
        "transformer/layers/attention/wq/w_scale",
        2) == jax.sharding.PartitionSpec(None, "tp")
    assert param_partition_spec(
        "transformer/layers/feed_forward/w2/w8",
        3) == jax.sharding.PartitionSpec(None, None, "tp")
    assert param_partition_spec(
        "transformer/layers/feed_forward/w2/w_scale",
        2) == jax.sharding.PartitionSpec(None, None)

    cfg = tiny_test_config()
    params = sam_audio_init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_sam_audio_params(params)

    rng = np.random.RandomState(0)
    t_wav, b, l = 64, 2, 5
    t = t_wav // cfg.audio_codec.hop_length
    args = dict(
        audios=jnp.asarray(rng.randn(b, 1, t_wav).astype(np.float32) * 0.1),
        text_ids=jnp.asarray(rng.randint(3, 200, (b, l)).astype(np.int32)),
        text_mask=jnp.ones((b, l), bool),
        anchor_ids=jnp.zeros((b, 4), jnp.int32).at[:, 1:].set(3),
        anchor_alignment=jnp.zeros((b, t), jnp.int32),
        audio_pad_mask=jnp.ones((b, t), bool),
        noise=jnp.asarray(
            rng.randn(b, t, 2 * cfg.audio_codec.codebook_dim)
            .astype(np.float32)),
        video_features=None,
    )
    ref = np.asarray(separate_latents(qparams, **args, cfg=cfg, candidates=1))

    mesh = make_mesh(dp=2, tp=4)
    sp = shard_params(qparams, mesh)
    wq = sp["transformer"]["layers"]["attention"]["wq"]
    assert len({s.device for s in wq["w8"].addressable_shards}) == 8
    sa = dict(args)
    sharded_keys = ("audios", "text_ids", "text_mask", "anchor_ids",
                    "anchor_alignment", "audio_pad_mask", "noise")
    sa.update(shard_batch({k: sa[k] for k in sharded_keys}, mesh))
    out = np.asarray(separate_latents(sp, **sa, cfg=cfg, candidates=1))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_int8_decoded_waveform_snr_gate():
    """Audio-level accuracy gate for the int8 serving mode (VERDICT r2 task
    4a): decoded-waveform SNR and log-spectral distance vs the exact model on
    the tiny golden model with identical noise. Measured r3: SNR 66.6 dB,
    LSD 0.042 dB (tiny model; small random-init velocities make the shared
    noise dominate — this gates the quantization wiring, not absolute
    fidelity on real weights, which needs staged checkpoints)."""
    from sam_audio_tpu.models.sam_audio import SAMAudio
    from sam_audio_tpu.processor import SAMAudioProcessor
    from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

    cfg = tiny_test_config()
    tok = ByteFallbackTokenizer(cfg.text_encoder.vocab_size)
    model = SAMAudio.init_random(jax.random.PRNGKey(0), cfg, tokenizer=tok)
    ref_model = SAMAudio.init_random(jax.random.PRNGKey(0), cfg, tokenizer=tok)
    proc = SAMAudioProcessor(audio_hop_length=cfg.audio_codec.hop_length,
                             audio_sampling_rate=cfg.audio_codec.sample_rate)
    rng = np.random.RandomState(3)
    batch = proc(descriptions=["a tone"],
                 audios=[rng.randn(1, 800).astype(np.float32) * 0.1])
    t = batch.anchor_alignment.shape[-1]
    noise = jax.random.normal(
        jax.random.PRNGKey(9), (1, t, 2 * cfg.audio_codec.codebook_dim),
        jnp.float32)
    ref = ref_model.separate(batch, noise=noise)
    model.quantize()
    out = model.separate(batch, noise=noise)
    a = np.asarray(out.target[0])
    b = np.asarray(ref.target[0])

    snr = 10 * np.log10(np.sum(b * b) / max(np.sum((a - b) ** 2), 1e-12))
    assert snr > 30.0, f"int8 waveform SNR degraded: {snr:.2f} dB"

    def spec_db(w, nfft=128, hop=64):
        frames = [w[i:i + nfft] * np.hanning(nfft)
                  for i in range(0, len(w) - nfft, hop)]
        s = np.abs(np.fft.rfft(np.stack(frames), axis=-1)) ** 2
        return 10 * np.log10(np.maximum(s, 1e-10))

    lsd = float(np.mean(np.sqrt(np.mean(
        (spec_db(a) - spec_db(b)) ** 2, axis=-1))))
    assert lsd < 0.5, f"int8 log-spectral distance degraded: {lsd:.3f} dB"


def test_linear_int4_roundtrip_and_accuracy():
    from sam_audio_tpu.ops.quant import linear_int4, quantize_linear_int4

    rng = np.random.RandomState(0)
    p = {
        "weight": jnp.asarray(rng.randn(24, 256).astype(np.float32) * 0.1),
        "bias": jnp.asarray(rng.randn(24).astype(np.float32)),
    }
    x = jnp.asarray(rng.randn(5, 256).astype(np.float32))
    q = quantize_linear_int4(p)
    assert q["w4"].dtype == jnp.uint8
    assert q["w4"].shape == (12, 256)       # out-axis packed: (out/2, in)
    assert q["w4_scale"].shape == (24, 2)   # group-128 scales
    exact = N.linear(p, x)
    approx = linear_int4(q, x, jnp.float32)
    rel = np.abs(np.asarray(approx - exact)) / (np.abs(np.asarray(exact)) + 1e-2)
    # int4 with group-128 scales: ~5% relative error on gaussian data
    assert float(np.median(rel)) < 0.10, float(np.median(rel))
    # dispatch through N.linear on the "w4" key
    np.testing.assert_allclose(np.asarray(N.linear(q, x, jnp.float32)),
                               np.asarray(approx))


def test_linear_int4_odd_group_dims():
    """In-dims not divisible by 128 fall back to the largest group size
    dividing in."""
    from sam_audio_tpu.ops.quant import linear_int4, quantize_linear_int4

    rng = np.random.RandomState(1)
    p = {"weight": jnp.asarray(rng.randn(8, 160).astype(np.float32) * 0.1)}
    q = quantize_linear_int4(p)  # 160 % 128 != 0 -> g=80
    assert q["w4"].shape == (4, 160)
    assert q["w4_scale"].shape == (8, 2)
    x = jnp.asarray(rng.randn(3, 160).astype(np.float32))
    out = linear_int4(q, x, jnp.float32)
    exact = N.linear(p, x)
    corr = np.corrcoef(np.asarray(out).ravel(), np.asarray(exact).ravel())[0, 1]
    assert corr > 0.98, corr


def test_separate_with_int4_model_runs():
    """bits=4 end to end on the tiny model with an SNR bound vs exact."""
    from sam_audio_tpu.models.sam_audio import SAMAudio
    from sam_audio_tpu.processor import SAMAudioProcessor
    from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

    cfg = tiny_test_config()
    tok = ByteFallbackTokenizer(cfg.text_encoder.vocab_size)
    model = SAMAudio.init_random(jax.random.PRNGKey(0), cfg, tokenizer=tok)
    ref_model = SAMAudio.init_random(jax.random.PRNGKey(0), cfg, tokenizer=tok)
    proc = SAMAudioProcessor(audio_hop_length=cfg.audio_codec.hop_length,
                             audio_sampling_rate=cfg.audio_codec.sample_rate)
    rng = np.random.RandomState(3)
    batch = proc(descriptions=["a tone"],
                 audios=[rng.randn(1, 800).astype(np.float32) * 0.1])
    t = batch.anchor_alignment.shape[-1]
    noise = jax.random.normal(
        jax.random.PRNGKey(9), (1, t, 2 * cfg.audio_codec.codebook_dim),
        jnp.float32)
    ref = ref_model.separate(batch, noise=noise)
    model.quantize(bits=4)
    assert "w4" in model.params["transformer"]["layers"]["attention"]["wq"]
    out = model.separate(batch, noise=noise)
    a = np.asarray(out.target[0])
    b = np.asarray(ref.target[0])
    assert np.isfinite(a).all()
    snr = 10 * np.log10(np.sum(b * b) / max(np.sum((a - b) ** 2), 1e-12))
    # int4 is coarser than int8 (66.6 dB); still must stay close on the
    # tiny golden model where shared noise dominates
    assert snr > 20.0, f"int4 waveform SNR degraded: {snr:.2f} dB"


def test_matmul_int4_pallas_matches_xla_path():
    """The Pallas int4 kernel (interpret mode on CPU) must match the XLA
    dequant path bit-for-bit up to matmul reassociation."""
    from sam_audio_tpu.ops.int4_matmul import matmul_int4
    from sam_audio_tpu.ops.quant import _unpack_int4, quantize_linear_int4

    rng = np.random.RandomState(2)
    for out, din in [(32, 256), (64, 384)]:
        p = {"weight": jnp.asarray(
            rng.randn(out, din).astype(np.float32) * 0.1)}
        q = quantize_linear_int4(p)
        x = jnp.asarray(rng.randn(5, din).astype(np.float32))
        ref = x @ _unpack_int4(q["w4"], q["w4_scale"], jnp.float32).T
        got = matmul_int4(x, q["w4"], q["w4_scale"], interpret=True)
        assert got.shape == (5, out)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_quantize_pe_vision_tower_close_and_wired():
    """quantize_pe_params: int8 PE tower features stay close to exact, and
    SAMAudio.quantize() reaches an attached vision encoder."""
    from sam_audio_tpu.models.pe_clip import (
        PerceptionEncoder,
        encode_images,
        pe_clip_init,
    )
    from sam_audio_tpu.models.sam_audio import SAMAudio
    from sam_audio_tpu.ops.quant import quantize_pe_params
    from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

    cfg = tiny_test_config()
    vcfg = cfg.vision_encoder
    params = pe_clip_init(jax.random.PRNGKey(0), vcfg)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (2, 3, vcfg.image_size, vcfg.image_size),
        jnp.float32) * 0.5
    exact = np.asarray(encode_images(params, x, vcfg))
    q = quantize_pe_params(params)
    assert "w8" in q["layers"]["attn"]["wq"]
    quant = np.asarray(encode_images(q, x, vcfg))
    assert np.isfinite(quant).all()
    corr = np.corrcoef(exact.ravel(), quant.ravel())[0, 1]
    assert corr > 0.99, corr

    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), cfg,
        tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size),
    )
    model.vision_encoder = PerceptionEncoder(vcfg, params)
    model.quantize()
    assert "w8" in model.vision_encoder.params["layers"]["attn"]["wq"]
