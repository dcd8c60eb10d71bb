"""Sequence-parallel DiT (parallel/sp.py): exact parity with dit_apply on
the 8-virtual-CPU mesh — ring self-attention, replicated cross-attention,
sharded RoPE tables and padding masks."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from sam_audio_tpu.config import TransformerConfig
from sam_audio_tpu.models.dit import dit_apply, dit_init
from sam_audio_tpu.parallel.sp import dit_apply_sp

CFG = TransformerConfig(
    dim=32, n_heads=4, n_layers=3, dropout=0.0, context_dim=16,
    max_positions=64, frequency_embedding_dim=8, out_channels=6,
    in_channels=None,
)


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices("cpu")[:n]), axis_names=("sp",))


def _inputs(b=2, t=16, l=5, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, t, CFG.dim).astype(np.float32))
    time = jnp.asarray(rng.rand(b).astype(np.float32))
    memory = jnp.asarray(rng.randn(b, l, CFG.context_dim).astype(np.float32))
    pad = np.ones((b, t), bool)
    pad[1, 13:] = False  # ragged tail inside the last shard
    mem_mask = np.ones((b, l), bool)
    mem_mask[0, 3:] = False
    return x, time, memory, jnp.asarray(pad), jnp.asarray(mem_mask)


def test_sp_dit_matches_single_device():
    params = dit_init(jax.random.PRNGKey(0), CFG)
    x, time, memory, pad, mem_mask = _inputs()
    ref = np.asarray(dit_apply(params, x, time, cfg=CFG, padding_mask=pad,
                               memory=memory, memory_padding_mask=mem_mask))
    out = np.asarray(dit_apply_sp(params, x, time, cfg=CFG, mesh=_mesh(),
                                  padding_mask=pad, memory=memory,
                                  memory_padding_mask=mem_mask))
    p = np.asarray(pad)
    np.testing.assert_allclose(out[p], ref[p], rtol=1e-5, atol=1e-5)


def test_sp_dit_no_padding_mask_and_sharded_output():
    params = dit_init(jax.random.PRNGKey(1), CFG)
    x, time, memory, _, _ = _inputs(seed=2)
    mesh = _mesh()
    ref = np.asarray(dit_apply(params, x, time, cfg=CFG, memory=memory))
    out = dit_apply_sp(params, x, time, cfg=CFG, mesh=mesh, memory=memory)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    assert len({s.device for s in out.addressable_shards}) == 8


def test_sp_dit_guards():
    params = dit_init(jax.random.PRNGKey(0), CFG)
    x, time, memory, _, _ = _inputs(t=12)  # 12 % 8 != 0
    try:
        dit_apply_sp(params, x, time, cfg=CFG, mesh=_mesh(), memory=memory)
    except ValueError as e:
        assert "divide" in str(e)
    else:
        raise AssertionError("expected divisibility error")
    x2, time2, _, _, _ = _inputs()
    try:
        dit_apply_sp(params, x2, time2, cfg=CFG, mesh=_mesh(), memory=None)
    except ValueError as e:
        assert "memory" in str(e)
    else:
        raise AssertionError("expected memory-required error")


def test_separate_latents_sp_matches_single_device():
    """Full inference program with the DiT trunk sequence-parallel: codec
    encode + T5 + conditioning replicated, ODE over the SP DiT — equal to
    the plain separate_latents."""
    from sam_audio_tpu.config import tiny_test_config
    from sam_audio_tpu.models.sam_audio import sam_audio_init, separate_latents

    cfg = tiny_test_config()
    params = sam_audio_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    b, l = 1, 5
    t = 16  # divisible over sp=8
    t_wav = t * cfg.audio_codec.hop_length
    args = dict(
        audios=jnp.asarray(rng.randn(b, 1, t_wav).astype(np.float32) * 0.1),
        text_ids=jnp.asarray(rng.randint(3, 200, (b, l)).astype(np.int32)),
        text_mask=jnp.ones((b, l), bool),
        anchor_ids=jnp.zeros((b, 4), jnp.int32).at[:, 1:].set(3),
        anchor_alignment=jnp.zeros((b, t), jnp.int32),
        audio_pad_mask=jnp.ones((b, t), bool),
        noise=jnp.asarray(
            rng.randn(b * 2, t, 2 * cfg.audio_codec.codebook_dim)
            .astype(np.float32)),
        video_features=None,
    )
    ref = np.asarray(separate_latents(params, **args, cfg=cfg, candidates=2))
    out = np.asarray(separate_latents(params, **args, cfg=cfg, candidates=2,
                                      sp_mesh=_mesh()))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_sp_dit_with_int8_params():
    """Sequence parallelism composes with the int8 serving mode: the W8A8
    linears dispatch identically inside the shard_map trunk."""
    from sam_audio_tpu.ops.quant import quantize_dit_params

    params = quantize_dit_params(dit_init(jax.random.PRNGKey(0), CFG))
    x, time, memory, pad, mem_mask = _inputs(seed=4)
    ref = np.asarray(dit_apply(params, x, time, cfg=CFG, padding_mask=pad,
                               memory=memory, memory_padding_mask=mem_mask))
    out = np.asarray(dit_apply_sp(params, x, time, cfg=CFG, mesh=_mesh(),
                                  padding_mask=pad, memory=memory,
                                  memory_padding_mask=mem_mask))
    p = np.asarray(pad)
    np.testing.assert_allclose(out[p], ref[p], rtol=1e-5, atol=1e-5)


def test_sp_dit_gradients_match_single_device():
    """shard_map + ppermute differentiates exactly (ppermute transposes to
    the reverse ring), so the SP trunk is trainable: param grads through
    dit_apply_sp equal the single-device grads."""
    params = dit_init(jax.random.PRNGKey(0), CFG)
    x, time, memory, pad, mem_mask = _inputs(seed=5)

    def loss(p, fn, **kw):
        out = fn(p, x, time, cfg=CFG, padding_mask=pad, memory=memory,
                 memory_padding_mask=mem_mask, **kw)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_ref = jax.grad(lambda p: loss(p, dit_apply))(params)
    g_sp = jax.grad(lambda p: loss(p, dit_apply_sp, mesh=_mesh()))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_model_separate_with_sp_mesh():
    """model.sp_mesh routes separate() through the sequence-parallel trunk;
    outputs equal the single-device separate() with the same noise."""
    from sam_audio_tpu.config import tiny_test_config
    from sam_audio_tpu.models.sam_audio import SAMAudio
    from sam_audio_tpu.processor import SAMAudioProcessor
    from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

    cfg = tiny_test_config()
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), cfg,
        tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size),
    )
    p = SAMAudioProcessor(
        audio_hop_length=cfg.audio_codec.hop_length,
        audio_sampling_rate=cfg.audio_codec.sample_rate,
    )
    rng = np.random.RandomState(0)
    wav = rng.randn(1, 16 * cfg.audio_codec.hop_length).astype(
        np.float32) * 0.1  # 16 latent frames: divisible over sp=8
    batch = p(descriptions=["a tone"], audios=[wav])
    t = batch.anchor_alignment.shape[-1]
    noise = rng.randn(1, t, 2 * cfg.audio_codec.codebook_dim).astype(
        np.float32)

    ref = model.separate(batch, noise=noise)
    model.sp_mesh = _mesh()
    batch2 = p(descriptions=["a tone"], audios=[wav])
    out = model.separate(batch2, noise=noise)
    np.testing.assert_allclose(np.asarray(out.target[0]),
                               np.asarray(ref.target[0]),
                               rtol=1e-4, atol=1e-5)
