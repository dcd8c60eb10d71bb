"""Multi-chip inference: the full separate_latents program (codec encode +
ODE scan + conditioning) with dp-sharded batches and tp-sharded params on the
8-virtual-device mesh must match single-device results."""

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import (
    decode_channel,
    sam_audio_init,
    separate_latents,
)
from sam_audio_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

CFG = tiny_test_config()


def _inputs(b=4, t_wav=64, l=6, k=2, seed=0):
    rng = np.random.RandomState(seed)
    t = t_wav // CFG.audio_codec.hop_length
    return dict(
        audios=jnp.asarray(rng.randn(b, 1, t_wav).astype(np.float32) * 0.1),
        text_ids=jnp.asarray(rng.randint(3, 200, (b, l)).astype(np.int32)),
        text_mask=jnp.ones((b, l), bool),
        anchor_ids=jnp.zeros((b, 4), jnp.int32).at[:, 1:].set(3),
        anchor_alignment=jnp.zeros((b, t), jnp.int32),
        audio_pad_mask=jnp.ones((b, t), bool),
        noise=jnp.asarray(
            rng.randn(b * k, t, 2 * CFG.audio_codec.codebook_dim)
            .astype(np.float32)
        ),
        video_features=None,
    )


def test_sharded_separate_latents_matches_single_device():
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    args = _inputs()
    ref = np.asarray(separate_latents(params, **args, cfg=CFG, candidates=2))

    mesh = make_mesh(dp=2, tp=4)
    sp = shard_params(params, mesh)
    # batch-dim leaves shard over dp (audios b=4; noise b*k=8 also dp-sharded)
    sa = dict(args)
    sharded_keys = ("audios", "text_ids", "text_mask", "anchor_ids",
                    "anchor_alignment", "audio_pad_mask", "noise")
    shards = shard_batch({k: sa[k] for k in sharded_keys}, mesh)
    sa.update(shards)

    out = np.asarray(separate_latents(sp, **sa, cfg=CFG, candidates=2))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)

    # decode stays correct on sharded latents
    wav_ref = np.asarray(decode_channel(params, jnp.asarray(ref), cfg=CFG,
                                        channel=0))
    wav_sharded = np.asarray(decode_channel(sp, jnp.asarray(out), cfg=CFG,
                                            channel=0))
    np.testing.assert_allclose(wav_sharded, wav_ref, rtol=1e-3, atol=1e-4)


def test_sharded_clap_scoring_matches_single_device():
    """The on-device CLAP scorer must produce identical scores when the
    candidate batch is dp-sharded over the mesh (scorers scale with the
    generation batch — no resharding at the rerank boundary)."""
    from sam_audio_tpu.config import ClapRankerConfig
    from sam_audio_tpu.models.clap import ClapModel
    from sam_audio_tpu.ranking.clap import ClapRanker
    from tests.test_mel_clap_imagebind import TINY_CLAP

    clap_cfg = TINY_CLAP.__class__(**{
        **TINY_CLAP.__dict__, "sample_rate": CFG.audio_codec.sample_rate})
    clap = ClapModel.init_random(jax.random.PRNGKey(1), clap_cfg)
    ranker = ClapRanker(ClapRankerConfig(), model=clap)

    bsz, k = 4, 2
    n = clap_cfg.n_samples
    rng = np.random.RandomState(0)
    sizes = [n, n // 2, n - 8, n // 4]
    tgt = np.zeros((bsz, k, n), np.float32)
    for i in range(bsz):
        tgt[i, :, : sizes[i]] = rng.randn(k, sizes[i]) * 0.1

    ref = np.asarray(ranker.score_on_device(jnp.asarray(tgt), sizes,
                                            ["a", "b", "c", "d"]))

    mesh = make_mesh(dp=2, tp=4)
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("dp", None, None))
    tgt_sharded = jax.device_put(jnp.asarray(tgt), sharding)
    out = np.asarray(ranker.score_on_device(tgt_sharded, sizes,
                                            ["a", "b", "c", "d"]))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_sharded_pe_tower_matches_single_device():
    """TP rules now cover the ViT mlp/fc1|fc2 (column/row) in addition to
    attn/wq..wo: a dp x tp-sharded PE-Core encode must equal the
    single-device one, for exact AND int8 params."""
    from sam_audio_tpu.models.pe_clip import encode_images, pe_clip_init
    from sam_audio_tpu.ops.quant import quantize_pe_params
    from sam_audio_tpu.parallel.mesh import param_partition_spec

    # rule sanity: fc1 column-parallel, fc2 row-parallel, fc1 bias sharded
    assert param_partition_spec("layers/mlp/fc1/weight", 3) == \
        jax.sharding.PartitionSpec(None, "tp", None)
    assert param_partition_spec("layers/mlp/fc2/weight", 3) == \
        jax.sharding.PartitionSpec(None, None, "tp")
    assert param_partition_spec("layers/mlp/fc1/bias", 2) == \
        jax.sharding.PartitionSpec(None, "tp")
    assert param_partition_spec("layers/attn/wq/bias", 2) == \
        jax.sharding.PartitionSpec(None, "tp")

    vcfg = tiny_test_config().vision_encoder
    params = pe_clip_init(jax.random.PRNGKey(0), vcfg)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (4, 3, vcfg.image_size, vcfg.image_size),
        jnp.float32) * 0.5

    mesh = make_mesh(dp=2, tp=4)
    for tree in (params, quantize_pe_params(params)):
        ref = np.asarray(encode_images(tree, x, vcfg))
        sp = shard_params(tree, mesh)
        fc1 = sp["layers"]["mlp"]["fc1"]
        w = fc1.get("weight", fc1.get("w8"))
        assert len({s.device for s in w.addressable_shards}) >= 4
        xs = shard_batch({"x": x}, mesh)["x"]
        out = np.asarray(encode_images(sp, xs, vcfg))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_model_shard_covers_vision_encoder():
    from sam_audio_tpu.models.pe_clip import PerceptionEncoder
    from sam_audio_tpu.models.sam_audio import SAMAudio
    from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

    cfg = tiny_test_config()
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), cfg,
        tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size),
    )
    model.vision_encoder = PerceptionEncoder.init_random(
        jax.random.PRNGKey(1), cfg.vision_encoder
    )
    model.shard(mesh=make_mesh(dp=2, tp=4))
    w = model.vision_encoder.params["layers"]["attn"]["wq"]["weight"]
    assert len({s.device for s in w.addressable_shards}) == 8
