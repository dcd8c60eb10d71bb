"""Multi-device tests on the 8-virtual-CPU mesh: TP/DP sharding of the DiT,
sharded forward parity vs single-device, and the flow-matching train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import forward, sam_audio_init
from sam_audio_tpu.parallel.mesh import (
    make_mesh,
    param_partition_spec,
    shard_batch,
    shard_params,
)
from sam_audio_tpu.train.flow_matching import (
    Trainer,
    flow_matching_loss,
    synthetic_batch,
)

CFG = tiny_test_config()


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_partition_spec_rules():
    assert param_partition_spec(
        "transformer/layers/attention/wq/weight", 3
    ) == P(None, "tp", None)
    assert param_partition_spec(
        "transformer/layers/attention/wo/weight", 3
    ) == P(None, None, "tp")
    assert param_partition_spec(
        "transformer/layers/feed_forward/w2/weight", 3
    ) == P(None, None, "tp")
    assert param_partition_spec(
        "transformer/layers/feed_forward/w1/weight", 3
    ) == P(None, "tp", None)
    assert param_partition_spec("transformer/norm/weight", 1) == P(None)
    assert param_partition_spec(
        "audio_codec/encoder/blocks/0/conv/weight", 3
    ) == P(None, None, None)
    assert param_partition_spec("transformer/t_block/weight", 2) == P("tp", None)
    assert param_partition_spec("text_encoder/blocks/attn/q/weight", 3) == P(
        None, "tp", None
    )


def _forward_args(params, b=4, t=8, l=6, seed=0):
    rng = np.random.RandomState(seed)
    c2 = 2 * CFG.audio_codec.codebook_dim
    return dict(
        noisy_audio=jnp.asarray(rng.randn(b, t, c2).astype(np.float32)),
        audio_features=jnp.asarray(rng.randn(b, t, c2).astype(np.float32)),
        text_features=jnp.asarray(
            rng.randn(b, l, CFG.text_encoder.dim).astype(np.float32)
        ),
        time=jnp.asarray(rng.rand(b).astype(np.float32)),
        text_mask=jnp.ones((b, l), bool),
        anchor_ids=jnp.zeros((b, 2), jnp.int32).at[:, 1].set(3),
        anchor_alignment=jnp.zeros((b, t), jnp.int32),
        audio_pad_mask=jnp.ones((b, t), bool),
    )


def test_tp_sharded_forward_matches_single_device():
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    args = _forward_args(params)

    ref = np.asarray(forward(params, CFG, **args))

    mesh = make_mesh(dp=2, tp=4)
    sharded_params = shard_params(params, mesh)
    sharded_args = shard_batch(args, mesh)

    out = np.asarray(forward(sharded_params, CFG, **sharded_args))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_params_actually_sharded():
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    mesh = make_mesh(dp=2, tp=4)
    sp = shard_params(params, mesh)
    wq = sp["transformer"]["layers"]["attention"]["wq"]["weight"]
    # (L, out, in) sharded on out over tp=4
    shard_shapes = {tuple(s.data.shape) for s in wq.addressable_shards}
    l, o, i = wq.shape
    assert shard_shapes == {(l, o // 4, i)}


def test_train_step_runs_and_reduces_loss():
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    trainer = Trainer(CFG, params, mesh=None, learning_rate=3e-3)
    batch = synthetic_batch(CFG, jax.random.PRNGKey(1), batch_size=4,
                            t_frames=8)
    losses = []
    for i in range(12):
        m = trainer.step(batch, jax.random.PRNGKey(42))  # fixed noise draw
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_train_step_sharded_matches_unsharded():
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    batch = synthetic_batch(CFG, jax.random.PRNGKey(1), batch_size=4,
                            t_frames=8)
    rng = jax.random.PRNGKey(7)

    loss_single = float(flow_matching_loss(params, CFG, batch, rng))

    mesh = make_mesh(dp=2, tp=4)
    sp = shard_params(params, mesh)
    sb = shard_batch(batch, mesh)
    loss_sharded = float(flow_matching_loss(sp, CFG, sb, rng))
    assert abs(loss_single - loss_sharded) < 1e-4


def test_multichip_train_step_end_to_end():
    mesh = make_mesh(dp=2, tp=4)
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    trainer = Trainer(CFG, params, mesh=mesh, learning_rate=1e-3)
    batch = synthetic_batch(CFG, jax.random.PRNGKey(1), batch_size=4,
                            t_frames=8)
    m1 = trainer.step(batch, jax.random.PRNGKey(2))
    m2 = trainer.step(batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m1["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])
    # params stay sharded across steps
    wq = trainer.state.params["transformer"]["layers"]["attention"]["wq"]["weight"]
    assert len({s.device for s in wq.addressable_shards}) == 8
