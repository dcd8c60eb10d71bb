import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import TransformerConfig, tiny_test_config
from sam_audio_tpu.models.dit import dit_apply, dit_init
from sam_audio_tpu.ops import nn as N

CFG = TransformerConfig(
    dim=32, n_heads=4, n_layers=2, dropout=0.5, context_dim=16,
    max_positions=64, frequency_embedding_dim=8, out_channels=6,
    in_channels=None,
)


def test_dropout_op():
    x = jnp.ones((100, 100))
    out = N.dropout(x, 0.5, jax.random.PRNGKey(0))
    kept = np.asarray(out) != 0
    assert 0.3 < kept.mean() < 0.7
    np.testing.assert_allclose(np.asarray(out)[kept], 2.0)  # inverted scaling
    # identity without rng / with rate 0
    np.testing.assert_array_equal(np.asarray(N.dropout(x, 0.5, None)), 1.0)
    np.testing.assert_array_equal(np.asarray(N.dropout(x, 0.0,
                                                       jax.random.PRNGKey(0))),
                                  1.0)


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, 8, CFG.dim).astype(np.float32))
    time = jnp.asarray(rng.rand(2).astype(np.float32))
    memory = jnp.asarray(rng.randn(2, 4, CFG.context_dim).astype(np.float32))
    return x, time, memory


def test_dit_inference_has_no_dropout():
    params = dit_init(jax.random.PRNGKey(0), CFG)
    x, time, memory = _inputs()
    o1 = dit_apply(params, x, time, cfg=CFG, memory=memory)
    o2 = dit_apply(params, x, time, cfg=CFG, memory=memory)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_dit_training_dropout_is_stochastic_and_seeded():
    params = dit_init(jax.random.PRNGKey(0), CFG)
    x, time, memory = _inputs()
    d1 = dit_apply(params, x, time, cfg=CFG, memory=memory,
                   dropout_rng=jax.random.PRNGKey(1))
    d1b = dit_apply(params, x, time, cfg=CFG, memory=memory,
                    dropout_rng=jax.random.PRNGKey(1))
    d2 = dit_apply(params, x, time, cfg=CFG, memory=memory,
                   dropout_rng=jax.random.PRNGKey(2))
    o = dit_apply(params, x, time, cfg=CFG, memory=memory)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1b))
    assert np.abs(np.asarray(d1) - np.asarray(d2)).max() > 1e-5
    assert np.abs(np.asarray(d1) - np.asarray(o)).max() > 1e-5


def test_trainer_with_dropout_config():
    from sam_audio_tpu.models.sam_audio import sam_audio_init
    from sam_audio_tpu.train.flow_matching import Trainer, synthetic_batch

    cfg = tiny_test_config()
    cfg = cfg.__class__(**{
        **{f.name: getattr(cfg, f.name) for f in cfg.__dataclass_fields__.values()},
        "transformer": CFG.__class__(**{**CFG.__dict__, "dim": 32,
                                        "context_dim": 32, "out_channels": 8,
                                        "dropout": 0.1}),
    })
    params = sam_audio_init(jax.random.PRNGKey(0), cfg)
    trainer = Trainer(cfg, params, learning_rate=1e-3)
    batch = synthetic_batch(cfg, jax.random.PRNGKey(1), batch_size=2,
                            t_frames=8)
    m = trainer.step(batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
