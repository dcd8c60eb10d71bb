import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import TransformerConfig
from sam_audio_tpu.models.dit import dit_apply, dit_init

CFG = TransformerConfig(
    dim=32, n_heads=4, n_layers=3, dropout=0.0, context_dim=16,
    max_positions=64, frequency_embedding_dim=8, out_channels=6,
    in_channels=None,
)


def _inputs(b=2, t=10, l=5, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, t, CFG.dim).astype(np.float32)
    time = rng.rand(b).astype(np.float32)
    memory = rng.randn(b, l, CFG.context_dim).astype(np.float32)
    pad_mask = np.ones((b, t), bool)
    pad_mask[1, 7:] = False
    mem_mask = np.ones((b, l), bool)
    mem_mask[0, 3:] = False
    return (jnp.asarray(x), jnp.asarray(time), jnp.asarray(memory),
            jnp.asarray(pad_mask), jnp.asarray(mem_mask))


def test_dit_shapes_and_determinism():
    params = dit_init(jax.random.PRNGKey(0), CFG)
    x, time, memory, pad, mem = _inputs()
    out1 = dit_apply(params, x, time, cfg=CFG, padding_mask=pad, memory=memory,
                     memory_padding_mask=mem)
    out2 = dit_apply(params, x, time, cfg=CFG, padding_mask=pad, memory=memory,
                     memory_padding_mask=mem)
    assert out1.shape == (2, 10, CFG.out_channels)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_dit_memory_mask_blocks_padded_text():
    """Changing text features at masked positions must not change the output."""
    params = dit_init(jax.random.PRNGKey(0), CFG)
    x, time, memory, pad, mem = _inputs()
    out1 = dit_apply(params, x, time, cfg=CFG, padding_mask=pad, memory=memory,
                     memory_padding_mask=mem)
    memory2 = np.asarray(memory).copy()
    memory2[0, 3:] += 100.0  # masked positions for item 0
    out2 = dit_apply(params, x, time, cfg=CFG, padding_mask=pad,
                     memory=jnp.asarray(memory2), memory_padding_mask=mem)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_dit_time_conditioning_changes_output():
    params = dit_init(jax.random.PRNGKey(0), CFG)
    x, time, memory, pad, mem = _inputs()
    out1 = dit_apply(params, x, time, cfg=CFG, memory=memory)
    out2 = dit_apply(params, x, time + 0.5, cfg=CFG, memory=memory)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-4


def test_dit_jit_compiles_once_per_shape():
    params = dit_init(jax.random.PRNGKey(1), CFG)
    x, time, memory, pad, mem = _inputs()

    from functools import partial

    traces = []

    @partial(jax.jit, static_argnames=("cfg",))
    def f(params, x, time, memory, cfg):
        traces.append(1)
        return dit_apply(params, x, time, cfg=cfg, memory=memory)

    f(params, x, time, memory, CFG)
    f(params, x, time + 0.1, memory, CFG)
    assert len(traces) == 1


def test_dit_bf16_compute_close_to_fp32():
    params = dit_init(jax.random.PRNGKey(2), CFG)
    x, time, memory, pad, mem = _inputs()
    out32 = np.asarray(dit_apply(params, x, time, cfg=CFG, memory=memory))
    outbf = np.asarray(
        dit_apply(params, x, time, cfg=CFG, memory=memory,
                  compute_dtype=jnp.bfloat16).astype(jnp.float32)
    )
    # bf16 has ~3 decimal digits; outputs are O(1)
    assert np.abs(out32 - outbf).max() < 0.25
    assert np.abs(out32 - outbf).mean() < 0.05


def test_scan_over_layers_matches_python_loop():
    """The stacked-params lax.scan must equal applying layers sequentially."""
    from sam_audio_tpu.models.dit import dit_block_apply, patcher_apply
    from sam_audio_tpu.ops import nn as N
    from sam_audio_tpu.ops.rope import precompute_rope

    params = dit_init(jax.random.PRNGKey(3), CFG)
    x, time, memory, pad, mem = _inputs()

    out_scan = dit_apply(params, x, time, cfg=CFG, padding_mask=pad,
                         memory=memory, memory_padding_mask=mem)

    # manual forward with a python loop over unstacked layers
    h = patcher_apply(params["x_embedder"], jnp.swapaxes(x, 1, 2))
    h = jnp.swapaxes(h, 1, 2)
    t = N.timestep_embedder(params["t_embedder"], time,
                            CFG.frequency_embedding_dim, CFG.timestep_non_linearity)
    t0 = N.linear(params["t_block"], jax.nn.silu(t))
    y = N.projection(params["y_embedder"]["projection"], memory,
                     CFG.context_non_linearity)
    rope_tables = precompute_rope(CFG.head_dim, h.shape[1],
                                  max(10000, 2 * CFG.max_positions))
    for i in range(CFG.n_layers):
        layer = jax.tree_util.tree_map(lambda a: a[i], params["layers"])
        h = dit_block_apply(layer, h, cfg=CFG, cross_x=y, t0=t0,
                            padding_mask=pad, memory_padding_mask=mem,
                            rope_tables=rope_tables)
    shift, scale = (
        params["final_layer_scale_shift_table"][None] + t[:, None]
    ).swapaxes(0, 1)
    h = N.rmsnorm(params["norm"], h, CFG.norm_eps)
    h = N.modulate(h, shift[:, None, :], scale[:, None, :])
    out_manual = N.linear(params["output"], h)

    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_manual),
                               rtol=1e-5, atol=1e-5)

def test_layer_scan_unroll_is_exact(monkeypatch):
    """`unroll` only changes XLA scheduling freedom, never results — both the
    explicit argument and the SAM_AUDIO_SCAN_UNROLL env default."""
    params = dit_init(jax.random.PRNGKey(0), CFG)
    x, time, memory, pad, mem = _inputs()
    base = dit_apply(params, x, time, cfg=CFG, padding_mask=pad,
                     memory=memory, memory_padding_mask=mem)
    for unroll in (2, 3):  # non-divisor and full unroll of n_layers=3
        out = dit_apply(params, x, time, cfg=CFG, padding_mask=pad,
                        memory=memory, memory_padding_mask=mem,
                        unroll=unroll)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(out))
    monkeypatch.setenv("SAM_AUDIO_SCAN_UNROLL", "2")
    out = dit_apply(params, x, time, cfg=CFG, padding_mask=pad,
                    memory=memory, memory_padding_mask=mem)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))
