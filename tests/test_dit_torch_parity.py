"""Golden parity: converted torch-oracle DiT weights through our JAX DiT must
reproduce the torch forward to ~fp32 precision. Validates the checkpoint
converter (head-split permutation) and every DiT op end to end."""

import jax.numpy as jnp
import numpy as np
import torch

from sam_audio_tpu.checkpoint import convert_dit
from sam_audio_tpu.config import TransformerConfig
from sam_audio_tpu.models.dit import dit_apply

from torch_dit_oracle import DiTOracle


def test_dit_full_parity_vs_torch_oracle():
    torch.manual_seed(0)
    dim, n_heads, n_layers, context_dim, out_ch = 32, 4, 3, 16, 6
    cfg = TransformerConfig(
        dim=dim, n_heads=n_heads, n_layers=n_layers, dropout=0.0,
        context_dim=context_dim, max_positions=64, frequency_embedding_dim=8,
        out_channels=out_ch, in_channels=None,
    )
    oracle = DiTOracle(dim, n_heads, n_layers, context_dim, out_ch,
                       cfg.ffn_hidden_dim, max_positions=64, freq_dim=8).eval()

    sd = {f"transformer.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    params = convert_dit(sd, cfg, prefix="transformer")

    rng = np.random.RandomState(0)
    b, t, l = 2, 12, 5
    x = rng.randn(b, t, dim).astype(np.float32)
    time = rng.rand(b).astype(np.float32)
    memory = rng.randn(b, l, context_dim).astype(np.float32)
    pad = np.ones((b, t), bool)
    pad[1, 9:] = False
    mem_mask = np.ones((b, l), bool)
    mem_mask[0, 3:] = False

    ours = np.asarray(
        dit_apply(params, jnp.asarray(x), jnp.asarray(time), cfg=cfg,
                  padding_mask=jnp.asarray(pad), memory=jnp.asarray(memory),
                  memory_padding_mask=jnp.asarray(mem_mask))
    )
    with torch.no_grad():
        theirs = oracle(
            torch.from_numpy(x), torch.from_numpy(time),
            padding_mask=torch.from_numpy(pad), memory=torch.from_numpy(memory),
            memory_padding_mask=torch.from_numpy(mem_mask),
        ).numpy()

    # compare valid (non-padded) positions
    np.testing.assert_allclose(ours[pad], theirs[pad], rtol=1e-4, atol=1e-4)


def test_head_permutation_is_load_bearing():
    """Converting WITHOUT the head permutation must NOT match — guards against
    silently-wrong converters."""
    torch.manual_seed(1)
    dim, n_heads = 32, 4
    cfg = TransformerConfig(
        dim=dim, n_heads=n_heads, n_layers=1, dropout=0.0, context_dim=16,
        max_positions=64, frequency_embedding_dim=8, out_channels=6,
        in_channels=None,
    )
    oracle = DiTOracle(dim, n_heads, 1, 16, 6, cfg.ffn_hidden_dim,
                       max_positions=64, freq_dim=8).eval()
    sd = {f"transformer.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    params = convert_dit(sd, cfg, prefix="transformer")

    # break the permutation on wq of layer 0 (undo it)
    from sam_audio_tpu.checkpoint import permute_attention_heads

    w = np.asarray(params["layers"]["attention"]["wq"]["weight"][0])
    d = dim // n_heads
    unpermuted = w.reshape(n_heads, d, dim).transpose(1, 0, 2).reshape(dim, dim)
    bad = jnp.asarray(unpermuted)[None]
    params_bad = params.copy()
    import jax

    params_bad = jax.tree_util.tree_map(lambda a: a, params)
    params_bad["layers"]["attention"]["wq"]["weight"] = bad

    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, dim).astype(np.float32)
    time = rng.rand(1).astype(np.float32)
    memory = rng.randn(1, 4, 16).astype(np.float32)

    good = np.asarray(dit_apply(params, jnp.asarray(x), jnp.asarray(time),
                                cfg=cfg, memory=jnp.asarray(memory)))
    broken = np.asarray(dit_apply(params_bad, jnp.asarray(x), jnp.asarray(time),
                                  cfg=cfg, memory=jnp.asarray(memory)))
    assert np.abs(good - broken).max() > 1e-4
