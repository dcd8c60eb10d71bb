"""Fused Pallas residual-unit kernel vs the plain XLA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.models.dacvae import _residual_unit_apply, _residual_unit_init
from sam_audio_tpu.ops.fused_conv import fused_residual_unit


def _params(c, seed=0):
    return _residual_unit_init(jax.random.PRNGKey(seed), c, 1)


def test_fused_matches_plain_dilation1():
    c, t = 16, 256
    params = _params(c)
    x = jnp.asarray(np.random.RandomState(0).randn(2, c, t).astype(np.float32))
    plain = _residual_unit_apply(params, x, 1)
    fused = fused_residual_unit(params, x, 1, compute_dtype=jnp.float32,
                                interpret=True)
    assert fused is not None
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=1e-4, atol=1e-4)


def test_fused_matches_plain_dilation9():
    c, t = 8, 512
    params = _params(c, seed=1)
    x = jnp.asarray(np.random.RandomState(1).randn(1, c, t).astype(np.float32))
    plain = _residual_unit_apply(params, x, 9)
    fused = fused_residual_unit(params, x, 9, compute_dtype=jnp.float32,
                                interpret=True)
    assert fused is not None
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=1e-4, atol=1e-4)


def test_fused_bf16_close_to_fp32():
    c, t = 16, 256
    params = _params(c, seed=2)
    x = jnp.asarray(np.random.RandomState(2).randn(1, c, t).astype(np.float32))
    plain = np.asarray(_residual_unit_apply(params, x, 3))
    fused = np.asarray(
        fused_residual_unit(params, x, 3, compute_dtype=jnp.bfloat16,
                            interpret=True).astype(jnp.float32)
    )
    assert np.abs(plain - fused).max() < 0.1
    # relative error in bf16 territory
    assert np.abs(plain - fused).mean() / (np.abs(plain).mean() + 1e-9) < 0.02


def test_fused_returns_none_for_untileable_shapes():
    c, t = 12, 100  # c not multiple of 8 / t has no 128-divisor tiling
    params = _params(c, seed=3)
    x = jnp.zeros((1, c, t))
    assert fused_residual_unit(params, x, 1, interpret=True) is None


def test_decoder_with_fused_path_matches():
    from sam_audio_tpu.config import DACVAEConfig
    from sam_audio_tpu.models import dacvae

    cfg = DACVAEConfig(encoder_dim=8, encoder_rates=(2, 4), latent_dim=16,
                       decoder_dim=32, decoder_rates=(4, 2), codebook_dim=8,
                       sample_rate=8000)
    params = dacvae.dacvae_init(jax.random.PRNGKey(0), cfg)
    z = jnp.asarray(np.random.RandomState(4).randn(1, 8, 32).astype(np.float32))
    plain = np.asarray(dacvae.decode(params, z, cfg, use_fused=False))
    # interpret=None resolves to interpret mode on CPU automatically
    fused = np.asarray(dacvae.decode(params, z, cfg, use_fused=True))
    np.testing.assert_allclose(fused, plain, rtol=1e-3, atol=1e-4)
