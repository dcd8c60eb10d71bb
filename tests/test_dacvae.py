import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import DACVAEConfig
from sam_audio_tpu.models import dacvae

CFG = DACVAEConfig(
    encoder_dim=4, encoder_rates=(2, 4), latent_dim=16, decoder_dim=16,
    decoder_rates=(4, 2), codebook_dim=4, sample_rate=8000,
)


def test_hop_length():
    assert CFG.hop_length == 8
    assert DACVAEConfig().hop_length == 1920


def test_encode_decode_shapes():
    params = dacvae.dacvae_init(jax.random.PRNGKey(0), CFG)
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 1, 64).astype(np.float32))
    lat = dacvae.encode(params, wav, CFG)
    assert lat.shape == (2, CFG.codebook_dim, 64 // CFG.hop_length)
    out = dacvae.decode(params, lat, CFG)
    assert out.shape == (2, 1, 64)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh output


def test_encode_pads_to_hop_multiple():
    params = dacvae.dacvae_init(jax.random.PRNGKey(0), CFG)
    wav = jnp.asarray(np.random.RandomState(1).randn(1, 1, 61).astype(np.float32))
    lat = dacvae.encode(params, wav, CFG)
    # ceil(61/8) = 8 frames
    assert lat.shape == (1, CFG.codebook_dim, 8)


def test_encoder_locality():
    """Zero-padding the tail of silence must not change early latent frames
    much: conv receptive field is finite."""
    params = dacvae.dacvae_init(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(2)
    wav1 = np.zeros((1, 1, 256), np.float32)
    wav1[..., :64] = rng.randn(64)
    wav2 = wav1.copy()
    wav2[..., 192:] = rng.randn(64)  # change far-away samples
    lat1 = np.asarray(dacvae.encode(params, jnp.asarray(wav1), CFG))
    lat2 = np.asarray(dacvae.encode(params, jnp.asarray(wav2), CFG))
    np.testing.assert_allclose(lat1[..., :4], lat2[..., :4], atol=1e-4)


def test_index_math_matches_reference():
    # reference codec.py:91-109 with hop 1920 @48k
    assert dacvae.wav_idx_to_feature_idx(48000, 1920, 48000) == 25
    assert dacvae.wav_idx_to_feature_idx(1, 1920, 48000) == 1
    assert dacvae.wav_idx_to_feature_idx(1921, 1920, 48000) == 2
    assert dacvae.feature_idx_to_wav_idx(25, 1920, 48000) == 48000
    # tensor path
    out = dacvae.wav_idx_to_feature_idx(jnp.asarray([1920, 1921]), 1920, 48000)
    np.testing.assert_array_equal(np.asarray(out), [1, 2])


def test_decoder_exact_length_multiplication():
    params = dacvae.dacvae_init(jax.random.PRNGKey(1), CFG)
    z = jnp.asarray(np.random.RandomState(3).randn(1, CFG.codebook_dim, 5)
                    .astype(np.float32))
    out = dacvae.decode(params, z, CFG)
    assert out.shape[-1] == 5 * CFG.hop_length


def test_full_rates_shape_smoke():
    """Production rates [2,8,10,12] with tiny dims: 1920x length relation."""
    cfg = DACVAEConfig(encoder_dim=2, encoder_rates=(2, 8, 10, 12), latent_dim=8,
                       decoder_dim=16, decoder_rates=(12, 10, 8, 2), codebook_dim=4)
    params = dacvae.dacvae_init(jax.random.PRNGKey(2), cfg)
    wav = jnp.zeros((1, 1, 2 * 1920))
    lat = dacvae.encode(params, wav, cfg)
    assert lat.shape == (1, 4, 2)
    out = dacvae.decode(params, lat, cfg)
    assert out.shape == (1, 1, 2 * 1920)


def test_mean_std_config_fields_are_inert():
    """The reference source never applies DACVAEConfig.mean/std anywhere in
    its separation pipeline (codec.py:65-89 is the raw in_proj/out_proj
    path; model.py consumes latents unnormalized) — so a config carrying
    non-default values must not change our codec's behavior either."""
    import dataclasses

    params = dacvae.dacvae_init(jax.random.PRNGKey(0), CFG)
    cfg_shifted = dataclasses.replace(CFG, mean=3.0, std=2.0)
    wav = jnp.asarray(np.random.RandomState(1).randn(1, 1, 64).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(dacvae.encode(params, wav, CFG)),
        np.asarray(dacvae.encode(params, wav, cfg_shifted)),
    )
    z = jnp.asarray(np.random.RandomState(2).randn(1, CFG.codebook_dim, 8)
                    .astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(dacvae.decode(params, z, CFG)),
        np.asarray(dacvae.decode(params, z, cfg_shifted)),
    )
