"""Golden parity: torch-oracle DAC-VAE weights converted through
checkpoint.convert_dacvae must reproduce encode/decode to fp32 precision —
validates weight-norm folding, Snake, dilated convs, strided convs, and
transposed convs end to end."""

import jax.numpy as jnp
import numpy as np
import torch

from sam_audio_tpu.checkpoint import convert_dacvae
from sam_audio_tpu.config import DACVAEConfig
from sam_audio_tpu.models import dacvae

from torch_dacvae_oracle import DACVAEOracle

CFG = DACVAEConfig(
    encoder_dim=4, encoder_rates=(2, 4), latent_dim=16, decoder_dim=16,
    decoder_rates=(4, 2), codebook_dim=4, sample_rate=8000,
)


def _make():
    torch.manual_seed(0)
    oracle = DACVAEOracle(
        encoder_dim=CFG.encoder_dim, encoder_rates=list(CFG.encoder_rates),
        latent_dim=CFG.latent_dim, decoder_dim=CFG.decoder_dim,
        decoder_rates=list(CFG.decoder_rates), codebook_dim=CFG.codebook_dim,
    ).eval()
    sd = {f"audio_codec.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    params = convert_dacvae(sd, CFG, prefix="audio_codec")
    return oracle, params


def test_encode_parity():
    oracle, params = _make()
    rng = np.random.RandomState(0)
    wav = (rng.randn(2, 1, 67) * 0.3).astype(np.float32)  # non-multiple of hop
    ours = np.asarray(dacvae.encode(params, jnp.asarray(wav), CFG))
    with torch.no_grad():
        theirs = oracle.encode(torch.from_numpy(wav)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_decode_parity():
    oracle, params = _make()
    rng = np.random.RandomState(1)
    z = rng.randn(2, CFG.codebook_dim, 9).astype(np.float32)
    ours = np.asarray(dacvae.decode(params, jnp.asarray(z), CFG))
    with torch.no_grad():
        theirs = oracle.decode(torch.from_numpy(z)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_roundtrip_parity():
    """encode->decode through both stacks: waveform-level agreement <=1e-4
    (the BASELINE.md fidelity gate is 1e-3)."""
    oracle, params = _make()
    rng = np.random.RandomState(2)
    wav = (rng.randn(1, 1, 128) * 0.2).astype(np.float32)
    ours = np.asarray(
        dacvae.decode(params, dacvae.encode(params, jnp.asarray(wav), CFG), CFG)
    )
    with torch.no_grad():
        theirs = oracle.decode(oracle.encode(torch.from_numpy(wav))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
