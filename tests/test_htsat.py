"""HTSAT (CLAP audio tower) parity vs the key-faithful torch swin oracle,
plus converter coverage (every laion-style key consumed)."""

import numpy as np
import torch

import jax.numpy as jnp

from torch_htsat_oracle import HTSATOracle, default_tiny_melw

from sam_audio_tpu.models.htsat import (
    HTSATConfig,
    bicubic_resize_1d,
    convert_htsat_state_dict,
    htsat_embed,
    htsat_init,
)

TINY = HTSATConfig(
    sample_rate=8000, n_fft=512, hop_length=400, n_mels=16, fmin=50.0,
    fmax=3500.0, spec_size=64, patch_size=4, embed_dim=16, depths=(2, 2),
    num_heads=(2, 4), window_size=4,
)


def _oracle(seed=0):
    torch.manual_seed(seed)
    melw = default_tiny_melw()
    oracle = HTSATOracle(melw).eval()
    with torch.no_grad():  # non-trivial BN stats to catch conversion slips
        oracle.bn0.running_mean.uniform_(-2.0, 2.0)
        oracle.bn0.running_var.uniform_(0.5, 2.0)
        oracle.bn0.weight.uniform_(0.8, 1.2)
        oracle.bn0.bias.uniform_(-0.2, 0.2)
    return oracle


def test_bicubic_matches_torch_align_corners():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, 21, 16).astype(np.float32)
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), (256, 16), mode="bicubic",
            align_corners=True
        ).numpy()
    ours = np.asarray(bicubic_resize_1d(jnp.asarray(x), 256, axis=2))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_htsat_embedding_parity_vs_oracle():
    oracle = _oracle()
    sd = {f"audio_branch.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    params, consumed = convert_htsat_state_dict(sd, TINY,
                                                prefix="audio_branch.")
    assert consumed == set(sd), sorted(set(sd) - consumed)

    rng = np.random.RandomState(1)
    wav = (0.5 * rng.randn(2, 8000)).astype(np.float32).clip(-1, 1)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(wav)).numpy()
    ours = np.asarray(htsat_embed(params, TINY, jnp.asarray(wav)))
    assert ref.shape == ours.shape == (2, 32)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_htsat_random_init_runs():
    import jax

    params = htsat_init(jax.random.PRNGKey(0), TINY)
    wav = jnp.zeros((1, 8000), jnp.float32)
    emb = htsat_embed(params, TINY, wav)
    assert emb.shape == (1, 32)
    assert np.isfinite(np.asarray(emb)).all()


def test_params_survive_npz_roundtrip(tmp_path):
    """Digit-keyed structures must round-trip through flatten/unflatten
    (save_params listifies digit-string dict keys — params use real lists)."""
    import jax

    from sam_audio_tpu.checkpoint import load_params, save_params
    from sam_audio_tpu.models.htsat import HTSATConfig, htsat_embed, htsat_init

    cfg = HTSATConfig(sample_rate=8000, n_fft=128, hop_length=64, n_mels=16,
                      spec_size=64, patch_size=4, embed_dim=8,
                      depths=(1, 1), num_heads=(2, 2), window_size=4)
    params = htsat_init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "htsat.npz")
    save_params(path, params)
    reloaded = load_params(path)
    wav = jax.numpy.asarray(
        np.random.RandomState(0).randn(2, 2000).astype(np.float32))
    ref = np.asarray(htsat_embed(params, cfg, wav))
    out = np.asarray(htsat_embed(reloaded, cfg, wav))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
