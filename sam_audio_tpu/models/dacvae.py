"""DAC-VAE 48 kHz neural codec in JAX.

The reference wraps the external `dacvae` package (facebookresearch), a VAE
variant of the Descript Audio Codec: a Snake-activated conv encoder
(dim 64, rates [2,8,10,12]), a VAE bottleneck (latent 1024 -> in_proj ->
mean/logvar 2x128), and a mirrored transposed-conv decoder (dim 1536, rates
[12,10,8,2]). Reference integration points: sam_audio/model/codec.py:42-109,
sam_audio/model/config.py:10-41.

Architecture (DAC conventions):
  Encoder: WNConv1d(1, d, 7, pad 3)
           -> per rate r: EncoderBlock(d_i -> 2*d_i, stride r)
              = 3x ResidualUnit(dilation 1,3,9) + Snake + WNConv1d(k=2r, s=r,
                pad ceil(r/2))
           -> Snake + WNConv1d(d_final, latent_dim, 3, pad 1)
  VAE:     in_proj Conv1d(latent_dim, 2*codebook_dim, 1) -> (mean, logvar)
           out_proj Conv1d(codebook_dim, latent_dim, 1)
  Decoder: WNConv1d(latent_dim, D, 7, pad 3)
           -> per rate r: Snake + WNConvTranspose1d(k=2r, s=r, pad ceil(r/2))
              + 3x ResidualUnit
           -> Snake + WNConv1d(ch, 1, 7, pad 3) -> tanh

Weight norm is folded into plain weights at checkpoint-conversion time
(ops/conv.fold_weight_norm), so runtime kernels are single matmuls/convs.

Encode/decode keep exact length relations: T_latent = T_wav / hop (hop = 1920),
with the reference's reflect-padding of the waveform to a hop multiple
(reference: codec.py:72-78).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from sam_audio_tpu.config import DACVAEConfig
from sam_audio_tpu.ops import conv as C


# ---------------------------------------------------------------------------
# Residual unit: Snake -> Conv(k7, dil d) -> Snake -> Conv(k1), residual add
# ---------------------------------------------------------------------------


def _residual_unit_init(key, dim, dilation, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "snake1": C.snake_init(dim, dtype),
        "conv1": C.conv1d_init(k1, dim, dim, 7, dtype=dtype),
        "snake2": C.snake_init(dim, dtype),
        "conv2": C.conv1d_init(k2, dim, dim, 1, dtype=dtype),
    }


def _residual_unit_apply(params, x, dilation, compute_dtype=None,
                         use_fused=False):
    if use_fused:
        from sam_audio_tpu.ops.fused_conv import fused_residual_unit

        out = fused_residual_unit(
            params, x, dilation,
            compute_dtype=compute_dtype if compute_dtype is not None else x.dtype,
        )
        if out is not None:
            return out.astype(x.dtype)
    pad = ((7 - 1) * dilation) // 2
    h = C.snake(params["snake1"], x)
    h = C.conv1d(params["conv1"], h, padding=pad, dilation=dilation,
                 compute_dtype=compute_dtype)
    h = C.snake(params["snake2"], h)
    h = C.conv1d(params["conv2"], h, compute_dtype=compute_dtype)
    return x + h


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encoder_init(key, cfg: DACVAEConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 2 + len(cfg.encoder_rates))
    d = cfg.encoder_dim
    p = {"conv_in": C.conv1d_init(ks[0], 1, d, 7, dtype=dtype), "blocks": []}
    for i, stride in enumerate(cfg.encoder_rates):
        d_out = d * 2
        bk = jax.random.split(ks[1 + i], 4)
        block = {
            "res": [
                _residual_unit_init(bk[j], d, dil, dtype)
                for j, dil in enumerate((1, 3, 9))
            ],
            "snake": C.snake_init(d, dtype),
            "conv": C.conv1d_init(bk[3], d, d_out, 2 * stride, dtype=dtype),
        }
        p["blocks"].append(block)
        d = d_out
    p["snake_out"] = C.snake_init(d, dtype)
    p["conv_out"] = C.conv1d_init(ks[-1], d, cfg.latent_dim, 3, dtype=dtype)
    return p


def encoder_apply(params, x, cfg: DACVAEConfig, compute_dtype=None,
                  use_fused=False):
    """x: (B, 1, T) waveform -> (B, latent_dim, T/hop)."""
    h = C.conv1d(params["conv_in"], x, padding=3, compute_dtype=compute_dtype)
    for block, stride in zip(params["blocks"], cfg.encoder_rates):
        for res, dil in zip(block["res"], (1, 3, 9)):
            h = _residual_unit_apply(res, h, dil, compute_dtype, use_fused)
        h = C.snake(block["snake"], h)
        h = C.conv1d(block["conv"], h, stride=stride,
                     padding=math.ceil(stride / 2), compute_dtype=compute_dtype)
    h = C.snake(params["snake_out"], h)
    return C.conv1d(params["conv_out"], h, padding=1, compute_dtype=compute_dtype)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decoder_init(key, cfg: DACVAEConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 2 + len(cfg.decoder_rates))
    d = cfg.decoder_dim
    p = {
        "conv_in": C.conv1d_init(ks[0], cfg.latent_dim, d, 7, dtype=dtype),
        "blocks": [],
    }
    for i, stride in enumerate(cfg.decoder_rates):
        d_out = d // 2
        bk = jax.random.split(ks[1 + i], 4)
        block = {
            "snake": C.snake_init(d, dtype),
            "conv_t": C.conv_transpose1d_init(bk[0], d, d_out, 2 * stride,
                                              dtype=dtype),
            "res": [
                _residual_unit_init(bk[1 + j], d_out, dil, dtype)
                for j, dil in enumerate((1, 3, 9))
            ],
        }
        p["blocks"].append(block)
        d = d_out
    p["snake_out"] = C.snake_init(d, dtype)
    p["conv_out"] = C.conv1d_init(ks[-1], d, 1, 7, dtype=dtype)
    return p


def decoder_apply(params, z, cfg: DACVAEConfig, compute_dtype=None,
                  use_fused=False):
    """z: (B, latent_dim, T) -> (B, 1, T*hop)."""
    h = C.conv1d(params["conv_in"], z, padding=3, compute_dtype=compute_dtype)
    for block, stride in zip(params["blocks"], cfg.decoder_rates):
        h = C.snake(block["snake"], h)
        h = C.conv_transpose1d(block["conv_t"], h, stride=stride,
                               padding=math.ceil(stride / 2),
                               compute_dtype=compute_dtype)
        for res, dil in zip(block["res"], (1, 3, 9)):
            h = _residual_unit_apply(res, h, dil, compute_dtype, use_fused)
    h = C.snake(params["snake_out"], h)
    h = C.conv1d(params["conv_out"], h, padding=3, compute_dtype=compute_dtype)
    return jnp.tanh(h)


# ---------------------------------------------------------------------------
# Full codec (encoder + VAE projections + decoder)
# ---------------------------------------------------------------------------


def dacvae_init(key, cfg: DACVAEConfig, dtype=jnp.float32, with_decoder=True):
    ks = jax.random.split(key, 4)
    p = {
        "encoder": encoder_init(ks[0], cfg, dtype),
        "in_proj": C.conv1d_init(ks[1], cfg.latent_dim, 2 * cfg.codebook_dim, 1,
                                 dtype=dtype),
    }
    if with_decoder:
        p["out_proj"] = C.conv1d_init(ks[2], cfg.codebook_dim, cfg.latent_dim, 1,
                                      dtype=dtype)
        p["decoder"] = decoder_init(ks[3], cfg, dtype)
    return p


def pad_to_hop(wav: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Reflect-pad the waveform so its length is a hop multiple
    (reference: sam_audio/model/codec.py:72-78). Static-shape friendly: the
    amount depends only on the (static) input length."""
    length = wav.shape[-1]
    rem = length % hop_length
    if rem == 0:
        return wav
    return C.pad1d(wav, (0, hop_length - rem), mode="reflect")


def encode(params, wav: jnp.ndarray, cfg: DACVAEConfig, compute_dtype=None,
           use_fused: Optional[bool] = None):
    """wav: (B, 1, T) -> mean latents (B, codebook_dim, ceil(T/hop)).

    Matches DACVAEEncoder.forward (reference: codec.py:65-70): encoder output
    -> in_proj -> take the mean half of (mean, logvar).
    """
    if use_fused is None:
        # The fused res-unit kernel (ops/fused_conv.py) wins ~2x standalone
        # but in the full decoder XLA's cross-op fusion already reaches the
        # same efficiency and Pallas boundaries add layout copies (measured
        # 245 ms XLA vs 257 ms fused for a full B=8 decode) — keep opt-in.
        use_fused = False
    z = encoder_apply(params["encoder"], pad_to_hop(wav, cfg.hop_length), cfg,
                      compute_dtype, use_fused)
    moments = C.conv1d(params["in_proj"], z, compute_dtype=compute_dtype)
    # NOTE: cfg.mean/std are config-schema fields the reference SOURCE never
    # applies anywhere in its separation pipeline (codec.py:65-70 is the raw
    # in_proj mean; model.py consumes it unnormalized) — so neither do we.
    return moments[:, : cfg.codebook_dim]


def decode(params, encoded: jnp.ndarray, cfg: DACVAEConfig, compute_dtype=None,
           use_fused: Optional[bool] = None):
    """encoded: (B, codebook_dim, T) -> wav (B, 1, T*hop).

    Matches DACVAE.decode (reference: codec.py:86-89).
    """
    if use_fused is None:
        use_fused = False  # see encode()
    # cfg.mean/std intentionally unapplied — see encode()
    emb = C.conv1d(params["out_proj"], encoded, compute_dtype=compute_dtype)
    return decoder_apply(params["decoder"], emb, cfg, compute_dtype, use_fused)


# ---------------------------------------------------------------------------
# Frame/sample index math (reference: sam_audio/model/codec.py:91-109)
# ---------------------------------------------------------------------------


def feature_idx_to_wav_idx(feature_idx, hop_length: int, sample_rate: int,
                           orig_sample_rate=None):
    orig = sample_rate if orig_sample_rate is None else orig_sample_rate
    wav_chunklen = feature_idx * hop_length * (orig / sample_rate)
    if isinstance(feature_idx, (int, float)):
        return int(wav_chunklen)
    return wav_chunklen.astype(jnp.int32) if hasattr(wav_chunklen, "astype") else int(wav_chunklen)


def wav_idx_to_feature_idx(wav_idx, hop_length: int, sample_rate: int,
                           orig_sample_rate=None):
    orig = sample_rate if orig_sample_rate is None else orig_sample_rate
    if isinstance(wav_idx, (int, float)):
        target_length = math.ceil(sample_rate * wav_idx / orig)
        return int(math.ceil(target_length / hop_length))
    target_length = jnp.ceil(sample_rate * wav_idx / orig)
    return jnp.ceil(target_length / hop_length).astype(jnp.int32)
