"""Audiobox-aesthetics-style predictor: 4 quality axes from a waveform.

The reference's Aesthetic eval metric wraps the external
`audiobox_aesthetics.infer.AesPredictor` producing CE / CU / PC / PQ scores
(reference: eval/metrics/aes.py:6-49). This is a TPU-native stand-in with the
same interface: mel frontend -> transformer encoder -> masked mean -> 4-way
head, with per-axis output normalization params (loadable from a converted
checkpoint via checkpoint.load_params).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import PEAVTransformerConfig
from sam_audio_tpu.models.peav import peav_apply, peav_init
from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops.mel import mel_spectrogram

AXES = ("CE", "CU", "PC", "PQ")


@dataclass(frozen=True)
class AestheticsConfig:
    sample_rate: int = 16_000
    n_fft: int = 400
    hop_length: int = 160
    n_mels: int = 64
    hidden: int = 256
    layers: int = 4
    heads: int = 4
    max_seconds: float = 10.0


def aesthetics_init(key, cfg: AestheticsConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    tf = PEAVTransformerConfig(hidden_size=cfg.hidden, num_layers=cfg.layers,
                               num_heads=cfg.heads)
    return {
        "mel_proj": N.linear_init(ks[0], cfg.n_mels, cfg.hidden, dtype=dtype),
        "transformer": peav_init(ks[1], tf, dtype),
        "head": N.linear_init(ks[2], cfg.hidden, 4, dtype=dtype),
        "mean": jnp.full((4,), 5.0, dtype),  # axes live on a ~1-10 scale
        "std": jnp.ones((4,), dtype),
    }


def aesthetics_forward(params, cfg: AestheticsConfig, wav: jnp.ndarray,
                       compute_dtype=None) -> jnp.ndarray:
    """wav: (B, T) at cfg.sample_rate -> (B, 4) scores."""
    mel = mel_spectrogram(wav, sample_rate=cfg.sample_rate, n_fft=cfg.n_fft,
                          hop_length=cfg.hop_length, n_mels=cfg.n_mels)
    mel = jnp.log(jnp.maximum(mel, 1e-10))
    h = N.linear(params["mel_proj"], mel, compute_dtype)
    tf = PEAVTransformerConfig(hidden_size=cfg.hidden, num_layers=cfg.layers,
                               num_heads=cfg.heads)
    out = peav_apply(params["transformer"], h, tf, compute_dtype=compute_dtype)
    scores = N.linear(params["head"], out.pooler_output, compute_dtype)
    return scores.astype(jnp.float32) * params["std"].astype(jnp.float32) + \
        params["mean"].astype(jnp.float32)


class AesPredictor:
    def __init__(self, cfg: AestheticsConfig, params):
        self.cfg = cfg
        self.params = params

    @classmethod
    def init_random(cls, key, cfg: AestheticsConfig = AestheticsConfig()):
        return cls(cfg, aesthetics_init(key, cfg))

    @classmethod
    def from_pretrained(cls, checkpoint_path: str,
                        cfg: AestheticsConfig = AestheticsConfig()):
        from sam_audio_tpu.checkpoint import load_params

        return cls(cfg, load_params(checkpoint_path))

    def __call__(self, wavs: Sequence[np.ndarray],
                 sample_rate: int) -> List[dict]:
        from sam_audio_tpu.ops.resample import resample_np

        max_t = int(self.cfg.max_seconds * self.cfg.sample_rate)
        rows = []
        for w in wavs:
            w = np.asarray(w, np.float32).reshape(-1)
            if sample_rate != self.cfg.sample_rate:
                w = resample_np(w, sample_rate, self.cfg.sample_rate)
            rows.append(w[:max_t])
        tmax = max(r.shape[-1] for r in rows)
        batch = np.zeros((len(rows), tmax), np.float32)
        for i, r in enumerate(rows):
            batch[i, : r.shape[-1]] = r
        scores = np.asarray(
            aesthetics_forward(self.params, self.cfg, jnp.asarray(batch))
        )
        return [dict(zip(AXES, row.tolist())) for row in scores]
