"""CLAP (contrastive language-audio pretraining) towers in JAX.

Capability parity with the reference's LAION-CLAP ranker (reference:
sam_audio/ranking/clap.py:11-86): the audio branch reproduces laion_clap's
feature pipeline — resample to 48 kHz, int16 quantization roundtrip, 10 s
repeat-pad / center-truncate, 64-bin mel (n_fft 1024, hop 480, 50-14000 Hz) —
followed by a patch-transformer audio tower (HTSAT role); the text branch is
a RoBERTa-role bidirectional transformer with CLS pooling. Both project to a
shared embedding space; the ranker scores cosine(audio_i_k, text_i).

The towers are structural equivalents designed TPU-first (single scan'd
transformer stack per tower); converting original LAION-CLAP weights requires
an HTSAT-specific key map, planned once checkpoints are available on-host.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import PEAVTransformerConfig
from sam_audio_tpu.models.peav import peav_apply, peav_init
from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops.mel import mel_spectrogram


@dataclass(frozen=True)
class ClapConfig:
    sample_rate: int = 48_000
    duration_s: float = 10.0
    n_fft: int = 1024
    hop_length: int = 480
    n_mels: int = 64
    fmin: float = 50.0
    fmax: float = 14_000.0
    patch_t: int = 4
    patch_f: int = 4
    audio_hidden: int = 256
    audio_layers: int = 4
    audio_heads: int = 4
    text_vocab: int = 50_265
    text_hidden: int = 256
    text_layers: int = 4
    text_heads: int = 4
    max_text_len: int = 512
    embed_dim: int = 512

    @property
    def n_samples(self) -> int:
        return int(self.duration_s * self.sample_rate)


def clap_init(key, cfg: ClapConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    audio_tf = PEAVTransformerConfig(hidden_size=cfg.audio_hidden,
                                     num_layers=cfg.audio_layers,
                                     num_heads=cfg.audio_heads)
    text_tf = PEAVTransformerConfig(hidden_size=cfg.text_hidden,
                                    num_layers=cfg.text_layers,
                                    num_heads=cfg.text_heads)
    return {
        "audio": {
            "patch_embed": N.linear_init(
                ks[0], cfg.patch_t * cfg.patch_f, cfg.audio_hidden, dtype=dtype
            ),
            "transformer": peav_init(ks[1], audio_tf, dtype),
            "proj": N.linear_init(ks[2], cfg.audio_hidden, cfg.embed_dim,
                                  dtype=dtype),
        },
        "text": {
            "tok_embed": N.embedding_init(ks[3], cfg.text_vocab,
                                          cfg.text_hidden, dtype=dtype),
            "transformer": peav_init(ks[4], text_tf, dtype),
            "proj": N.linear_init(ks[5], cfg.text_hidden, cfg.embed_dim,
                                  dtype=dtype),
        },
        "logit_scale": jnp.asarray(np.log(1 / 0.07), dtype),
    }


def quantize_roundtrip(wav: jnp.ndarray) -> jnp.ndarray:
    """laion_clap's int16 quantization roundtrip (reference clap.py:50-57)."""
    q = jnp.clip(wav, -1.0, 1.0)
    q = (q * 32767.0).astype(jnp.int16)
    return q.astype(jnp.float32) / 32767.0


def fit_duration(wav: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Repeat-pad short audio / center-truncate long audio to n_samples
    (laion_clap 'repeatpad' + eval-time truncation). wav: (B, T)."""
    t = wav.shape[-1]
    if t < n_samples:
        reps = int(np.ceil(n_samples / t))
        wav = jnp.tile(wav, (1, reps))
        t = wav.shape[-1]
    if t > n_samples:
        start = (t - n_samples) // 2
        wav = jax.lax.dynamic_slice_in_dim(wav, start, n_samples, axis=-1)
    return wav


def fit_duration_np(wav: np.ndarray, n_samples: int) -> np.ndarray:
    """Per-row numpy variant for host batching of variable-length audio:
    repeat-pads each waveform's TRUE length (not a zero-padded row), matching
    laion_clap's per-file pipeline. wav: (T,)."""
    wav = np.asarray(wav, np.float32).reshape(-1)
    t = wav.shape[-1]
    if t == 0:
        return np.zeros(n_samples, np.float32)
    if t < n_samples:
        wav = np.tile(wav, int(np.ceil(n_samples / t)))
        t = wav.shape[-1]
    if t > n_samples:
        start = (t - n_samples) // 2
        wav = wav[start : start + n_samples]
    return wav


def clap_audio_embed(params, cfg: ClapConfig, wav: jnp.ndarray,
                     compute_dtype=None) -> jnp.ndarray:
    """wav: (B, T) at cfg.sample_rate -> (B, embed_dim) L2-normalized."""
    wav = quantize_roundtrip(fit_duration(wav, cfg.n_samples))
    mel = mel_spectrogram(
        wav, sample_rate=cfg.sample_rate, n_fft=cfg.n_fft,
        hop_length=cfg.hop_length, n_mels=cfg.n_mels, fmin=cfg.fmin,
        fmax=cfg.fmax, mel_scale="htk",
    )  # (B, F, M)
    mel = jnp.log(jnp.maximum(mel, 1e-10))
    b, f, m = mel.shape
    f_t = (f // cfg.patch_t) * cfg.patch_t
    mel = mel[:, :f_t].reshape(b, f_t // cfg.patch_t, cfg.patch_t,
                               m // cfg.patch_f, cfg.patch_f)
    patches = mel.transpose(0, 1, 3, 2, 4).reshape(
        b, -1, cfg.patch_t * cfg.patch_f
    )
    if compute_dtype is not None:
        patches = patches.astype(compute_dtype)
    h = N.linear(params["audio"]["patch_embed"], patches, compute_dtype)
    audio_tf = PEAVTransformerConfig(hidden_size=cfg.audio_hidden,
                                     num_layers=cfg.audio_layers,
                                     num_heads=cfg.audio_heads)
    out = peav_apply(params["audio"]["transformer"], h, audio_tf,
                     compute_dtype=compute_dtype)
    emb = N.linear(params["audio"]["proj"], out.pooler_output, compute_dtype)
    emb = emb.astype(jnp.float32)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)


def clap_text_embed(params, cfg: ClapConfig, input_ids, attention_mask,
                    compute_dtype=None) -> jnp.ndarray:
    h = N.embedding(params["text"]["tok_embed"], input_ids)
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
    text_tf = PEAVTransformerConfig(hidden_size=cfg.text_hidden,
                                    num_layers=cfg.text_layers,
                                    num_heads=cfg.text_heads)
    out = peav_apply(params["text"]["transformer"], h, text_tf,
                     padding_mask=attention_mask.astype(bool),
                     compute_dtype=compute_dtype)
    emb = N.linear(params["text"]["proj"], out.last_hidden_state[:, 0],
                   compute_dtype)
    emb = emb.astype(jnp.float32)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)


class ClapModel:
    def __init__(self, cfg: ClapConfig, params, tokenizer=None):
        self.cfg = cfg
        self.params = params
        self._tokenizer = tokenizer

    @classmethod
    def init_random(cls, key, cfg: ClapConfig = ClapConfig(), tokenizer=None):
        return cls(cfg, clap_init(key, cfg), tokenizer)

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

            self._tokenizer = ByteFallbackTokenizer(self.cfg.text_vocab)
        return self._tokenizer

    def get_audio_embedding(self, wavs: jnp.ndarray) -> jnp.ndarray:
        return clap_audio_embed(self.params, self.cfg, wavs)

    def get_text_embedding(self, texts) -> jnp.ndarray:
        ids, mask = self.tokenizer(texts, max_length=self.cfg.max_text_len)
        return clap_text_embed(self.params, self.cfg, jnp.asarray(ids),
                               jnp.asarray(mask))
