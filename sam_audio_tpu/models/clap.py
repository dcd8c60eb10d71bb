"""CLAP (contrastive language-audio pretraining) in JAX — exact laion_clap
architecture.

Capability parity with the reference's LAION-CLAP ranker (reference:
sam_audio/ranking/clap.py:11-86, ckpt `lukewys/laion_clap/630k-best.pt`):

  audio: laion_clap feature pipeline — resample to 48 kHz, int16 quantization
  roundtrip, 10 s repeat-pad / truncate (center or seeded rand_trunc) — then
  the HTSAT-tiny swin tower (models/htsat.py) -> `embedding` ->
  audio_projection MLP -> L2 normalize.
  text: RoBERTa-base (models/roberta.py) pooler_output -> text_projection MLP
  -> L2 normalize. Score = audio_emb . text_emb.

Weight-compatible with laion_clap checkpoints via convert_clap_state_dict
(handles the DDP `module.` prefix and the stale position_ids buffer exactly
like reference clap.py:23-27).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.models.htsat import (
    HTSATConfig,
    convert_htsat_state_dict,
    htsat_embed,
    htsat_init,
)
from sam_audio_tpu.models.roberta import (
    RobertaConfig,
    convert_roberta_state_dict,
    roberta_encode,
    roberta_init,
)
from sam_audio_tpu.ops import nn as N


@dataclass(frozen=True)
class ClapConfig:
    # feature pipeline (laion_clap audio_cfg for HTSAT-tiny @48 kHz)
    sample_rate: int = 48_000
    duration_s: float = 10.0
    n_fft: int = 1024
    hop_length: int = 480
    n_mels: int = 64
    fmin: float = 50.0
    fmax: float = 14_000.0
    # HTSAT audio tower (tiny: embed 96, depths 2/2/6/2)
    spec_size: int = 256
    patch_size: int = 4
    audio_embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    audio_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    # RoBERTa text tower (base)
    text_vocab: int = 50_265
    text_hidden: int = 768
    text_layers: int = 12
    text_heads: int = 12
    text_intermediate: int = 3072
    max_text_len: int = 77
    # joint space
    embed_dim: int = 512

    @property
    def n_samples(self) -> int:
        return int(self.duration_s * self.sample_rate)

    @property
    def htsat(self) -> HTSATConfig:
        return HTSATConfig(
            sample_rate=self.sample_rate, n_fft=self.n_fft,
            hop_length=self.hop_length, n_mels=self.n_mels, fmin=self.fmin,
            fmax=self.fmax, spec_size=self.spec_size,
            patch_size=self.patch_size, embed_dim=self.audio_embed_dim,
            depths=self.depths, num_heads=self.audio_heads,
            window_size=self.window_size,
        )

    @property
    def roberta(self) -> RobertaConfig:
        return RobertaConfig(
            vocab_size=self.text_vocab, hidden_size=self.text_hidden,
            num_layers=self.text_layers, num_heads=self.text_heads,
            intermediate_size=self.text_intermediate,
        )


def _mlp_proj_init(key, din, dmid, dout, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": N.linear_init(k1, din, dmid, bias=True, dtype=dtype),
        "fc2": N.linear_init(k2, dmid, dout, bias=True, dtype=dtype),
    }


def _mlp_proj(params, x, compute_dtype=None):
    """laion_clap projection head: Linear -> ReLU -> Linear."""
    return N.linear(
        params["fc2"],
        jax.nn.relu(N.linear(params["fc1"], x, compute_dtype)),
        compute_dtype,
    )


def clap_init(key, cfg: ClapConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    out_dim = cfg.htsat.out_dim
    return {
        "audio_branch": htsat_init(ks[0], cfg.htsat, dtype),
        "text_branch": roberta_init(ks[1], cfg.roberta, dtype),
        "audio_projection": _mlp_proj_init(ks[2], out_dim, cfg.embed_dim,
                                           cfg.embed_dim, dtype),
        "text_projection": _mlp_proj_init(ks[3], cfg.text_hidden,
                                          cfg.embed_dim, cfg.embed_dim, dtype),
        "logit_scale_a": jnp.asarray(np.log(1 / 0.07), dtype),
        "logit_scale_t": jnp.asarray(np.log(1 / 0.07), dtype),
    }


def quantize_roundtrip(wav: jnp.ndarray) -> jnp.ndarray:
    """laion_clap's int16 quantization roundtrip (reference clap.py:50-57)."""
    q = jnp.clip(wav, -1.0, 1.0)
    q = (q * 32767.0).astype(jnp.int16)
    return q.astype(jnp.float32) / 32767.0


def fit_duration(wav: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Repeat-pad short audio / center-truncate long audio to n_samples
    (laion_clap 'repeatpad' + deterministic truncation). wav: (B, T)."""
    t = wav.shape[-1]
    if t < n_samples:
        reps = int(np.ceil(n_samples / t))
        wav = jnp.tile(wav, (1, reps))
        t = wav.shape[-1]
    if t > n_samples:
        start = (t - n_samples) // 2
        wav = jax.lax.dynamic_slice_in_dim(wav, start, n_samples, axis=-1)
    return wav


def fit_duration_np(wav: np.ndarray, n_samples: int,
                    rand_trunc: bool = False,
                    rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Per-row numpy variant for host batching of variable-length audio:
    repeat-pads each waveform's TRUE length (not a zero-padded row), matching
    laion_clap's per-file pipeline. wav: (T,).

    rand_trunc=True reproduces laion_clap's `rand_trunc` data_truncating
    (reference clap.py:58-61: a uniformly random crop of long audio) with a
    seedable RandomState for determinism.
    """
    wav = np.asarray(wav, np.float32).reshape(-1)
    t = wav.shape[-1]
    if t == 0:
        return np.zeros(n_samples, np.float32)
    if t < n_samples:
        wav = np.tile(wav, int(np.ceil(n_samples / t)))
        t = wav.shape[-1]
    if t > n_samples:
        if rand_trunc:
            start = (rng or np.random).randint(0, t - n_samples + 1)
        else:
            start = (t - n_samples) // 2
        wav = wav[start : start + n_samples]
    return wav


def clap_audio_embed(params, cfg: ClapConfig, wav: jnp.ndarray,
                     compute_dtype=None) -> jnp.ndarray:
    """wav: (B, T) at cfg.sample_rate -> (B, embed_dim) L2-normalized."""
    wav = quantize_roundtrip(fit_duration(wav, cfg.n_samples))
    emb = htsat_embed(params["audio_branch"], cfg.htsat, wav, compute_dtype)
    emb = _mlp_proj(params["audio_projection"], emb, compute_dtype)
    emb = emb.astype(jnp.float32)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)


def clap_text_embed(params, cfg: ClapConfig, input_ids, attention_mask,
                    compute_dtype=None) -> jnp.ndarray:
    _, pooled = roberta_encode(params["text_branch"], input_ids,
                               attention_mask, cfg.roberta, compute_dtype)
    emb = _mlp_proj(params["text_projection"], pooled, compute_dtype)
    emb = emb.astype(jnp.float32)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)


def convert_clap_state_dict(sd, cfg: ClapConfig):
    """laion_clap CLAP state_dict -> our params.

    Handles the DDP 'module.' prefix and drops the stale
    text_branch.embeddings.position_ids buffer (reference clap.py:23-27).
    Returns (params, unconverted).
    """
    sd = {k[7:] if k.startswith("module.") else k: np.asarray(v)
          for k, v in sd.items()}
    sd.pop("text_branch.embeddings.position_ids", None)
    consumed = set()

    audio, audio_consumed = convert_htsat_state_dict(sd, cfg.htsat,
                                                     prefix="audio_branch.")
    consumed |= audio_consumed

    text = convert_roberta_state_dict(sd, cfg.roberta, prefix="text_branch.",
                                      consumed=consumed)

    def lin(base):
        consumed.add(f"{base}.weight")
        consumed.add(f"{base}.bias")
        return {"weight": jnp.asarray(sd[f"{base}.weight"]),
                "bias": jnp.asarray(sd[f"{base}.bias"])}

    params = {
        "audio_branch": audio,
        "text_branch": text,
        "audio_projection": {"fc1": lin("audio_projection.0"),
                             "fc2": lin("audio_projection.2")},
        "text_projection": {"fc1": lin("text_projection.0"),
                            "fc2": lin("text_projection.2")},
    }
    for scale in ("logit_scale_a", "logit_scale_t"):
        if scale in sd:
            params[scale] = jnp.asarray(sd[scale])
            consumed.add(scale)
    # text_transform MLP exists in laion_clap's CLAP module but is unused on
    # the roberta text path; keep the weights so nothing is dropped silently.
    extras = {k: jnp.asarray(sd[k]) for k in sd if k.startswith("text_transform.")}
    if extras:
        params["text_transform_unused"] = extras
        consumed |= set(extras)
    unconverted = sorted(k for k in sd if k not in consumed)
    return params, unconverted


class ClapModel:
    def __init__(self, cfg: ClapConfig, params, tokenizer=None,
                 allow_fallback_tokenizer: bool = False):
        self.cfg = cfg
        self.params = params
        self._tokenizer = tokenizer
        # random-init models may tokenize with the hermetic byte fallback;
        # converted checkpoints must resolve a real RoBERTa tokenizer
        self.allow_fallback_tokenizer = allow_fallback_tokenizer

    @classmethod
    def init_random(cls, key, cfg: ClapConfig = ClapConfig(), tokenizer=None):
        return cls(cfg, clap_init(key, cfg), tokenizer,
                   allow_fallback_tokenizer=True)

    @classmethod
    def from_torch_checkpoint(cls, path: str, cfg: ClapConfig = ClapConfig(),
                              tokenizer=None):
        """Load a laion_clap .pt checkpoint (e.g. 630k-best.pt)."""
        from sam_audio_tpu.checkpoint import _load_torch_state_dict

        sd = _load_torch_state_dict(path, key="state_dict")
        params, unconverted = convert_clap_state_dict(sd, cfg)
        if unconverted:
            raise ValueError(f"unconverted CLAP keys: {unconverted[:10]}...")
        return cls(cfg, params, tokenizer)

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            from sam_audio_tpu.text_tokenizer import get_roberta_tokenizer

            self._tokenizer = get_roberta_tokenizer(
                self.cfg.text_vocab,
                allow_fallback=getattr(self, "allow_fallback_tokenizer",
                                       False),
            )
        return self._tokenizer

    def quantize(self):
        """Opt-in int8 serving mode for the scorer: HTSAT + RoBERTa matmuls
        run W8A8 on the MXU (see ops/quant.py). Non-parity; returns self."""
        from sam_audio_tpu.ops.quant import quantize_clap_params

        self.params = quantize_clap_params(self.params)
        return self

    def get_audio_embedding(self, wavs: jnp.ndarray) -> jnp.ndarray:
        return clap_audio_embed(self.params, self.cfg, wavs)

    def get_text_embedding(self, texts) -> jnp.ndarray:
        ids, mask = self.tokenizer(texts, max_length=self.cfg.max_text_len)
        return clap_text_embed(self.params, self.cfg, jnp.asarray(ids),
                               jnp.asarray(mask))
