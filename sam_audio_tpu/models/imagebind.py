"""ImageBind audio+vision towers in JAX (for visual reranking and the eval
metric; reference: sam_audio/ranking/imagebind.py:30-197,
eval/metrics/imagebind.py).

Audio branch (reference imagebind.py:30-86): waveform -> 16 kHz -> 3 clips of
2 s -> per clip 128-bin mel, 204 frames (25 ms window / 10 ms hop, Kaldi-style
fbank) -> normalize (mean -4.268, std 9.138) -> ViT over (time, mel) patches
-> clip-mean embedding.

Vision branch (reference imagebind.py:89-150): frames -> 5 temporal clips ->
short-side scale to 224 + 3 spatial crops -> ViT -> mean over clips/crops.

Score: cosine similarity audio<->video per candidate. Towers are TPU-first
structural equivalents of imagebind_huge (scan'd transformer stacks); loading
original weights needs an imagebind key map once checkpoints are on-host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import PEAVTransformerConfig
from sam_audio_tpu.models.peav import peav_apply, peav_init
from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops.mel import mel_spectrogram

AUDIO_MEAN = -4.268
AUDIO_STD = 9.138


@dataclass(frozen=True)
class ImageBindConfig:
    sample_rate: int = 16_000
    clip_duration_s: float = 2.0
    num_audio_clips: int = 3
    n_mels: int = 128
    target_frames: int = 204
    n_fft: int = 400
    hop_length: int = 160
    audio_patch: int = 16
    audio_hidden: int = 256
    audio_layers: int = 4
    audio_heads: int = 4
    image_size: int = 224
    image_patch: int = 32
    num_video_clips: int = 5
    vision_hidden: int = 256
    vision_layers: int = 4
    vision_heads: int = 4
    embed_dim: int = 512


def imagebind_init(key, cfg: ImageBindConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    audio_tf = PEAVTransformerConfig(hidden_size=cfg.audio_hidden,
                                     num_layers=cfg.audio_layers,
                                     num_heads=cfg.audio_heads)
    vis_tf = PEAVTransformerConfig(hidden_size=cfg.vision_hidden,
                                   num_layers=cfg.vision_layers,
                                   num_heads=cfg.vision_heads)
    p_audio = cfg.audio_patch
    p_img = cfg.image_patch
    return {
        "audio": {
            "patch_embed": N.linear_init(ks[0], p_audio * p_audio,
                                         cfg.audio_hidden, dtype=dtype),
            "transformer": peav_init(ks[1], audio_tf, dtype),
            "proj": N.linear_init(ks[2], cfg.audio_hidden, cfg.embed_dim,
                                  bias=False, dtype=dtype),
        },
        "vision": {
            "patch_embed": N.linear_init(ks[3], 3 * p_img * p_img,
                                         cfg.vision_hidden, dtype=dtype),
            "transformer": peav_init(ks[4], vis_tf, dtype),
            "proj": N.linear_init(ks[5], cfg.vision_hidden, cfg.embed_dim,
                                  bias=False, dtype=dtype),
        },
    }


def audio_to_melclips(wav: np.ndarray, cfg: ImageBindConfig) -> np.ndarray:
    """(T,) 16 kHz -> (num_clips, target_frames, n_mels) normalized log-mel
    (reference imagebind.py:30-86)."""
    clip_len = int(cfg.clip_duration_s * cfg.sample_rate)
    t = wav.shape[-1]
    if t < clip_len:
        wav = np.pad(wav, (0, clip_len - t))
        t = clip_len
    starts = np.linspace(0, t - clip_len, cfg.num_audio_clips).astype(int)
    clips = np.stack([wav[s : s + clip_len] for s in starts])
    mel = mel_spectrogram(
        jnp.asarray(clips), sample_rate=cfg.sample_rate, n_fft=cfg.n_fft,
        hop_length=cfg.hop_length, n_mels=cfg.n_mels, fmin=0.0,
        mel_scale="htk",
    )
    logmel = jnp.log(jnp.maximum(mel, 1e-10))
    f = logmel.shape[1]
    if f < cfg.target_frames:
        logmel = jnp.pad(logmel, ((0, 0), (0, cfg.target_frames - f), (0, 0)))
    else:
        logmel = logmel[:, : cfg.target_frames]
    return np.asarray((logmel - AUDIO_MEAN) / AUDIO_STD)


def encode_audio(params, cfg: ImageBindConfig, melclips: jnp.ndarray,
                 compute_dtype=None) -> jnp.ndarray:
    """melclips: (B, clips, F, M) -> (B, embed_dim) normalized."""
    b, c, f, m = melclips.shape
    p = cfg.audio_patch
    f_t = (f // p) * p
    m_t = (m // p) * p
    x = melclips[:, :, :f_t, :m_t].reshape(b * c, f_t // p, p, m_t // p, p)
    patches = x.transpose(0, 1, 3, 2, 4).reshape(b * c, -1, p * p)
    if compute_dtype is not None:
        patches = patches.astype(compute_dtype)
    h = N.linear(params["audio"]["patch_embed"], patches, compute_dtype)
    tf = PEAVTransformerConfig(hidden_size=cfg.audio_hidden,
                               num_layers=cfg.audio_layers,
                               num_heads=cfg.audio_heads)
    out = peav_apply(params["audio"]["transformer"], h, tf,
                     compute_dtype=compute_dtype)
    emb = N.linear(params["audio"]["proj"], out.pooler_output, compute_dtype)
    emb = emb.astype(jnp.float32).reshape(b, c, -1).mean(axis=1)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)


def video_to_clips(frames: np.ndarray, cfg: ImageBindConfig) -> np.ndarray:
    """(N, C, H, W) -> (num_clips, C, S, S): short-side scale to S + center
    crop, clips sampled evenly in time (3-crop reduced to center for
    determinism; reference uses 3 spatial crops averaged)."""
    n = frames.shape[0]
    idx = np.linspace(0, max(n - 1, 0), cfg.num_video_clips).astype(int)
    sel = jnp.asarray(frames[idx], jnp.float32)
    c, h, w = sel.shape[1:]
    s = cfg.image_size
    scale = s / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    sel = jax.image.resize(sel, (sel.shape[0], c, nh, nw), method="bilinear")
    top = (nh - s) // 2
    left = (nw - s) // 2
    sel = sel[:, :, top : top + s, left : left + s]
    return np.asarray(sel / 255.0)


def encode_vision(params, cfg: ImageBindConfig, clips: jnp.ndarray,
                  compute_dtype=None) -> jnp.ndarray:
    """clips: (B, clips, 3, S, S) -> (B, embed_dim) normalized."""
    b, c, ch, s, _ = clips.shape
    p = cfg.image_patch
    g = s // p
    x = clips.reshape(b * c, ch, g, p, g, p)
    patches = x.transpose(0, 2, 4, 1, 3, 5).reshape(b * c, g * g, ch * p * p)
    if compute_dtype is not None:
        patches = patches.astype(compute_dtype)
    h = N.linear(params["vision"]["patch_embed"], patches, compute_dtype)
    tf = PEAVTransformerConfig(hidden_size=cfg.vision_hidden,
                               num_layers=cfg.vision_layers,
                               num_heads=cfg.vision_heads)
    out = peav_apply(params["vision"]["transformer"], h, tf,
                     compute_dtype=compute_dtype)
    emb = N.linear(params["vision"]["proj"], out.pooler_output, compute_dtype)
    emb = emb.astype(jnp.float32).reshape(b, c, -1).mean(axis=1)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)


class ImageBindModel:
    def __init__(self, cfg: ImageBindConfig, params):
        self.cfg = cfg
        self.params = params

    @classmethod
    def init_random(cls, key, cfg: ImageBindConfig = ImageBindConfig()):
        return cls(cfg, imagebind_init(key, cfg))

    def embed_audio(self, wavs: Sequence[np.ndarray], sample_rate: int):
        from sam_audio_tpu.ops.resample import resample_np

        mels = []
        for w in wavs:
            w = np.asarray(w, np.float32).reshape(-1)
            if sample_rate != self.cfg.sample_rate:
                w = resample_np(w, sample_rate, self.cfg.sample_rate)
            mels.append(audio_to_melclips(w, self.cfg))
        return encode_audio(self.params, self.cfg, jnp.asarray(np.stack(mels)))

    def embed_videos(self, videos: Sequence[np.ndarray]):
        clips = np.stack([video_to_clips(np.asarray(v), self.cfg)
                          for v in videos])
        return encode_vision(self.params, self.cfg, jnp.asarray(clips))
