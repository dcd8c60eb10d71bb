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
from sam_audio_tpu.ops.mel import kaldi_fbank

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


def clip_start_times(duration_s: float, clip_duration_s: float,
                     num_clips: int) -> np.ndarray:
    """pytorchvideo ConstantClipsPerVideoSampler timepoints: starts spaced by
    max(duration - clip_duration, 0) / num_clips (NOT /(n-1)), one per clip
    (reference imagebind.py:46-66 via imagebind.data.get_clip_timepoints)."""
    max_start = max(duration_s - clip_duration_s, 0.0)
    return np.arange(num_clips) * (max_start / num_clips)


def audio_to_melclips(wav: np.ndarray, cfg: ImageBindConfig) -> np.ndarray:
    """(T,) 16 kHz -> (num_clips, target_frames, n_mels) normalized log-mel.

    Faithful to imagebind.data.waveform2melspec (reference
    imagebind.py:67-86): per clip, subtract the waveform mean, Kaldi fbank
    (hanning window, htk_compat, dither=0), pad/trim the *frame* axis to
    target_length with zeros, then Normalize(mean=-4.268, std=9.138) — the
    padded frames therefore normalize to +mean/std, exactly like the
    reference (short final clips are mel-padded, not waveform-padded)."""
    sr = cfg.sample_rate
    t = wav.shape[-1]
    clip_len = int(cfg.clip_duration_s * sr)
    starts = clip_start_times(t / sr, cfg.clip_duration_s, cfg.num_audio_clips)
    out = []
    for s in starts:
        clip = wav[int(s * sr): int((s + cfg.clip_duration_s) * sr)]
        if clip.shape[-1] == 0:
            clip = np.zeros((min(t, clip_len) or clip_len,), wav.dtype)
        clip = clip - clip.mean()
        fb = kaldi_fbank(clip, sample_frequency=sr, num_mel_bins=cfg.n_mels,
                         frame_length=25.0, frame_shift=10.0,
                         window_type="hanning")  # (frames, mels)
        f = fb.shape[0]
        if f < cfg.target_frames:
            fb = np.pad(fb, ((0, cfg.target_frames - f), (0, 0)))
        else:
            fb = fb[: cfg.target_frames]
        out.append(fb)
    clips = np.stack(out)  # (num_clips, target_frames, n_mels)
    return ((clips - AUDIO_MEAN) / AUDIO_STD).astype(np.float32)


def audio_to_melclips_jax(wav: jnp.ndarray, cfg: ImageBindConfig) -> jnp.ndarray:
    """Jittable batched `audio_to_melclips`: (B, T) device array at
    cfg.sample_rate with static T -> (B, num_clips, target_frames, n_mels).

    Same clip slicing (static start times from the static duration), per-clip
    mean removal, Kaldi fbank, frame-axis zero pad/trim, and Normalize as the
    numpy path — so candidate waveforms can be scored without leaving the
    device (the reference runs imagebind.data.waveform2melspec on host,
    sam_audio/ranking/imagebind.py:67-86)."""
    from sam_audio_tpu.ops.mel import kaldi_fbank_jax

    b, t = wav.shape
    sr = cfg.sample_rate
    clip_len = int(cfg.clip_duration_s * sr)
    starts = clip_start_times(t / sr, cfg.clip_duration_s, cfg.num_audio_clips)
    out = []
    for s in starts:
        clip = wav[:, int(s * sr): int((s + cfg.clip_duration_s) * sr)]
        if clip.shape[-1] == 0:
            clip = jnp.zeros((b, min(t, clip_len) or clip_len), wav.dtype)
        clip = clip - jnp.mean(clip, axis=-1, keepdims=True)
        fb = kaldi_fbank_jax(clip, sample_frequency=sr,
                             num_mel_bins=cfg.n_mels, frame_length=25.0,
                             frame_shift=10.0, window_type="hanning")
        f = fb.shape[-2]
        if f < cfg.target_frames:
            fb = jnp.pad(fb, ((0, 0), (0, cfg.target_frames - f), (0, 0)))
        else:
            fb = fb[:, : cfg.target_frames]
        out.append(fb)
    clips = jnp.stack(out, axis=1)
    return (clips - AUDIO_MEAN) / AUDIO_STD


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



def _bilinear_resize_np(x: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """(N, C, H, W) float32 bilinear resize in pure numpy (half-pixel
    centers, same convention as jax.image.resize/torch align_corners=False).
    Host preprocessing must not dispatch device programs (CLAUDE.md: host
    code touches numpy only; un-jitted device calls pay ~25 ms relay RTT)."""
    n, c, h, w = x.shape

    def axis_weights(out_len, in_len):
        pos = (np.arange(out_len, dtype=np.float64) + 0.5) * in_len / out_len - 0.5
        lo = np.floor(pos).astype(np.int64)
        frac = (pos - lo).astype(np.float32)
        lo0 = np.clip(lo, 0, in_len - 1)
        lo1 = np.clip(lo + 1, 0, in_len - 1)
        return lo0, lo1, frac

    y0, y1, fy = axis_weights(nh, h)
    x0, x1, fx = axis_weights(nw, w)
    rows = x[:, :, y0] * (1.0 - fy)[None, None, :, None] + \
        x[:, :, y1] * fy[None, None, :, None]
    out = rows[:, :, :, x0] * (1.0 - fx)[None, None, None, :] + \
        rows[:, :, :, x1] * fx[None, None, None, :]
    return out.astype(np.float32)


def video_to_clips(frames: np.ndarray, cfg: ImageBindConfig) -> np.ndarray:
    """(N, C, H, W) -> (num_clips, C, S, S): short-side scale to S + center
    crop, clips sampled evenly in time (3-crop reduced to center for
    determinism; reference uses 3 spatial crops averaged)."""
    n = frames.shape[0]
    idx = np.linspace(0, max(n - 1, 0), cfg.num_video_clips).astype(int)
    sel = np.asarray(frames[idx], np.float32)
    c, h, w = sel.shape[1:]
    s = cfg.image_size
    scale = s / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    sel = _bilinear_resize_np(sel, nh, nw)
    top = (nh - s) // 2
    left = (nw - s) // 2
    sel = sel[:, :, top : top + s, left : left + s]
    return sel / 255.0


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


# ---------------------------------------------------------------------------
# imagebind_huge weight-compatible executors (reference ranking/imagebind.py:23
# loads imagebind_model.imagebind_huge(pretrained=True))
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ImageBindHugeConfig:
    """Architecture of the published imagebind_huge audio+vision branches.
    Block switches (layer scale, bias_kv, pre-LN) are carried by the weights
    themselves (sniffed at conversion)."""

    audio_dim: int = 768
    audio_layers: int = 12
    audio_heads: int = 12
    audio_kernel: int = 16
    audio_stride: int = 10
    n_mels: int = 128
    target_frames: int = 204
    vision_dim: int = 1280
    vision_layers: int = 32
    vision_heads: int = 16
    vision_patch: int = 14
    vision_frames: int = 2  # PadIm2Video repeats a still image 2x
    image_size: int = 224
    embed_dim: int = 1024
    ln_eps: float = 1e-6


def _branch_apply(params, cfg_tf, tokens, compute_dtype=None):
    """cls + pos -> trunk (canonical PEAV blocks) -> head LN -> cls select ->
    head linear -> L2 normalize. tokens: (B, N, D)."""
    from sam_audio_tpu.models.peav import peav_apply

    b = tokens.shape[0]
    if "stem_norm" in params:
        tokens = N.layernorm(params["stem_norm"], tokens, 1e-6)
    cls = jnp.broadcast_to(params["cls_token"].reshape(1, 1, -1),
                           (b, 1, tokens.shape[-1])).astype(tokens.dtype)
    x = jnp.concatenate([cls, tokens], axis=1)
    pos = params["pos_embed"].reshape(1, -1, x.shape[-1])
    assert pos.shape[1] == x.shape[1], (pos.shape, x.shape)
    x = x + pos.astype(x.dtype)
    if "pre_ln" in params:
        x = N.layernorm(params["pre_ln"], x, 1e-6)
    out = peav_apply(params["trunk"], x, cfg_tf, compute_dtype=compute_dtype)
    h = N.layernorm(params["head_norm"], out.last_hidden_state, 1e-6)
    # normalization happens AFTER the clip-mean (imagebind_model.forward
    # reduces the clip axis before the Normalize postprocessor)
    return N.linear(params["head_proj"], h[:, 0], None).astype(jnp.float32)


def imagebind_encode_audio(params, cfg: ImageBindHugeConfig, melclips,
                           compute_dtype=None):
    """melclips: (B, clips, F, M) normalized log-mel -> (B, embed) normalized.
    imagebind treats the mel as a (1, M, F) image: Conv2d k=16 s=10 stem."""
    from sam_audio_tpu.config import PEAVTransformerConfig

    b, c, f, m = melclips.shape
    img = melclips.reshape(b * c, 1, f, m).transpose(0, 1, 3, 2)  # (B*, 1, M, F)
    if compute_dtype is not None:
        img = img.astype(compute_dtype)
    x = jax.lax.conv_general_dilated(
        img, params["audio"]["stem"]["weight"].astype(img.dtype),
        window_strides=(cfg.audio_stride, cfg.audio_stride), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in params["audio"]["stem"]:
        x = x + params["audio"]["stem"]["bias"].astype(x.dtype)[
            None, :, None, None]
    bb, d, gh, gw = x.shape
    tokens = x.reshape(bb, d, gh * gw).transpose(0, 2, 1)
    tf = PEAVTransformerConfig(hidden_size=cfg.audio_dim,
                               num_layers=cfg.audio_layers,
                               num_heads=cfg.audio_heads, pos="none",
                               act="gelu", layer_norm_eps=cfg.ln_eps)
    emb = _branch_apply(params["audio"], tf, tokens, compute_dtype)
    emb = emb.reshape(b, c, -1).mean(axis=1)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                             1e-8)


def imagebind_encode_vision(params, cfg: ImageBindHugeConfig, clips,
                            compute_dtype=None):
    """clips: (B, n, 3, T, S, S) or (B, n, 3, S, S) normalized clips ->
    (B, embed). T-frame clips feed the Conv3d stem directly; still frames
    (T==1 or missing) are repeated to vision_frames (PadIm2Video 'repeat')."""
    from sam_audio_tpu.config import PEAVTransformerConfig

    if clips.ndim == 5:
        clips = clips[:, :, :, None]
    b, n, ch, tf, s, _ = clips.shape
    x = clips.reshape(b * n, ch, tf, s, s)
    if tf < cfg.vision_frames:
        assert tf == 1, (tf, cfg.vision_frames)
        x = jnp.broadcast_to(x, (b * n, ch, cfg.vision_frames, s, s))
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    w = params["vision"]["stem"]["weight"]  # (D, 3, T, P, P)
    x = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(cfg.vision_frames, cfg.vision_patch, cfg.vision_patch),
        padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    if "bias" in params["vision"]["stem"]:
        x = x + params["vision"]["stem"]["bias"].astype(x.dtype)[
            None, :, None, None, None]
    bb, d = x.shape[:2]
    tokens = x.reshape(bb, d, -1).transpose(0, 2, 1)
    tf = PEAVTransformerConfig(hidden_size=cfg.vision_dim,
                               num_layers=cfg.vision_layers,
                               num_heads=cfg.vision_heads, pos="none",
                               act="gelu", layer_norm_eps=cfg.ln_eps)
    emb = _branch_apply(params["vision"], tf, tokens, compute_dtype)
    emb = emb.reshape(b, n, -1).mean(axis=1)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                             1e-8)


VIDEO_MEAN = (0.48145466, 0.4578275, 0.40821073)
VIDEO_STD = (0.26862954, 0.26130258, 0.27577711)


def video_to_frame_clips(frames: np.ndarray, num_clips: int = 5,
                         frames_per_clip: int = 2, size: int = 224,
                         num_crops: int = 1) -> np.ndarray:
    """Reference VideoTransform (imagebind.py:89-150): sample `num_clips`
    temporal clips of `frames_per_clip` frames, /255 + CLIP-stats normalize,
    short-side scale to `size`, spatial crops (1=center; 3=left/center/right).
    frames: (N, 3, H, W) -> (num_clips*num_crops, 3, frames_per_clip, S, S)."""
    n = frames.shape[0]
    bounds = np.linspace(0, n, num_clips + 1)
    clip_sets = []
    for ci in range(num_clips):
        lo, hi = int(np.floor(bounds[ci])), max(int(np.ceil(bounds[ci + 1])), 1)
        hi = max(hi, lo + 1)
        idx = np.linspace(lo, hi - 1, frames_per_clip).astype(int).clip(0, n - 1)
        clip_sets.append(frames[idx])  # (T, 3, H, W)
    clips = np.stack(clip_sets).astype(np.float32) / 255.0
    mean = np.asarray(VIDEO_MEAN, np.float32)[None, None, :, None, None]
    std = np.asarray(VIDEO_STD, np.float32)[None, None, :, None, None]
    clips = (clips - mean) / std
    nc, t, c, h, w = clips.shape
    scale = size / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    clips = _bilinear_resize_np(
        clips.reshape(nc * t, c, h, w), nh, nw
    ).reshape(nc, t, c, nh, nw)
    crops = []
    if num_crops == 1:
        offsets = [((nh - size) // 2, (nw - size) // 2)]
    else:  # 3 crops along the long side
        if nh >= nw:
            offsets = [(0, 0), ((nh - size) // 2, 0), (nh - size, 0)]
        else:
            offsets = [(0, 0), (0, (nw - size) // 2), (0, nw - size)]
    for top, left in offsets:
        crops.append(clips[:, :, :, top : top + size, left : left + size])
    out = np.concatenate(crops, axis=0)  # (nc*crops, T, 3, S, S)
    return out.transpose(0, 2, 1, 3, 4)  # (nc*crops, 3, T, S, S)


def imagebind_huge_init(key, cfg: ImageBindHugeConfig = None,
                        dtype=jnp.float32, scale: float = 0.02):
    """Random params in the converted-imagebind_huge layout (benchmarks and
    tests; real weights come from `convert_imagebind_state_dict`). Matches
    the published branch structure: audio trunk blocks carry torch-MHA
    bias_kv and layer-scale and the stem has a norm; the vision trunk is
    plain pre-LN with a trunk-level pre_transformer LayerNorm."""
    from sam_audio_tpu.config import PEAVTransformerConfig
    from sam_audio_tpu.models.peav import _layer_init

    cfg = cfg or ImageBindHugeConfig()
    ks = iter(jax.random.split(key, 16))

    def trunk(k, dim, layers, heads, bias_kv, layer_scale):
        tf = PEAVTransformerConfig(hidden_size=dim, num_layers=layers,
                                   num_heads=heads, pos="none", act="gelu",
                                   layer_norm_eps=cfg.ln_eps)

        def one(lk):
            p = _layer_init(lk, tf, dtype)
            if bias_kv:
                k1, k2 = jax.random.split(lk)
                p["attn"]["bias_k"] = (
                    jax.random.normal(k1, (dim,), dtype) * scale)
                p["attn"]["bias_v"] = (
                    jax.random.normal(k2, (dim,), dtype) * scale)
            if layer_scale:
                p["ls1"] = jnp.full((dim,), 1e-4, dtype)
                p["ls2"] = jnp.full((dim,), 1e-4, dtype)
            return p

        return {"layers": jax.vmap(one)(jax.random.split(k, layers))}

    def ln(dim):
        return {"weight": jnp.ones((dim,), dtype),
                "bias": jnp.zeros((dim,), dtype)}

    gh = (cfg.n_mels - cfg.audio_kernel) // cfg.audio_stride + 1
    gw = (cfg.target_frames - cfg.audio_kernel) // cfg.audio_stride + 1
    g = cfg.image_size // cfg.vision_patch
    audio = {
        "stem": {"weight": jax.random.normal(
            next(ks), (cfg.audio_dim, 1, cfg.audio_kernel, cfg.audio_kernel),
            dtype) * scale},
        "stem_norm": ln(cfg.audio_dim),
        "cls_token": jax.random.normal(
            next(ks), (1, 1, cfg.audio_dim), dtype) * scale,
        "pos_embed": jax.random.normal(
            next(ks), (1, gh * gw + 1, cfg.audio_dim), dtype) * scale,
        "trunk": trunk(next(ks), cfg.audio_dim, cfg.audio_layers,
                       cfg.audio_heads, bias_kv=True, layer_scale=True),
        "head_norm": ln(cfg.audio_dim),
        "head_proj": {"weight": jax.random.normal(
            next(ks), (cfg.embed_dim, cfg.audio_dim), dtype) * scale},
    }
    vision = {
        "stem": {"weight": jax.random.normal(
            next(ks), (cfg.vision_dim, 3, cfg.vision_frames,
                       cfg.vision_patch, cfg.vision_patch), dtype) * scale},
        "cls_token": jax.random.normal(
            next(ks), (1, 1, cfg.vision_dim), dtype) * scale,
        "pos_embed": jax.random.normal(
            next(ks), (1, g * g + 1, cfg.vision_dim), dtype) * scale,
        "pre_ln": ln(cfg.vision_dim),
        "trunk": trunk(next(ks), cfg.vision_dim, cfg.vision_layers,
                       cfg.vision_heads, bias_kv=False, layer_scale=False),
        "head_norm": ln(cfg.vision_dim),
        "head_proj": {"weight": jax.random.normal(
            next(ks), (cfg.embed_dim, cfg.vision_dim), dtype) * scale},
    }
    return {"audio": audio, "vision": vision}


_audio_embed_jit_cache = {}


def _audio_embed_from_wav(params, rows, *, variant, cfg, pipeline, sr_in,
                          compute_dtype=None):
    """One jitted device program: resample to the pipeline rate -> mel clips
    -> audio tower -> normalized embedding. `variant` picks the huge
    (weight-faithful) or light (structural) tower executor."""
    if "fn" not in _audio_embed_jit_cache:
        from functools import partial

        from sam_audio_tpu.ops.resample import resample

        @partial(jax.jit, static_argnames=("variant", "cfg", "pipeline",
                                           "sr_in", "compute_dtype"))
        def _embed(params, rows, *, variant, cfg, pipeline, sr_in,
                   compute_dtype=None):
            if sr_in != pipeline.sample_rate:
                rows = resample(rows.astype(jnp.float32), sr_in,
                                pipeline.sample_rate)
            mels = audio_to_melclips_jax(rows, pipeline)
            if variant == "huge":
                return imagebind_encode_audio(params, cfg, mels, compute_dtype)
            return encode_audio(params, cfg, mels, compute_dtype)

        _audio_embed_jit_cache["fn"] = _embed
    return _audio_embed_jit_cache["fn"](params, rows, variant=variant,
                                        cfg=cfg, pipeline=pipeline,
                                        sr_in=sr_in,
                                        compute_dtype=compute_dtype)


class ImageBindHugeModel:
    """Weight-faithful imagebind_huge audio<->vision scorer."""

    def __init__(self, cfg: ImageBindHugeConfig, params,
                 pipeline: ImageBindConfig = None):
        self.cfg = cfg
        self.params = params
        self.pipeline = pipeline or ImageBindConfig()

    @classmethod
    def from_torch_checkpoint(cls, path: str,
                              cfg: ImageBindHugeConfig = None):
        from sam_audio_tpu.checkpoint import _load_torch_state_dict

        cfg = cfg or ImageBindHugeConfig()
        sd = _load_torch_state_dict(path)
        params, unconverted, _ = convert_imagebind_state_dict(sd, cfg)
        if unconverted:
            raise ValueError(f"unconverted imagebind keys: {unconverted[:10]}")
        return cls(cfg, params)

    @classmethod
    def init_random(cls, key, cfg: ImageBindHugeConfig = None,
                    pipeline: ImageBindConfig = None):
        cfg = cfg or ImageBindHugeConfig()
        return cls(cfg, imagebind_huge_init(key, cfg), pipeline)

    def embed_audio_device(self, rows: jnp.ndarray, sample_rate: int):
        """(B, T) device waveforms (static T, no padding) -> (B, embed_dim)
        without a host round-trip; one jitted program per shape."""
        return _audio_embed_from_wav(self.params, rows, variant="huge",
                                     cfg=self.cfg, pipeline=self.pipeline,
                                     sr_in=int(sample_rate))

    def embed_audio(self, wavs: Sequence[np.ndarray], sample_rate: int):
        from sam_audio_tpu.ops.resample import resample_np

        mels = []
        for w in wavs:
            w = np.asarray(w, np.float32).reshape(-1)
            if sample_rate != self.pipeline.sample_rate:
                w = resample_np(w, sample_rate, self.pipeline.sample_rate)
            mels.append(audio_to_melclips(w, self.pipeline))
        return imagebind_encode_audio(self.params, self.cfg,
                                      jnp.asarray(np.stack(mels)))

    def embed_videos(self, videos: Sequence[np.ndarray], num_crops: int = 3):
        clips = np.stack([
            video_to_frame_clips(np.asarray(v), size=self.cfg.image_size,
                                 frames_per_clip=self.cfg.vision_frames,
                                 num_crops=num_crops)
            for v in videos
        ])
        return imagebind_encode_vision(self.params, self.cfg,
                                       jnp.asarray(clips))


def convert_imagebind_state_dict(sd, cfg: ImageBindHugeConfig):
    """imagebind_huge state_dict -> params for the audio + vision branches.
    Consumes preprocessors (conv stem, cls, pos table, optional stem norm),
    trunks (via the layout-sniffing PE-AV converter: torch-MHA in_proj +
    bias_kv, norm_1/norm_2, layer_scale_gamma), heads (LN + Linear), and
    postprocessor scales. Other modalities (text/depth/thermal/imu) are
    outside the reference's use and reported in `skipped`.
    Returns (params, unconverted, skipped)."""
    import numpy as onp

    from sam_audio_tpu.checkpoint import convert_peav_tower

    sd = {k: onp.asarray(v) for k, v in sd.items()}
    consumed = set()

    def g(k):
        consumed.add(k)
        return jnp.asarray(sd[k])

    def maybe_ln(params, slot, base):
        if f"{base}.weight" in sd:
            params[slot] = {"weight": g(f"{base}.weight"),
                            "bias": g(f"{base}.bias")}

    params = {}
    for modality, tf_cfg in (("audio", None), ("vision", None)):
        pre = f"modality_preprocessors.{modality}"
        trunk_prefix = f"modality_trunks.{modality}."
        branch = {}
        # stem conv: PatchEmbedGeneric proj is a Sequential; the conv index
        # varies (audio proj.0, vision proj.1 after PadIm2Video)
        for idx in (0, 1, 2):
            key = f"{pre}.rgbt_stem.proj.{idx}.weight"
            if key in sd:
                branch["stem"] = {"weight": g(key)}
                if f"{pre}.rgbt_stem.proj.{idx}.bias" in sd:
                    branch["stem"]["bias"] = g(f"{pre}.rgbt_stem.proj.{idx}.bias")
                break
        if "stem" not in branch:
            raise ValueError(f"no patch stem for {modality}")
        maybe_ln(branch, "stem_norm", f"{pre}.rgbt_stem.norm_layer")
        branch["cls_token"] = g(f"{pre}.cls_token")
        branch["pos_embed"] = g(f"{pre}.pos_embedding_helper.pos_embed")

        from sam_audio_tpu.config import PEAVTransformerConfig

        dim = cfg.audio_dim if modality == "audio" else cfg.vision_dim
        heads = cfg.audio_heads if modality == "audio" else cfg.vision_heads
        layers = cfg.audio_layers if modality == "audio" else cfg.vision_layers
        tower, arch, left = convert_peav_tower(
            sd, trunk_prefix,
            PEAVTransformerConfig(hidden_size=dim, num_layers=layers,
                                  num_heads=heads, pos="none", act="gelu"),
        )
        # trunk-level pre-LN (SimpleTransformer pre_transformer_layer.0)
        pre_ln_key = f"modality_trunks.{modality}.pre_transformer_layer.0"
        maybe_ln(branch, "pre_ln", pre_ln_key)
        left = [k for k in left if not k.startswith(pre_ln_key)]
        branch["trunk"] = tower
        consumed |= {k for k in sd if k.startswith(trunk_prefix)} - set(left)

        head = f"modality_heads.{modality}"
        branch["head_norm"] = {"weight": g(f"{head}.0.weight"),
                               "bias": g(f"{head}.0.bias")}
        branch["head_proj"] = {"weight": g(f"{head}.2.weight")}
        if f"{head}.2.bias" in sd:
            branch["head_proj"]["bias"] = g(f"{head}.2.bias")
        for k in list(sd):
            if k.startswith(f"modality_postprocessors.{modality}"):
                consumed.add(k)  # Normalize/LogitScaling: cancels in cosine
        params[modality] = branch

    def _is_branch_key(k):
        parts = k.split(".")
        return (parts[0] in ("modality_preprocessors", "modality_trunks",
                             "modality_heads", "modality_postprocessors")
                and len(parts) > 1 and parts[1] in ("audio", "vision"))

    skipped = sorted(k for k in sd if not _is_branch_key(k))
    unconverted = sorted(
        k for k in sd if _is_branch_key(k) and k not in consumed
    )
    return params, unconverted, skipped


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

    def embed_audio_device(self, rows: jnp.ndarray, sample_rate: int):
        """(B, T) device waveforms (static T, no padding) -> (B, embed_dim)
        without a host round-trip; one jitted program per shape."""
        return _audio_embed_from_wav(self.params, rows, variant="light",
                                     cfg=self.cfg, pipeline=self.cfg,
                                     sr_in=int(sample_rate))


def load_imagebind_model(checkpoint: str):
    """Load a converted ImageBind .npz, sniffing the layout: conv-stem
    branches (`audio.stem`, from `convert_imagebind_state_dict` /
    `scripts/convert_checkpoint.py imagebind`) run the weight-faithful
    imagebind_huge executors; the structural layout (`audio.patch_embed`)
    runs the light towers."""
    from sam_audio_tpu.checkpoint import load_params

    params = load_params(checkpoint)
    if "stem" in params.get("audio", {}):
        return ImageBindHugeModel(ImageBindHugeConfig(), params)
    return ImageBindModel(ImageBindConfig(), params)
