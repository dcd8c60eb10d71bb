"""HTSAT (Hierarchical Token-Semantic Audio Transformer) in JAX — the CLAP
audio tower.

laion_clap's audio branch for amodel="HTSAT-tiny" (reference:
sam_audio/ranking/clap.py:14, checkpoint keys `audio_branch.*`): a swin
transformer over a log-mel "image". Pipeline (HTS-AT paper / laion_clap
htsat.py semantics):

  wav (10 s @48 kHz) -> STFT (n_fft 1024, hop 480, periodic hann, reflect
  center pad) -> power -> mel 64 (slaney, checkpoint `logmel_extractor.melW`)
  -> 10*log10 -> BatchNorm over mel bins (bn0, eval stats) -> reshape_wav2img:
  bicubic time-resize (align_corners) to spec_size*freq_ratio frames, then
  fold freq_ratio time-chunks along the frequency axis into a
  (spec_size, spec_size) image -> 4x4 conv patch embed -> 4 swin stages
  (window attention w/ relative position bias, shifted windows, patch
  merging) -> LayerNorm -> mean over tokens = the CLAP `embedding` (the
  token-semantic freq-fold in the original code is mean-invariant).

Weight-compatible with laion_clap checkpoints via convert_htsat_state_dict;
parity-tested against a key-faithful torch swin oracle.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops.mel import mel_filterbank, stft_power


@dataclass(frozen=True)
class HTSATConfig:
    sample_rate: int = 48_000
    n_fft: int = 1024
    hop_length: int = 480
    n_mels: int = 64
    fmin: float = 50.0
    fmax: float = 14_000.0
    spec_size: int = 256
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    num_classes: int = 527
    bn_eps: float = 1e-5
    ln_eps: float = 1e-5

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.n_mels

    @property
    def out_dim(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


# ---------------------------------------------------------------------------
# torch-equivalent bicubic interpolation (align_corners=True, A=-0.75)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=8)
def _bicubic_weights(in_len: int, out_len: int):
    """Per-output gather indices (out,4) and kernel weights (out,4)."""
    a = -0.75
    if out_len == 1 or in_len == 1:
        src = np.zeros(out_len)
    else:
        src = np.arange(out_len) * (in_len - 1) / (out_len - 1)
    x0 = np.floor(src).astype(np.int64)
    frac = src - x0

    def k(t):
        at = np.abs(t)
        return np.where(
            at <= 1,
            (a + 2) * at**3 - (a + 3) * at**2 + 1,
            np.where(at < 2, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a,
                     0.0),
        )

    offs = np.arange(-1, 3)
    idx = np.clip(x0[:, None] + offs[None, :], 0, in_len - 1)
    w = k(frac[:, None] - offs[None, :])
    return idx, w.astype(np.float32)


def bicubic_resize_1d(x: jnp.ndarray, out_len: int, axis: int) -> jnp.ndarray:
    """torch F.interpolate(mode='bicubic', align_corners=True) along one axis."""
    in_len = x.shape[axis]
    if in_len == out_len:
        return x
    idx, w = _bicubic_weights(in_len, out_len)
    xt = jnp.moveaxis(x, axis, -1)
    gathered = xt[..., idx]  # (..., out, 4)
    out = jnp.einsum("...ok,ok->...o", gathered, jnp.asarray(w))
    return jnp.moveaxis(out, -1, axis)


# ---------------------------------------------------------------------------
# swin helpers (static-shape numpy precomputes)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, ws^2, ws^2)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws^2, ws^2)


@lru_cache(maxsize=32)
def _shift_attn_mask(res: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws^2, ws^2) additive mask for shifted windows (0 / -100)."""
    img = np.zeros((res, res), np.int64)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = (
        img.reshape(res // ws, ws, res // ws, ws)
        .transpose(0, 2, 1, 3)
        .reshape(-1, ws * ws)
    )
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _swin_block(params, x, res: int, nh: int, ws: int, shift: int,
                eps: float, compute_dtype):
    """One swin block on tokens x: (B, res*res, C)."""
    b, n, c = x.shape
    hd = c // nh
    shortcut = x
    y = N.layernorm(params["norm1"], x, eps).reshape(b, res, res, c)
    if shift > 0:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
    win = _window_partition(y, ws)  # (B*nW, ws^2, C)
    bw, t, _ = win.shape

    qkv = N.linear(params["qkv"], win, compute_dtype)
    q, k, v = jnp.split(qkv.reshape(bw, t, 3, nh, hd), 3, axis=2)
    q = q[:, :, 0].transpose(0, 2, 1, 3)  # (bw, nh, t, hd)
    k = k[:, :, 0].transpose(0, 2, 1, 3)
    v = v[:, :, 0].transpose(0, 2, 1, 3)
    attn = (q * (hd ** -0.5)) @ jnp.swapaxes(k, -1, -2)

    rpi = jnp.asarray(_relative_position_index(ws).reshape(-1))
    bias = params["relative_position_bias_table"][rpi].reshape(
        t, t, nh
    ).transpose(2, 0, 1)
    attn = attn + bias[None].astype(attn.dtype)
    if shift > 0:
        mask = jnp.asarray(_shift_attn_mask(res, ws, shift))
        n_w = mask.shape[0]
        attn = attn.reshape(bw // n_w, n_w, nh, t, t)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(bw, nh, t, t)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    if compute_dtype is not None:
        attn = attn.astype(compute_dtype)
    o = (attn @ v).transpose(0, 2, 1, 3).reshape(bw, t, c)
    o = N.linear(params["proj"], o, compute_dtype)

    o = _window_reverse(o, ws, res, res)
    if shift > 0:
        o = jnp.roll(o, (shift, shift), axis=(1, 2))
    x = shortcut + o.reshape(b, n, c)

    y = N.layernorm(params["norm2"], x, eps)
    y = N.linear(params["fc2"],
                 jax.nn.gelu(N.linear(params["fc1"], y, compute_dtype),
                             approximate=False),
                 compute_dtype)
    return x + y


def _patch_merge(params, x, res: int, eps: float, compute_dtype):
    """(B, res*res, C) -> (B, (res/2)^2, 2C), official swin slice order."""
    b, n, c = x.shape
    y = x.reshape(b, res, res, c)
    x0 = y[:, 0::2, 0::2]
    x1 = y[:, 1::2, 0::2]
    x2 = y[:, 0::2, 1::2]
    x3 = y[:, 1::2, 1::2]
    y = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(b, n // 4, 4 * c)
    y = N.layernorm(params["norm"], y, eps)
    return N.linear(params["reduction"], y, compute_dtype)


# ---------------------------------------------------------------------------
# init / forward / convert
# ---------------------------------------------------------------------------


def _block_init(key, c, nh, ws, mlp_ratio, dtype):
    ks = jax.random.split(key, 5)
    m = int(c * mlp_ratio)
    return {
        "norm1": N.layernorm_init(c, dtype),
        "qkv": N.linear_init(ks[0], c, 3 * c, bias=True, dtype=dtype),
        "proj": N.linear_init(ks[1], c, c, bias=True, dtype=dtype),
        "relative_position_bias_table": 0.02 * jax.random.normal(
            ks[2], ((2 * ws - 1) ** 2, nh), dtype
        ),
        "norm2": N.layernorm_init(c, dtype),
        "fc1": N.linear_init(ks[3], c, m, bias=True, dtype=dtype),
        "fc2": N.linear_init(ks[4], m, c, bias=True, dtype=dtype),
    }


def htsat_init(key, cfg: HTSATConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 2 + len(cfg.depths))
    params = {
        "melW": jnp.asarray(
            mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin,
                           cfg.fmax, mel_scale="slaney", norm="slaney")
        ),
        "bn0": {"weight": jnp.ones(cfg.n_mels, dtype),
                "bias": jnp.zeros(cfg.n_mels, dtype),
                "mean": jnp.zeros(cfg.n_mels, dtype),
                "var": jnp.ones(cfg.n_mels, dtype)},
        "patch_embed": {
            "proj": {
                "weight": 0.02 * jax.random.normal(
                    ks[0],
                    (cfg.embed_dim, 1, cfg.patch_size, cfg.patch_size), dtype
                ),
                "bias": jnp.zeros(cfg.embed_dim, dtype),
            },
            "norm": N.layernorm_init(cfg.embed_dim, dtype),
        },
        "stages": [],  # lists round-trip through flatten/unflatten_pytree
        "norm": N.layernorm_init(cfg.out_dim, dtype),
    }
    for li, depth in enumerate(cfg.depths):
        c = cfg.embed_dim * 2**li
        stage_key = jax.random.split(ks[2 + li], depth + 1)
        stage = {"blocks": [
            _block_init(stage_key[j], c, cfg.num_heads[li],
                        cfg.window_size, cfg.mlp_ratio, dtype)
            for j in range(depth)
        ]}
        if li < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm": N.layernorm_init(4 * c, dtype),
                "reduction": N.linear_init(stage_key[depth], 4 * c, 2 * c,
                                           bias=False, dtype=dtype),
            }
        params["stages"].append(stage)
    return params


def htsat_logmel(params, cfg: HTSATConfig, wav: jnp.ndarray) -> jnp.ndarray:
    """wav (B, T) -> log-mel (B, frames, n_mels), torchlibrosa numerics."""
    spec = stft_power(wav, cfg.n_fft, cfg.hop_length, center=True, power=2.0)
    mel = spec @ params["melW"].astype(spec.dtype)
    return 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))


def _reshape_wav2img(x: jnp.ndarray, cfg: HTSATConfig) -> jnp.ndarray:
    """(B, T, F) log-mel -> (B, 1, spec, spec) image (HTSAT freq-fold)."""
    b = x.shape[0]
    ratio = cfg.freq_ratio
    target_t = cfg.spec_size * ratio
    assert x.shape[1] <= target_t, (x.shape, target_t)
    x = bicubic_resize_1d(x, target_t, axis=1)  # time
    if x.shape[2] < cfg.spec_size // ratio:
        x = bicubic_resize_1d(x, cfg.spec_size // ratio, axis=2)
    x = jnp.swapaxes(x, 1, 2)  # (B, F, T)
    f = x.shape[1]
    x = x.reshape(b, f, ratio, target_t // ratio)
    x = x.transpose(0, 2, 1, 3).reshape(b, 1, ratio * f, target_t // ratio)
    return x


def htsat_embed(params, cfg: HTSATConfig, wav: jnp.ndarray,
                compute_dtype=None) -> jnp.ndarray:
    """wav: (B, n_samples) -> (B, out_dim) CLAP audio `embedding`."""
    logmel = htsat_logmel(params, cfg, wav)  # (B, T, M)
    bn = params["bn0"]
    logmel = (
        (logmel - bn["mean"].astype(jnp.float32))
        / jnp.sqrt(bn["var"].astype(jnp.float32) + cfg.bn_eps)
        * bn["weight"].astype(jnp.float32)
        + bn["bias"].astype(jnp.float32)
    )
    img = _reshape_wav2img(logmel, cfg)  # (B, 1, S, S)
    if compute_dtype is not None:
        img = img.astype(compute_dtype)

    # patch embed: conv2d k=stride=patch (NCHW, OIHW)
    pe = params["patch_embed"]
    x = jax.lax.conv_general_dilated(
        img, pe["proj"]["weight"].astype(img.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + pe["proj"]["bias"].astype(img.dtype)[None, :, None, None]
    b, c, gh, gw = x.shape
    x = x.reshape(b, c, gh * gw).transpose(0, 2, 1)  # (B, N, C)
    x = N.layernorm(pe["norm"], x, cfg.ln_eps)

    res = gh
    for li, depth in enumerate(cfg.depths):
        stage = params["stages"][li]
        ws = min(cfg.window_size, res)
        for j in range(depth):
            shift = 0 if (j % 2 == 0 or res <= ws) else ws // 2
            x = _swin_block(stage["blocks"][j], x, res,
                            cfg.num_heads[li], ws, shift, cfg.ln_eps,
                            compute_dtype)
        if "downsample" in stage:
            x = _patch_merge(stage["downsample"], x, res, cfg.ln_eps,
                             compute_dtype)
            res //= 2

    x = N.layernorm(params["norm"], x, cfg.ln_eps)
    # CLAP `embedding` = adaptive-avg-pool over the (freq-folded) tokens,
    # which equals the plain token mean (the fold is a permutation).
    return jnp.mean(x.astype(jnp.float32), axis=1)


def convert_htsat_state_dict(sd, cfg: HTSATConfig, prefix: str = ""):
    """laion_clap HTSAT_Swin_Transformer state_dict -> our params.

    Consumes the whole key set: STFT conv buffers (recomputed via rfft),
    relative_position_index / attn_mask buffers (recomputed), and the
    token-semantic head (tscam_conv / head, kept but unused by the embedding
    path). Returns (params, consumed_keys).
    """
    consumed = set()

    def g(k):
        consumed.add(prefix + k)
        return jnp.asarray(np.asarray(sd[prefix + k]))

    def have(k):
        return prefix + k in sd

    def lin(base, bias=True):
        p = {"weight": g(f"{base}.weight")}
        if bias and have(f"{base}.bias"):
            p["bias"] = g(f"{base}.bias")
        return p

    def ln(base):
        return {"weight": g(f"{base}.weight"), "bias": g(f"{base}.bias")}

    params = {
        "melW": g("logmel_extractor.melW"),
        "bn0": {"weight": g("bn0.weight"), "bias": g("bn0.bias"),
                "mean": g("bn0.running_mean"), "var": g("bn0.running_var")},
        "patch_embed": {"proj": lin("patch_embed.proj"),
                        "norm": ln("patch_embed.norm")},
        "stages": [],
        "norm": ln("norm"),
    }
    for li, depth in enumerate(cfg.depths):
        stage = {"blocks": []}
        for j in range(depth):
            B = f"layers.{li}.blocks.{j}"
            stage["blocks"].append({
                "norm1": ln(f"{B}.norm1"),
                "qkv": lin(f"{B}.attn.qkv"),
                "proj": lin(f"{B}.attn.proj"),
                "relative_position_bias_table": g(
                    f"{B}.attn.relative_position_bias_table"
                ),
                "norm2": ln(f"{B}.norm2"),
                "fc1": lin(f"{B}.mlp.fc1"),
                "fc2": lin(f"{B}.mlp.fc2"),
            })
            for buf in (f"{B}.attn.relative_position_index", f"{B}.attn_mask"):
                if have(buf):
                    consumed.add(prefix + buf)
        if li < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm": ln(f"layers.{li}.downsample.norm"),
                "reduction": lin(f"layers.{li}.downsample.reduction",
                                 bias=False),
            }
        params["stages"].append(stage)
    # token-semantic head: not used by the CLAP embedding path, but converted
    # so the checkpoint maps completely (framewise output support later).
    if have("tscam_conv.weight"):
        params["tscam_conv"] = lin("tscam_conv")
    if have("head.weight"):
        params["head"] = lin("head")
    # recomputed signal-processing buffers
    for buf in ("spectrogram_extractor.stft.conv_real.weight",
                "spectrogram_extractor.stft.conv_imag.weight",
                "bn0.num_batches_tracked"):
        if have(buf):
            consumed.add(prefix + buf)
    return params, consumed
