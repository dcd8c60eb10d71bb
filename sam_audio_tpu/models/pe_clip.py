"""Perception-Encoder CLIP image tower (PE-Core-L14-336) in JAX.

The reference encodes masked video frames with PE-Core-L14-336's
`encode_image`, producing L2-normalized 1024-d features, chunked at <=300
frames per batch (reference: sam_audio/model/vision_encoder.py:40-113,
config.py:69-83).

Architecture: ViT-L/14 @336 — conv patch embed (14x14/14), CLS token +
learned positional embeddings, 24 pre-LN transformer layers (width 1024,
16 heads, GELU MLP x4), final LayerNorm, attentive-pool head projecting to
the output dim, L2 normalization. The preprocessing transform (resize-336
bicubic, /255, normalize(0.5, 0.5, 0.5)) runs on device via jax.image.

All frames of a video batch flow through as one (N, tokens, width) stream —
the MXU-friendly layout — with the <=`batch_size` chunking preserved for
HBM safety on very long videos.
"""

from __future__ import annotations

import re
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import PerceptionEncoderConfig
from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops.attention import attend


def _layer_init(key, width, heads, mlp_ratio, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    mlp = int(width * mlp_ratio)
    return {
        "ln1": N.layernorm_init(width, dtype),
        "attn": {
            "wq": N.linear_init(ks[0], width, width, bias=True, dtype=dtype),
            "wk": N.linear_init(ks[1], width, width, bias=True, dtype=dtype),
            "wv": N.linear_init(ks[2], width, width, bias=True, dtype=dtype),
            "wo": N.linear_init(ks[3], width, width, bias=True, dtype=dtype),
        },
        "ln2": N.layernorm_init(width, dtype),
        "mlp": {
            "fc1": N.linear_init(ks[4], width, mlp, bias=True, dtype=dtype),
            "fc2": N.linear_init(ks[5], mlp, width, bias=True, dtype=dtype),
        },
    }


def pe_clip_init(key, cfg: PerceptionEncoderConfig, dtype=jnp.float32):
    w = cfg.width
    grid = cfg.image_size // cfg.patch_size
    n_tokens = grid * grid + (1 if cfg.use_cls_token else 0)
    ks = jax.random.split(key, 8)
    layer_keys = jax.random.split(ks[0], cfg.vit_layers)
    return {
        "patch_embed": {
            "weight": jax.random.normal(
                ks[1], (w, 3, cfg.patch_size, cfg.patch_size), dtype
            ) * 0.02,
        },
        "cls_token": jax.random.normal(ks[2], (w,), dtype) * 0.02,
        "pos_embed": jax.random.normal(ks[3], (n_tokens, w), dtype) * 0.02,
        "layers": jax.vmap(
            lambda k: _layer_init(k, w, cfg.vit_heads, cfg.mlp_ratio, dtype)
        )(layer_keys),
        "ln_post": N.layernorm_init(w, dtype),
        "attn_pool": {
            "probe": jax.random.normal(ks[4], (1, w), dtype) * 0.02,
            "wq": N.linear_init(ks[5], w, w, bias=True, dtype=dtype),
            "wk": N.linear_init(ks[6], w, w, bias=True, dtype=dtype),
            "wv": N.linear_init(ks[7], w, w, bias=True, dtype=dtype),
            "wo": N.linear_init(jax.random.fold_in(key, 11), w, w, bias=True,
                                dtype=dtype),
            "ln": N.layernorm_init(w, dtype),
        },
        "proj": N.linear_init(jax.random.fold_in(key, 12), w, cfg.dim,
                              bias=False, dtype=dtype),
    }


def preprocess_frames(frames: jnp.ndarray, cfg: PerceptionEncoderConfig):
    """(N, C, H, W) uint8/float -> (N, C, S, S) normalized float32
    (reference: vision_encoder.py:16-37, 92-113)."""
    x = frames.astype(jnp.float32)
    n, c, h, w = x.shape
    s = cfg.image_size
    if (h, w) != (s, s):
        method = cfg.interpolation_mode.lower()
        if method == "bicubic":
            method = "cubic"
        x = jax.image.resize(x, (n, c, s, s), method=method)
    x = x / 255.0
    return (x - 0.5) / 0.5


def encode_images(params, x: jnp.ndarray, cfg: PerceptionEncoderConfig,
                  compute_dtype=None, normalize=True) -> jnp.ndarray:
    """x: preprocessed (N, 3, S, S) -> (N, dim), L2-normalized."""
    n = x.shape[0]
    w = cfg.width
    heads = cfg.vit_heads
    hd = w // heads
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    # patch embed: conv s=p == unfold + matmul
    pe_w = params["patch_embed"]["weight"]
    if compute_dtype is not None:
        pe_w = pe_w.astype(compute_dtype)
    h = jax.lax.conv_general_dilated(
        x, pe_w, (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (N, w, g, g)
    if "bias" in params["patch_embed"]:
        h = h + params["patch_embed"]["bias"].astype(h.dtype)[None, :, None, None]
    h = h.reshape(n, w, -1).swapaxes(1, 2)  # (N, tokens, w)
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls_token"][None, None, :], (n, 1, w))
        h = jnp.concatenate([cls.astype(h.dtype), h], axis=1)
    if "pos_embed" in params:  # absent on rope2d-only checkpoints
        h = h + params["pos_embed"][None].astype(h.dtype)
    if "ln_pre" in params:
        h = N.layernorm(params["ln_pre"], h)

    rope_cs = None
    if cfg.use_rope2d:
        from sam_audio_tpu.ops.rope import apply_rope, precompute_rope_2d

        rope_cs = precompute_rope_2d(
            hd, cfg.image_size // cfg.patch_size, cfg.rope2d_theta,
            n_prefix_tokens=1 if cfg.use_cls_token else 0,
        )

    # The (N, 16, 577, 577) score matrix is the tower's dominant HBM object
    # (4.3 GB fp32 at 250 frames, re-read by the softmax and the AV matmul);
    # materialize it in the compute dtype when that is low-precision. The
    # MXU still accumulates fp32 and the softmax reduces in fp32 — only the
    # HBM-resident logits are rounded (~1e-3 relative weight error, below
    # the bf16 compute noise already accepted on this path).
    # SAM_AUDIO_PE_SCORE_F32=1 restores fp32 scores (A/B, golden debugging).
    import os as _os

    score_dtype = None
    if (compute_dtype is not None
            and jnp.dtype(compute_dtype).itemsize < 4
            and _os.environ.get("SAM_AUDIO_PE_SCORE_F32") != "1"):
        score_dtype = compute_dtype

    # NOTE (mb_pe_ablate, r4): fusing wq/wk/wv into one (w, 3w) matmul in the
    # layer body measured 63 ms SLOWER over the 24-layer stack at the
    # 250x577 serving shape — the separate projections stay.
    def body(carry, layer):
        hc = carry
        y = N.layernorm(layer["ln1"], hc)
        att = layer["attn"]
        q = N.linear(att["wq"], y, compute_dtype).reshape(n, -1, heads, hd)
        k = N.linear(att["wk"], y, compute_dtype).reshape(n, -1, heads, hd)
        v = N.linear(att["wv"], y, compute_dtype).reshape(n, -1, heads, hd)
        if rope_cs is not None:
            q = apply_rope(q, *rope_cs)
            k = apply_rope(k, *rope_cs)
        o = attend(q, k, v, score_dtype=score_dtype).reshape(n, -1, w)
        hc = hc + N.linear(layer["attn"]["wo"], o, compute_dtype)
        y = N.layernorm(layer["ln2"], hc)
        y = jax.nn.gelu(N.linear(layer["mlp"]["fc1"], y, compute_dtype),
                        approximate=True)
        return hc + N.linear(layer["mlp"]["fc2"], y, compute_dtype), None

    h, _ = jax.lax.scan(body, h, params["layers"])
    h = N.layernorm(params["ln_post"], h)

    # attentive pooling: one probe query over all tokens
    ap = params["attn_pool"]
    probe = jnp.broadcast_to(ap["probe"][None], (n, 1, w)).astype(h.dtype)
    q = N.linear(ap["wq"], probe, compute_dtype).reshape(n, 1, heads, hd)
    k = N.linear(ap["wk"], h, compute_dtype).reshape(n, -1, heads, hd)
    v = N.linear(ap["wv"], h, compute_dtype).reshape(n, -1, heads, hd)
    pooled = attend(q, k, v).reshape(n, w)
    pooled = N.linear(ap["wo"], pooled, compute_dtype)
    pooled = N.layernorm(ap["ln"], pooled)
    out = N.linear(params["proj"], pooled, compute_dtype).astype(jnp.float32)
    if normalize:
        out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True),
                                1e-8)
    return out


def convert_pe_clip_state_dict(sd, cfg: PerceptionEncoderConfig,
                               prefix: str = "visual."):
    """PE-Core CLIP image-tower state_dict -> our params (reference
    vision_encoder.py:86-90 builds pe.CLIP.from_config("PE-Core-L14-336")).

    Sniffs CLIP/open_clip-style naming (conv1 / class_embedding /
    positional_embedding / transformer.resblocks via the layout-sniffing
    PE-AV converter / ln_post / attn_pool / proj) plus timm-style aliases.
    Returns (params, unconverted)."""
    import numpy as onp

    from sam_audio_tpu.checkpoint import convert_peav_tower
    from sam_audio_tpu.config import PEAVTransformerConfig

    sub = {k[len(prefix):]: onp.asarray(v) for k, v in sd.items()
           if k.startswith(prefix)}
    if not sub:  # tower not nested under `visual.`
        sub = {k: onp.asarray(v) for k, v in sd.items()}
        prefix = ""
    consumed = set()

    def g(k):
        consumed.add(k)
        return jnp.asarray(sub[k])

    def have(k):
        return k in sub

    def first(*cands):
        for c in cands:
            if have(c):
                return c
        return None

    params = {}
    stem = first("conv1.weight", "patch_embed.proj.weight", "patchify.weight")
    if stem is None:
        raise ValueError("no patch-embed conv in PE-CLIP state_dict")
    params["patch_embed"] = {"weight": g(stem)}
    bias = stem.rsplit(".", 1)[0] + ".bias"
    if have(bias):
        params["patch_embed"]["bias"] = g(bias)

    cls = first("class_embedding", "cls_token")
    if cls is not None:
        params["cls_token"] = g(cls).reshape(-1)
    pos = first("positional_embedding", "pos_embed")
    if pos is not None:
        params["pos_embed"] = g(pos).reshape(-1, cfg.width)

    tf_cfg = PEAVTransformerConfig(hidden_size=cfg.width,
                                   num_layers=cfg.vit_layers,
                                   num_heads=cfg.vit_heads, pos="none")
    tower, arch, left = convert_peav_tower(sub, "", tf_cfg)
    params["layers"] = tower["layers"]
    if "ln_pre" in tower:
        params["ln_pre"] = tower["ln_pre"]
    if "final_norm" in tower:  # ln_post is sniffed as the tower final norm
        params["ln_post"] = tower["final_norm"]
    consumed |= set(sub) - set(left)

    if "ln_post" not in params:
        post = first("ln_post", "norm", "final_layer_norm")
        if post is not None:
            params["ln_post"] = {"weight": g(f"{post}.weight"),
                                 "bias": g(f"{post}.bias")}

    # attentive pooling (PE-Core / SigLIP style probe attention)
    for ap_base in ("attn_pool", "attnpool", "attention_pool", "pool"):
        probe = first(f"{ap_base}.probe", f"{ap_base}.query",
                      f"{ap_base}.cls_token")
        if probe is None:
            continue
        ap = {"probe": g(probe).reshape(1, -1)}
        if have(f"{ap_base}.attn.in_proj_weight"):
            from sam_audio_tpu.checkpoint import split_fused_qkv

            ap.update(split_fused_qkv(
                g(f"{ap_base}.attn.in_proj_weight"),
                g(f"{ap_base}.attn.in_proj_bias")
                if have(f"{ap_base}.attn.in_proj_bias") else None))
            ap["wo"] = {"weight": g(f"{ap_base}.attn.out_proj.weight")}
            if have(f"{ap_base}.attn.out_proj.bias"):
                ap["wo"]["bias"] = g(f"{ap_base}.attn.out_proj.bias")
        else:
            for role, names in (("wq", ("q", "q_proj", "wq")),
                                ("wk", ("k", "k_proj", "wk")),
                                ("wv", ("v", "v_proj", "wv")),
                                ("wo", ("proj", "out_proj", "wo"))):
                n = first(*(f"{ap_base}.{x}.weight" for x in names))
                if n is None:
                    raise ValueError(f"unrecognized attn_pool in {ap_base}")
                base = n[: -len(".weight")]
                ap[role] = {"weight": g(n)}
                if have(f"{base}.bias"):
                    ap[role]["bias"] = g(f"{base}.bias")
        ln = first(f"{ap_base}.layernorm.weight", f"{ap_base}.ln.weight",
                   f"{ap_base}.norm.weight")
        if ln is not None:
            base = ln[: -len(".weight")]
            ap["ln"] = {"weight": g(ln), "bias": g(f"{base}.bias")}
        params["attn_pool"] = ap
        break

    proj = first("proj", "head.weight", "projection.weight")
    if proj == "proj":  # CLIP-style raw (width, dim) matrix: x @ proj
        params["proj"] = {"weight": jnp.asarray(onp.asarray(g("proj")).T)}
    elif proj is not None:
        base = proj[: -len(".weight")]
        params["proj"] = {"weight": g(proj)}
        if have(f"{base}.bias"):
            params["proj"]["bias"] = g(f"{base}.bias")

    _IGNORE = re.compile(r"(rotary|rope|freqs|logit_scale|attn\.bias|"
                         r"position_ids|num_batches_tracked)")
    for k in sub:
        if k not in consumed and _IGNORE.search(k):
            consumed.add(k)
    unconverted = sorted(prefix + k for k in sub if k not in consumed)
    return params, unconverted


class PerceptionEncoder:
    """Wrapper mirroring the reference VisionEncoder behavior: per-video
    chunked encoding + right-pad across the batch
    (reference: vision_encoder.py:47-69)."""

    def __init__(self, cfg: PerceptionEncoderConfig, params):
        self.cfg = cfg
        self.params = params
        self._encode = jax.jit(
            lambda p, x: encode_images(p, x, cfg, compute_dtype=jnp.bfloat16)
        )

    @classmethod
    def init_random(cls, key, cfg: PerceptionEncoderConfig):
        return cls(cfg, pe_clip_init(key, cfg))

    def __call__(self, videos: Sequence[np.ndarray]) -> jnp.ndarray:
        """videos: list of (N_i, C, H, W) arrays -> (B, N_max, dim)."""
        feats: List[jnp.ndarray] = []
        bs = self.cfg.batch_size
        for video in videos:
            v = jnp.asarray(np.asarray(video))
            v = preprocess_frames(v, self.cfg)
            if bs > 0 and v.shape[0] > bs:
                chunks = [
                    self._encode(self.params, v[i : i + bs])
                    for i in range(0, v.shape[0], bs)
                ]
                feats.append(jnp.concatenate(chunks, axis=0))
            else:
                feats.append(self._encode(self.params, v))
        n_max = max(f.shape[0] for f in feats)
        out = jnp.stack([
            jnp.pad(f, ((0, n_max - f.shape[0]), (0, 0))) for f in feats
        ])
        return out


def interp_strided_features(feats: jnp.ndarray, n_full: int,
                            stride: int) -> jnp.ndarray:
    """Linearly interpolate per-frame features encoded at frame indices
    0, stride, 2*stride, ... back to all `n_full` frame positions.

    feats: (N_s, D) with N_s == ceil(n_full / stride). Positions beyond the
    last encoded frame hold its value (clamped lerp). Exact identity when
    stride == 1 or when all frames are identical."""
    pos = jnp.arange(n_full) / stride
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, feats.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, feats.shape[0] - 1)
    w = (pos - lo).astype(feats.dtype)[:, None]
    return feats[lo] * (1 - w) + feats[hi] * w


def encode_videos(model, masked_videos, t_frames: int, stride: int = 1):
    """Hook used by SAMAudio._encode_videos: list of (N, C, H, W) ->
    (B, vision_dim, T) aligned to latent frames.

    stride > 1 (opt-in, NOT reference semantics — the reference encodes
    every frame, vision_encoder.py:47-69): encode every stride-th frame
    through the PE tower and linearly interpolate the features to all
    frame positions. Cuts the dominant visual-prompting FLOP block ~stride
    times; real video is temporally smooth so interpolated conditioning
    features track the full encode closely (see
    `SAMAudio.separate(visual_stride=)`)."""
    enc = getattr(model, "vision_encoder", None)
    if enc is None:
        if not getattr(model, "allow_random_towers", False):
            raise ValueError(
                "Visual prompting requires a loaded PE-Core vision tower but "
                "model.vision_encoder is None. Convert one with `python "
                "scripts/convert_checkpoint.py pe-clip --torch <PE-Core-"
                "L14-336.pt> --out pe_clip.npz` and attach "
                "PerceptionEncoder(cfg, load_params(...)), or construct "
                "SAMAudio(..., allow_random_towers=True) for tests only. The "
                "reference always loads real PE weights "
                "(sam_audio/model/vision_encoder.py:86-90)."
            )
        enc = PerceptionEncoder.init_random(
            jax.random.PRNGKey(0), model.cfg.vision_encoder
        )
        model.vision_encoder = enc
    if stride > 1:
        lens = [int(np.asarray(v).shape[0]) for v in masked_videos]
        feats_s = enc([np.asarray(v)[::stride] for v in masked_videos])
        n_max = max(lens)
        rows = []
        for i, n in enumerate(lens):
            n_s = -(-n // stride)  # ceil
            f = interp_strided_features(feats_s[i, :n_s], n, stride)
            rows.append(jnp.pad(f, ((0, n_max - n), (0, 0))))
        feats = jnp.stack(rows)  # (B, N_max, dim)
    else:
        feats = enc(masked_videos)  # (B, N_max, dim)
    b, n, d = feats.shape
    if n != t_frames:
        pad = max(0, t_frames - n)
        feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))[:, :t_frames]
    return jnp.swapaxes(feats, 1, 2)  # (B, dim, T)
