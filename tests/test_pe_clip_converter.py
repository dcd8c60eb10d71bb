"""PE-Core CLIP image-tower converter: coverage + parity vs a key-faithful
torch functional oracle in CLIP/open_clip naming (reference
vision_encoder.py:86-90 loads pe.CLIP.from_config("PE-Core-L14-336"))."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

import test_peav_converter as tp
from test_peav_converter import _make_layers, torch_tower

from sam_audio_tpu.config import PerceptionEncoderConfig
from sam_audio_tpu.models.pe_clip import (
    convert_pe_clip_state_dict,
    encode_images,
)

W, HEADS, LAYERS = 32, 4, 2
IMG, PATCH, OUT = 28, 14, 12
GRID = IMG // PATCH
TOKENS = GRID * GRID + 1

CFG = PerceptionEncoderConfig(
    dim=OUT, image_size=IMG, patch_size=PATCH, width=W, vit_layers=LAYERS,
    vit_heads=HEADS, use_cls_token=True,
)


def _clip_style_sd(rng):
    layers = _make_layers(rng)
    sd = {
        "visual.conv1.weight": (rng.randn(W, 3, PATCH, PATCH) * 0.1
                                ).astype(np.float32),
        "visual.class_embedding": (rng.randn(W) * 0.05).astype(np.float32),
        "visual.positional_embedding": (rng.randn(TOKENS, W) * 0.05
                                        ).astype(np.float32),
        "visual.ln_post.weight": np.ones(W, np.float32),
        "visual.ln_post.bias": np.zeros(W, np.float32),
        "visual.proj": (rng.randn(W, OUT) * 0.1).astype(np.float32),
        "visual.attn_pool.probe": (rng.randn(1, W) * 0.05).astype(np.float32),
        "visual.attn_pool.attn.in_proj_weight": (
            rng.randn(3 * W, W) * 0.1
        ).astype(np.float32),
        "visual.attn_pool.attn.in_proj_bias": np.zeros(3 * W, np.float32),
        "visual.attn_pool.attn.out_proj.weight": (
            rng.randn(W, W) * 0.1
        ).astype(np.float32),
        "visual.attn_pool.attn.out_proj.bias": np.zeros(W, np.float32),
        "visual.attn_pool.layernorm.weight": np.ones(W, np.float32),
        "visual.attn_pool.layernorm.bias": np.zeros(W, np.float32),
        "logit_scale": np.float32(4.6),
    }
    for i, lay in enumerate(layers):
        L = f"visual.transformer.resblocks.{i}"
        sd[f"{L}.attn.in_proj_weight"] = torch.cat(
            [lay["wq"], lay["wk"], lay["wv"]]).numpy()
        sd[f"{L}.attn.in_proj_bias"] = torch.cat(
            [lay["bq"], lay["bk"], lay["bv"]]).numpy()
        sd[f"{L}.attn.out_proj.weight"] = lay["wo"].numpy()
        sd[f"{L}.attn.out_proj.bias"] = lay["bo"].numpy()
        sd[f"{L}.ln_1.weight"] = lay["ln1w"].numpy()
        sd[f"{L}.ln_1.bias"] = lay["ln1b"].numpy()
        sd[f"{L}.ln_2.weight"] = lay["ln2w"].numpy()
        sd[f"{L}.ln_2.bias"] = lay["ln2b"].numpy()
        sd[f"{L}.mlp.c_fc.weight"] = lay["fc1w"].numpy()
        sd[f"{L}.mlp.c_fc.bias"] = lay["fc1b"].numpy()
        sd[f"{L}.mlp.c_proj.weight"] = lay["fc2w"].numpy()
        sd[f"{L}.mlp.c_proj.bias"] = lay["fc2b"].numpy()
    return sd, layers


def test_pe_clip_conversion_and_parity():
    rng = np.random.RandomState(0)
    sd, layers = _clip_style_sd(rng)
    params, unconverted = convert_pe_clip_state_dict(sd, CFG)
    assert unconverted == [], unconverted

    n = 3
    x = rng.randn(n, 3, IMG, IMG).astype(np.float32)
    ours = np.asarray(encode_images(params, jnp.asarray(x), CFG))

    with torch.no_grad():
        xt = torch.from_numpy(x)
        h = F.conv2d(xt, torch.from_numpy(sd["visual.conv1.weight"]),
                     stride=PATCH)
        h = h.flatten(2).transpose(1, 2)
        cls = torch.from_numpy(sd["visual.class_embedding"]).expand(n, 1, W)
        h = torch.cat([cls, h], dim=1)
        h = h + torch.from_numpy(sd["visual.positional_embedding"])[None]
        old = tp.B, tp.T
        tp.B, tp.T = n, TOKENS
        try:
            h = torch_tower(layers, h, None, prenorm=True, act="gelu_tanh",
                            final=(torch.from_numpy(sd["visual.ln_post.weight"]),
                                   torch.from_numpy(sd["visual.ln_post.bias"])))
        finally:
            tp.B, tp.T = old
        # attentive pooling (probe query over tokens) as in encode_images
        wq, wk, wv = torch.from_numpy(
            sd["visual.attn_pool.attn.in_proj_weight"]).chunk(3, 0)
        probe = torch.from_numpy(sd["visual.attn_pool.probe"]).expand(n, 1, W)
        q = probe @ wq.T
        k = h @ wk.T
        v = h @ wv.T
        hd = W // HEADS
        q = q.view(n, 1, HEADS, hd).transpose(1, 2)
        k = k.view(n, TOKENS, HEADS, hd).transpose(1, 2)
        v = v.view(n, TOKENS, HEADS, hd).transpose(1, 2)
        pooled = F.scaled_dot_product_attention(q, k, v)
        pooled = pooled.transpose(1, 2).reshape(n, W)
        pooled = pooled @ torch.from_numpy(
            sd["visual.attn_pool.attn.out_proj.weight"]).T + torch.from_numpy(
            sd["visual.attn_pool.attn.out_proj.bias"])
        pooled = F.layer_norm(
            pooled, (W,),
            torch.from_numpy(sd["visual.attn_pool.layernorm.weight"]),
            torch.from_numpy(sd["visual.attn_pool.layernorm.bias"]),
        )
        out = pooled @ torch.from_numpy(sd["visual.proj"])
        ref = (out / out.norm(dim=-1, keepdim=True).clamp_min(1e-8)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)
