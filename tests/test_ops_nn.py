import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sam_audio_tpu.ops import nn as N

RTOL = 1e-5
ATOL = 1e-5


def to_np(x):
    return np.asarray(x)


def test_linear_matches_torch():
    key = jax.random.PRNGKey(0)
    p = N.linear_init(key, 8, 16, bias=True)
    x = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    ours = to_np(N.linear(p, jnp.asarray(x)))
    lin = torch.nn.Linear(8, 16)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(to_np(p["weight"])))
        lin.bias.copy_(torch.from_numpy(to_np(p["bias"])))
        theirs = lin(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)


def test_rmsnorm_matches_torch_formula():
    x = np.random.RandomState(1).randn(2, 5, 8).astype(np.float32)
    w = np.random.RandomState(2).rand(8).astype(np.float32)
    ours = to_np(N.rmsnorm({"weight": jnp.asarray(w)}, jnp.asarray(x), eps=1e-5))
    xt = torch.from_numpy(x)
    normed = xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-5)
    theirs = (normed * torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)


def test_layernorm_matches_torch():
    x = np.random.RandomState(3).randn(2, 5, 8).astype(np.float32)
    p = {"weight": jnp.asarray(np.random.rand(8).astype(np.float32)),
         "bias": jnp.asarray(np.random.rand(8).astype(np.float32))}
    ours = to_np(N.layernorm(p, jnp.asarray(x)))
    ln = torch.nn.LayerNorm(8)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(to_np(p["weight"])))
        ln.bias.copy_(torch.from_numpy(to_np(p["bias"])))
        theirs = ln(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=1e-4)


def test_swiglu_projection_matches_torch_formula():
    key = jax.random.PRNGKey(42)
    p = N.projection_init(key, 8, 16, "swiglu")
    x = np.random.RandomState(4).randn(3, 8).astype(np.float32)
    ours = to_np(N.projection(p, jnp.asarray(x), "swiglu"))
    xt = torch.from_numpy(x)
    w1 = torch.from_numpy(to_np(p["w1"]["weight"]))
    w2 = torch.from_numpy(to_np(p["w2"]["weight"]))
    w3 = torch.from_numpy(to_np(p["w3"]["weight"]))
    theirs = (torch.nn.functional.silu(xt @ w1.T) * (xt @ w3.T)) @ w2.T
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_sinusoidal_embedding_matches_reference_formula():
    # reference model.py:25-42
    import math

    dim, theta = 16, 10000
    pos = np.array([0.0, 0.5, 1.0], np.float32)
    ours = to_np(N.sinusoidal_embedding(jnp.asarray(pos), dim, theta))
    half = dim // 2
    inv_freq = torch.exp(-math.log(theta) * torch.arange(half).float() / half)
    emb = torch.einsum("i,j->ij", torch.from_numpy(pos), inv_freq)
    theirs = torch.cat((emb.cos(), emb.sin()), dim=-1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)


def test_glide_timestep_embedding_matches_reference_formula():
    import math

    dim = 10
    t = np.array([0.0, 0.25, 0.99], np.float32)
    ours = to_np(N.glide_timestep_embedding(jnp.asarray(t), dim))
    half = dim // 2
    freqs = torch.exp(-math.log(10000) * torch.arange(half).float() / half)
    args = torch.from_numpy(t)[:, None] * freqs[None]
    theirs = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)


def test_embed_anchors_gather_semantics():
    key = jax.random.PRNGKey(0)
    p = N.embed_anchors_init(key, 3, 4, 6)
    # make the gate nonzero so the anchor path contributes
    p["gate"] = jnp.asarray([0.5])
    x = jnp.zeros((2, 5, 6))
    anchor_ids = jnp.asarray([[0, 3, 1], [0, 3, 2]])
    anchor_alignment = jnp.asarray([[0, 2, 2, 1, 1], [0, 0, 2, 1, 1]])
    out = N.embed_anchors(p, x, anchor_ids, anchor_alignment)
    emb_w = to_np(p["embed"]["weight"])
    proj_w = to_np(p["proj"]["weight"])
    g = np.tanh(0.5)
    # item 0, frame 1 -> alignment 2 -> anchor id anchor_ids[0,2]=1
    expected = g * (emb_w[1] @ proj_w.T)
    np.testing.assert_allclose(to_np(out)[0, 1], expected, rtol=1e-5, atol=1e-5)
    # pad token (id 4 = padding_idx) embeds to zeros
    expected_pad = g * (emb_w[3] @ proj_w.T)
    np.testing.assert_allclose(to_np(out)[0, 3], expected_pad, rtol=1e-5, atol=1e-5)


def test_align_modalities_zero_gate_is_identity():
    key = jax.random.PRNGKey(0)
    p = N.align_modalities_init(key, 4, 6)
    anchor = jnp.asarray(np.random.RandomState(0).randn(2, 5, 6).astype(np.float32))
    tgt = jnp.asarray(np.random.RandomState(1).randn(2, 4, 5).astype(np.float32))
    out = N.align_modalities(p, anchor, tgt)
    # gate initialized to 0 -> tanh(0)=0 -> identity
    np.testing.assert_allclose(to_np(out), to_np(anchor), rtol=1e-6, atol=1e-6)
    assert N.align_modalities(p, anchor, None) is anchor


def test_groupnorm_matches_torch():
    from sam_audio_tpu.ops import conv as C

    x = np.random.RandomState(5).randn(2, 8, 12).astype(np.float32)
    p = C.groupnorm_init(8)
    p = {"weight": jnp.asarray(np.random.rand(8).astype(np.float32)),
         "bias": jnp.asarray(np.random.rand(8).astype(np.float32))}
    for groups in (1, 2, 4):
        ours = to_np(C.groupnorm(p, jnp.asarray(x), groups))
        gn = torch.nn.GroupNorm(groups, 8)
        with torch.no_grad():
            gn.weight.copy_(torch.from_numpy(to_np(p["weight"])))
            gn.bias.copy_(torch.from_numpy(to_np(p["bias"])))
            theirs = gn(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_snake_formula():
    from sam_audio_tpu.ops import conv as C

    x = np.random.RandomState(6).randn(2, 4, 9).astype(np.float32)
    alpha = np.random.RandomState(7).rand(1, 4, 1).astype(np.float32) + 0.5
    ours = to_np(C.snake({"alpha": jnp.asarray(alpha)}, jnp.asarray(x)))
    theirs = x + (1.0 / (alpha + 1e-9)) * np.sin(alpha * x) ** 2
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)
