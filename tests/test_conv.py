import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sam_audio_tpu.ops import conv as C


def to_np(x):
    return np.asarray(x)


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_pad1d_reflect_matches_torch():
    x = rand(1, 2, 10)
    ours = to_np(C.pad1d(jnp.asarray(x), (3, 4), mode="reflect"))
    theirs = F.pad(torch.from_numpy(x), (3, 4), mode="reflect").numpy()
    np.testing.assert_allclose(ours, theirs)


def test_pad1d_reflect_small_input():
    # input shorter than padding: audiocraft inserts extra zero pad first
    # (reference patcher.py:24-32)
    x = rand(1, 1, 3)
    ours = to_np(C.pad1d(jnp.asarray(x), (5, 5), mode="reflect"))
    xt = torch.from_numpy(x)
    extra = 5 - 3 + 1
    padded = F.pad(F.pad(xt, (0, extra)), (5, 5), mode="reflect")
    theirs = padded[..., : padded.shape[-1] - extra].numpy()
    np.testing.assert_allclose(ours, theirs)
    assert ours.shape[-1] == 3 + 10


def test_conv1d_matches_torch():
    x = rand(2, 3, 20, seed=1)
    w = rand(5, 3, 7, seed=2)
    b = rand(5, seed=3)
    for stride, pad, dil in [(1, 3, 1), (2, 1, 1), (1, 9, 3), (4, 2, 1)]:
        ours = to_np(
            C.conv1d({"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
                     jnp.asarray(x), stride=stride, padding=pad, dilation=dil)
        )
        theirs = F.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                          torch.from_numpy(b), stride=stride, padding=pad,
                          dilation=dil).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_conv_transpose1d_matches_torch():
    x = rand(2, 6, 15, seed=4)
    for stride in (2, 8, 10, 12):
        k = 2 * stride
        pad = -(-stride // 2)  # ceil
        w = rand(6, 4, k, seed=stride)
        b = rand(4, seed=stride + 1)
        ours = to_np(
            C.conv_transpose1d({"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
                               jnp.asarray(x), stride=stride, padding=pad)
        )
        theirs = F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                                    torch.from_numpy(b), stride=stride,
                                    padding=pad).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
        # DAC decoder blocks must exactly multiply length by the rate
        assert ours.shape[-1] == 15 * stride


def test_audiocraft_conv1d_length_and_numerics():
    # k=3 s=1: pad (1, 1) zeros, length preserved (patcher stem setting)
    x = rand(2, 4, 11, seed=7)
    w = rand(4, 4, 3, seed=8)
    b = rand(4, seed=9)
    ours = to_np(
        C.audiocraft_conv1d({"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
                            jnp.asarray(x))
    )
    theirs = F.conv1d(F.pad(torch.from_numpy(x), (1, 1)), torch.from_numpy(w),
                      torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
    assert ours.shape == x.shape


def test_fold_weight_norm_matches_torch():
    w = rand(5, 3, 7, seed=10)
    conv = torch.nn.Conv1d(3, 5, 7, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
    wn = torch.nn.utils.weight_norm(conv)
    g = wn.weight_g.detach().numpy()
    v = wn.weight_v.detach().numpy()
    folded = to_np(C.fold_weight_norm(jnp.asarray(g), jnp.asarray(v)))
    np.testing.assert_allclose(folded, w, rtol=1e-5, atol=1e-6)


def test_fast_snake_matches_exact():
    # polynomial sin^2 path (used for bf16 inputs on the TPU hot path) vs the
    # exact-sin formula, across a wide activation/alpha range incl. torch
    # cross-check of the exact path
    rng = np.random.RandomState(0)
    c = 8
    alpha = np.abs(rng.randn(1, c, 1)).astype(np.float32) * 3 + 0.01
    x = (rng.randn(2, c, 4096) * 20).astype(np.float32)
    params = {"alpha": jnp.asarray(alpha)}
    exact = to_np(C.snake(params, jnp.asarray(x), fast=False))
    fast = to_np(C.snake(params, jnp.asarray(x), fast=True))
    np.testing.assert_allclose(fast, exact, rtol=1e-4, atol=5e-4)
    theirs = (torch.from_numpy(x)
              + (1.0 / (torch.from_numpy(alpha) + 1e-9))
              * torch.sin(torch.from_numpy(alpha) * torch.from_numpy(x)) ** 2)
    np.testing.assert_allclose(exact, theirs.numpy(), rtol=1e-4, atol=1e-4)

    # bf16 inputs default to the fast path and stay within a bf16 ulp of the
    # exact computation
    xb = jnp.asarray(x, jnp.bfloat16)
    auto = to_np(C.snake(params, xb).astype(jnp.float32))
    ref = to_np(C.snake(params, xb, fast=False).astype(jnp.float32))
    np.testing.assert_allclose(auto, ref, rtol=1e-2, atol=0.2)
