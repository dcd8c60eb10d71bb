"""Independent PyTorch oracle of the SAM-Audio DiT architecture.

Written from the architecture description (SURVEY.md section 2 / the published
DiT-adaLN design) to validate BOTH our JAX DiT numerics and the torch->JAX
checkpoint converter: state_dict keys follow the reference naming
(transformer.layers.N.attention.wq..., x_embedder.block.block1...), including
the reference's quirky strided head split (reshape(B,T,C//H,H).permute) and
2x2-matrix RoPE, so a converted state_dict must reproduce the oracle's output
bit-near-exactly through our stack.
"""

import math

import torch
import torch.nn.functional as F


class RMSNorm(torch.nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.weight = torch.nn.Parameter(torch.ones(dim))

    def forward(self, x):
        out = x.float() * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + self.eps)
        return (out * self.weight).type_as(x)


def rope_tables(head_dim, seqlen, theta):
    freqs = 1.0 / (theta ** (torch.arange(0, head_dim, 2)[: head_dim // 2].float() / head_dim))
    t = torch.arange(seqlen).float()
    ang = torch.outer(t, freqs)
    return ang.cos(), ang.sin()


def apply_rope_strided(x, cos, sin):
    """x: (B, H, L, E); rotate consecutive pairs of E."""
    b, h, l, e = x.shape
    x0 = x[..., 0::2]
    x1 = x[..., 1::2]
    c = cos[:l][None, None]
    s = sin[:l][None, None]
    o0 = x0 * c - x1 * s
    o1 = x0 * s + x1 * c
    return torch.stack([o0, o1], dim=-1).reshape(b, h, l, e)


class Attention(torch.nn.Module):
    def __init__(self, dim, n_heads, qk_norm=True, fc_bias=False, eps=1e-5):
        super().__init__()
        self.n_heads = n_heads
        self.head_dim = dim // n_heads
        self.wq = torch.nn.Linear(dim, dim, bias=fc_bias)
        self.wk = torch.nn.Linear(dim, dim, bias=fc_bias)
        self.wv = torch.nn.Linear(dim, dim, bias=fc_bias)
        self.wo = torch.nn.Linear(dim, dim, bias=fc_bias)
        self.qk_norm = qk_norm
        if qk_norm:
            self.q_norm = RMSNorm(self.head_dim, eps)
            self.k_norm = RMSNorm(self.head_dim, eps)

    def reshape_heads(self, x):
        # reference's strided split: (B,T,C) -> (B,T,C//H,H) -> (B,H,T,C//H)
        b, t, c = x.shape
        return x.reshape(b, t, c // self.n_heads, self.n_heads).permute(0, 3, 1, 2)

    def forward(self, x, cross_x=None, key_padding_mask=None, rope=None):
        src = x if cross_x is None else cross_x
        q = self.reshape_heads(self.wq(x))
        k = self.reshape_heads(self.wk(src))
        v = self.reshape_heads(self.wv(src))
        if self.qk_norm:
            q, k = self.q_norm(q), self.k_norm(k)
        if rope is not None:
            cos, sin = rope
            q = apply_rope_strided(q, cos, sin)
            k = apply_rope_strided(k, cos, sin)
        mask = None
        if key_padding_mask is not None:
            mask = key_padding_mask[:, None, None, :]
        out = F.scaled_dot_product_attention(q, k, v, attn_mask=mask)
        b, h, t, d = out.shape
        out = out.permute(0, 2, 1, 3).reshape(b, t, h * d)
        return self.wo(out)


class SwiGLU(torch.nn.Module):
    def __init__(self, in_dim, hidden, out_dim=None, fc_bias=False):
        super().__init__()
        out_dim = out_dim or in_dim
        self.w1 = torch.nn.Linear(in_dim, hidden, bias=fc_bias)
        self.w2 = torch.nn.Linear(hidden, out_dim, bias=fc_bias)
        self.w3 = torch.nn.Linear(in_dim, hidden, bias=fc_bias)

    def forward(self, x):
        return self.w2(F.silu(self.w1(x)) * self.w3(x))


class DiTBlock(torch.nn.Module):
    def __init__(self, dim, n_heads, ffn_hidden, qk_norm=True, fc_bias=False,
                 eps=1e-5):
        super().__init__()
        self.attention = Attention(dim, n_heads, qk_norm, fc_bias, eps)
        self.cross_attention = Attention(dim, n_heads, qk_norm, fc_bias, eps)
        self.feed_forward = SwiGLU(dim, ffn_hidden, dim, fc_bias)
        self.attention_norm = RMSNorm(dim, eps)
        self.ffn_norm = RMSNorm(dim, eps)
        self.scale_shift_table = torch.nn.Parameter(torch.randn(6, dim) / dim**0.5)

    def forward(self, x, cross_x, t0, padding_mask, memory_padding_mask, rope):
        biases = self.scale_shift_table[None] + t0.reshape(x.size(0), 6, -1)
        sm, scm, gm, sf, scf, gf = biases.chunk(6, dim=1)
        h_attn = self.attention(
            self.attention_norm(x) * (1 + scm) + sm,
            key_padding_mask=padding_mask, rope=rope,
        )
        h = x + h_attn * gm
        h = h + self.cross_attention(h, cross_x=cross_x,
                                     key_padding_mask=memory_padding_mask)
        h_ff = self.feed_forward(self.ffn_norm(h) * (1 + scf) + sf)
        return h + h_ff * gf


class ConvBlock1d(torch.nn.Module):
    def __init__(self, in_ch, out_ch, k=3):
        super().__init__()
        self.groupnorm = torch.nn.GroupNorm(1, in_ch)
        self.project = torch.nn.Conv1d(in_ch, out_ch, k)

    def forward(self, x):
        x = F.silu(self.groupnorm(x))
        # audiocraft pad for k=3, s=1, d=1: (1, 1) zeros
        return self.project(F.pad(x, (1, 1)))


class Patcher(torch.nn.Module):
    """ResnetBlock1d with in==out (to_out = identity)."""

    def __init__(self, dim):
        super().__init__()
        self.block = torch.nn.Module()
        self.block.block1 = ConvBlock1d(dim, dim)
        self.block.block2 = ConvBlock1d(dim, dim)

    def forward(self, x):
        h = self.block.block2(self.block.block1(x))
        return h + x


class TimestepEmbedder(torch.nn.Module):
    def __init__(self, dim, freq_dim, fc_bias=False):
        super().__init__()
        self.freq_dim = freq_dim
        self.projection = SwiGLU(freq_dim, dim, dim, fc_bias)

    def forward(self, t):
        half = self.freq_dim // 2
        freqs = torch.exp(-math.log(10000) * torch.arange(half).float() / half)
        args = t[:, None].float() * freqs[None]
        emb = torch.cat([args.cos(), args.sin()], dim=-1)
        return self.projection(emb)


class DiTOracle(torch.nn.Module):
    def __init__(self, dim, n_heads, n_layers, context_dim, out_channels,
                 ffn_hidden, max_positions=64, freq_dim=8, eps=1e-5):
        super().__init__()
        self.n_heads = n_heads
        self.head_dim = dim // n_heads
        self.theta = max(10000, 2 * max_positions)
        self.layers = torch.nn.ModuleList(
            [DiTBlock(dim, n_heads, ffn_hidden, eps=eps) for _ in range(n_layers)]
        )
        self.norm = RMSNorm(dim, eps)
        self.output = torch.nn.Linear(dim, out_channels, bias=False)
        self.x_embedder = Patcher(dim)
        self.y_embedder = torch.nn.Module()
        self.y_embedder.projection = SwiGLU(context_dim, dim, dim)
        self.t_embedder = TimestepEmbedder(dim, freq_dim)
        self.t_block = torch.nn.Linear(dim, dim * 6, bias=True)
        self.final_layer_scale_shift_table = torch.nn.Parameter(
            torch.randn(2, dim) / dim**0.5
        )

    def forward(self, x, time, padding_mask=None, memory=None,
                memory_padding_mask=None):
        h = self.x_embedder(x.transpose(1, 2)).transpose(1, 2)
        t = self.t_embedder(time)
        t0 = self.t_block(F.silu(t))
        y = self.y_embedder.projection(memory)
        rope = rope_tables(self.head_dim, h.shape[1], self.theta)
        for layer in self.layers:
            h = layer(h, y, t0, padding_mask, memory_padding_mask, rope)
        shift, scale = (
            self.final_layer_scale_shift_table[None] + t[:, None]
        ).chunk(2, dim=1)
        h = self.norm(h)
        h = h * (1 + scale) + shift
        return self.output(h)
