"""Key-faithful torch HTSAT oracle (laion_clap htsat.py semantics + state_dict
naming: spectrogram_extractor/logmel_extractor/bn0/patch_embed/layers/norm).
Used to validate checkpoint.convert-/models/htsat against the exact swin
block math (window attention w/ relative position bias, shifted windows,
patch merging) and the HTS-AT wav->image pipeline."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class STFTModule(nn.Module):
    """torchlibrosa-style STFT: conv with fixed windowed-DFT kernels."""

    def __init__(self, n_fft, hop):
        super().__init__()
        self.n_fft, self.hop = n_fft, hop
        n_freq = n_fft // 2 + 1
        self.conv_real = nn.Conv1d(1, n_freq, n_fft, stride=hop, bias=False)
        self.conv_imag = nn.Conv1d(1, n_freq, n_fft, stride=hop, bias=False)
        win = np.hanning(n_fft + 1)[:-1]
        n = np.arange(n_fft)
        k = np.arange(n_freq)[:, None]
        self.conv_real.weight.data = torch.from_numpy(
            (win * np.cos(2 * np.pi * k * n / n_fft))[:, None, :]
        ).float()
        self.conv_imag.weight.data = torch.from_numpy(
            (-win * np.sin(2 * np.pi * k * n / n_fft))[:, None, :]
        ).float()
        for p in self.parameters():
            p.requires_grad = False

    def forward(self, x):  # (B, T) -> (B, frames, n_freq) power
        x = F.pad(x[:, None], (self.n_fft // 2, self.n_fft // 2),
                  mode="reflect")
        r = self.conv_real(x)
        i = self.conv_imag(x)
        return (r**2 + i**2).transpose(1, 2)


class LogmelModule(nn.Module):
    def __init__(self, melw):
        super().__init__()
        self.melW = nn.Parameter(torch.from_numpy(np.asarray(melw)).float(),
                                 requires_grad=False)

    def forward(self, spec):
        mel = spec @ self.melW
        return 10.0 * torch.log10(torch.clamp(mel, min=1e-10))


class WindowAttention(nn.Module):
    def __init__(self, dim, ws, n_heads):
        super().__init__()
        self.ws, self.n_heads = ws, n_heads
        self.scale = (dim // n_heads) ** -0.5
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            0.02 * torch.randn((2 * ws - 1) ** 2, n_heads)
        )
        coords = torch.stack(
            torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij")
        ).flatten(1)
        rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0)
        rel = rel + ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("relative_position_index", rel.sum(-1))

    def forward(self, x, mask=None):  # x: (B_, N, C)
        b_, n, c = x.shape
        qkv = self.qkv(x).reshape(b_, n, 3, self.n_heads, -1).permute(
            2, 0, 3, 1, 4
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(n, n, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.n_heads, n, n)
            attn = attn + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.n_heads, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


def window_partition(x, ws):
    b, h, w, c = x.shape
    return (
        x.view(b, h // ws, ws, w // ws, ws, c)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(-1, ws, ws, c)
    )


def window_reverse(x, ws, h, w):
    b = x.shape[0] // (h * w // ws // ws)
    return (
        x.view(b, h // ws, w // ws, ws, ws, -1)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(b, h, w, -1)
    )


class SwinBlock(nn.Module):
    def __init__(self, dim, res, n_heads, ws, shift, mlp_ratio=4.0):
        super().__init__()
        if res <= ws:
            shift, ws = 0, min(ws, res)
        self.res, self.ws, self.shift = res, ws, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, ws, n_heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        if shift > 0:
            img = torch.zeros(1, res, res, 1)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift),
                            slice(-shift, None)):
                    img[:, hs, wsl] = cnt
                    cnt += 1
            win = window_partition(img, ws).view(-1, ws * ws)
            mask = win.unsqueeze(1) - win.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0).masked_fill(
                mask == 0, 0.0
            )
            self.register_buffer("attn_mask", mask)
        else:
            self.attn_mask = None

    def forward(self, x):
        b, n, c = x.shape
        res = self.res
        shortcut = x
        x = self.norm1(x).view(b, res, res, c)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        win = window_partition(x, self.ws).view(-1, self.ws * self.ws, c)
        win = self.attn(win, self.attn_mask)
        x = window_reverse(win.view(-1, self.ws, self.ws, c), self.ws, res,
                           res)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x.view(b, n, c)
        return x + self.mlp(self.norm2(x))


class PatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x, res):
        b, n, c = x.shape
        x = x.view(b, res, res, c)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1).view(b, n // 4, 4 * c)
        return self.reduction(self.norm(x))


class BasicLayer(nn.Module):
    def __init__(self, dim, res, depth, n_heads, ws, downsample,
                 mlp_ratio=4.0):
        super().__init__()
        self.res = res
        self.blocks = nn.ModuleList([
            SwinBlock(dim, res, n_heads, ws,
                      0 if j % 2 == 0 else ws // 2, mlp_ratio)
            for j in range(depth)
        ])
        self.downsample = PatchMerging(dim) if downsample else None

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        if self.downsample is not None:
            x = self.downsample(x, self.res)
        return x


class PatchEmbed(nn.Module):
    def __init__(self, patch, embed_dim):
        super().__init__()
        self.proj = nn.Conv2d(1, embed_dim, patch, stride=patch)
        self.norm = nn.LayerNorm(embed_dim)

    def forward(self, x):
        x = self.proj(x).flatten(2).transpose(1, 2)
        return self.norm(x)


class HTSATOracle(nn.Module):
    """laion_clap HTSAT_Swin_Transformer (embedding path), tiny-able."""

    def __init__(self, melw, sample_rate=8000, n_fft=512, hop=400, n_mels=16,
                 spec_size=64, patch=4, embed_dim=16, depths=(2, 2),
                 num_heads=(2, 4), window_size=4, mlp_ratio=4.0):
        super().__init__()
        self.spec_size, self.n_mels = spec_size, n_mels
        self.freq_ratio = spec_size // n_mels
        self.patch = patch
        self.spectrogram_extractor = nn.Module()
        self.spectrogram_extractor.stft = STFTModule(n_fft, hop)
        self.logmel_extractor = LogmelModule(melw)
        self.bn0 = nn.BatchNorm2d(n_mels)
        self.patch_embed = PatchEmbed(patch, embed_dim)
        self.layers = nn.ModuleList()
        res = spec_size // patch
        for li, depth in enumerate(depths):
            dim = embed_dim * 2**li
            self.layers.append(BasicLayer(
                dim, res, depth, num_heads[li], window_size,
                downsample=li < len(depths) - 1, mlp_ratio=mlp_ratio,
            ))
            if li < len(depths) - 1:
                res //= 2
        self.norm = nn.LayerNorm(embed_dim * 2 ** (len(depths) - 1))

    def reshape_wav2img(self, x):  # (B, 1, T, F)
        b, c, t, f = x.shape
        target_t = self.spec_size * self.freq_ratio
        target_f = self.spec_size // self.freq_ratio
        if t < target_t:
            x = F.interpolate(x, (target_t, f), mode="bicubic",
                              align_corners=True)
        if f < target_f:
            x = F.interpolate(x, (x.shape[2], target_f), mode="bicubic",
                              align_corners=True)
        x = x.permute(0, 1, 3, 2).contiguous()  # (B, 1, F, T)
        x = x.reshape(b, c, x.shape[2], self.freq_ratio,
                      x.shape[3] // self.freq_ratio)
        x = x.permute(0, 1, 3, 2, 4).contiguous()
        return x.reshape(b, c, x.shape[2] * x.shape[3], x.shape[4])

    def forward(self, wav):  # (B, T) -> (B, out_dim)
        spec = self.spectrogram_extractor.stft(wav)  # (B, frames, n_freq)
        logmel = self.logmel_extractor(spec)[:, None]  # (B, 1, T, M)
        x = logmel.transpose(1, 3)
        x = self.bn0(x)
        x = x.transpose(1, 3)
        x = self.reshape_wav2img(x)
        x = self.patch_embed(x)
        for layer in self.layers:
            x = layer(x)
        x = self.norm(x)
        return x.mean(dim=1)


def default_tiny_melw(sample_rate=8000, n_fft=512, n_mels=16, fmin=50,
                      fmax=3500):
    from sam_audio_tpu.ops.mel import mel_filterbank

    return mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax,
                          mel_scale="slaney", norm="slaney")

