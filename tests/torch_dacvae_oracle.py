"""Independent PyTorch oracle of the DAC-VAE codec (Descript-DAC conventions,
VAE bottleneck), with Sequential key naming matching the published DAC layout
(encoder.block.N..., decoder.model.N...) used by the reference checkpoints.
"""

import math

import torch
import torch.nn as nn


def WNConv1d(*args, **kwargs):
    return nn.utils.weight_norm(nn.Conv1d(*args, **kwargs))


def WNConvTranspose1d(*args, **kwargs):
    return nn.utils.weight_norm(nn.ConvTranspose1d(*args, **kwargs))


class Snake1d(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, channels, 1))

    def forward(self, x):
        return x + (self.alpha + 1e-9).reciprocal() * torch.sin(self.alpha * x).pow(2)


class ResidualUnit(nn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = nn.Sequential(
            Snake1d(dim),
            WNConv1d(dim, dim, kernel_size=7, dilation=dilation, padding=pad),
            Snake1d(dim),
            WNConv1d(dim, dim, kernel_size=1),
        )

    def forward(self, x):
        return x + self.block(x)


class EncoderBlock(nn.Module):
    def __init__(self, dim, stride):
        super().__init__()
        self.block = nn.Sequential(
            ResidualUnit(dim // 2, 1),
            ResidualUnit(dim // 2, 3),
            ResidualUnit(dim // 2, 9),
            Snake1d(dim // 2),
            WNConv1d(dim // 2, dim, kernel_size=2 * stride, stride=stride,
                     padding=math.ceil(stride / 2)),
        )

    def forward(self, x):
        return self.block(x)


class Encoder(nn.Module):
    def __init__(self, d_model, rates, latent_dim):
        super().__init__()
        layers = [WNConv1d(1, d_model, kernel_size=7, padding=3)]
        for stride in rates:
            d_model *= 2
            layers.append(EncoderBlock(d_model, stride))
        layers += [
            Snake1d(d_model),
            WNConv1d(d_model, latent_dim, kernel_size=3, padding=1),
        ]
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        return self.block(x)


class DecoderBlock(nn.Module):
    def __init__(self, in_dim, out_dim, stride):
        super().__init__()
        self.block = nn.Sequential(
            Snake1d(in_dim),
            WNConvTranspose1d(in_dim, out_dim, kernel_size=2 * stride,
                              stride=stride, padding=math.ceil(stride / 2)),
            ResidualUnit(out_dim, 1),
            ResidualUnit(out_dim, 3),
            ResidualUnit(out_dim, 9),
        )

    def forward(self, x):
        return self.block(x)


class Decoder(nn.Module):
    def __init__(self, input_channel, channels, rates):
        super().__init__()
        layers = [WNConv1d(input_channel, channels, kernel_size=7, padding=3)]
        for i, stride in enumerate(rates):
            layers.append(DecoderBlock(channels // 2**i, channels // 2 ** (i + 1),
                                       stride))
        layers += [
            Snake1d(channels // 2 ** len(rates)),
            WNConv1d(channels // 2 ** len(rates), 1, kernel_size=7, padding=3),
            nn.Tanh(),
        ]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class VAEQuantizer(nn.Module):
    def __init__(self, latent_dim, codebook_dim):
        super().__init__()
        self.in_proj = WNConv1d(latent_dim, 2 * codebook_dim, kernel_size=1)
        self.out_proj = WNConv1d(codebook_dim, latent_dim, kernel_size=1)


class DACVAEOracle(nn.Module):
    def __init__(self, encoder_dim, encoder_rates, latent_dim, decoder_dim,
                 decoder_rates, codebook_dim):
        super().__init__()
        self.encoder = Encoder(encoder_dim, encoder_rates, latent_dim)
        self.quantizer = VAEQuantizer(latent_dim, codebook_dim)
        self.decoder = Decoder(latent_dim, decoder_dim, decoder_rates)
        self.codebook_dim = codebook_dim
        self.hop = math.prod(encoder_rates)

    def encode(self, wav):
        length = wav.size(-1)
        if length % self.hop:
            wav = torch.nn.functional.pad(
                wav, (0, self.hop - length % self.hop), mode="reflect"
            )
        z = self.encoder(wav)
        mean, _ = self.quantizer.in_proj(z).chunk(2, dim=1)
        return mean

    def decode(self, encoded):
        return self.decoder(self.quantizer.out_proj(encoded))
