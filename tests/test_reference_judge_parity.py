"""Full-judge parity against the REAL reference judge.py.

The reference judge's fusion pipeline (reference sam_audio/model/judge.py:
90-132 — text layer-22 CLS, stacked codec pass, cat+bottleneck, text
broadcast, finetune tower, masked mean, de-normalize) is executed from the
actual source with small stand-in towers:

  * PE-AV `Transformer` -> a torch module in the fairseq key layout our
    converter sniffs (prenorm, gelu-tanh, no positional table), since the
    real perception-models code is not installable here;
  * `DACVAEEncoder` -> the key-faithful torch DAC-VAE oracle's encoder with
    the reference's reflect-pad + in_proj/chunk semantics (codec.py:65-78);
  * ModernBERT -> the real HF module (installed).

The resulting state_dict converts through convert_judge_state_dict and our
judge_forward must reproduce the reference outputs numerically.
"""

import math
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
import torch.nn.functional as F
from torch import nn

import dataclasses

import jax.numpy as jnp

from reference_loader import REF_MODEL_DIR, _exec_module, load_reference
from torch_dacvae_oracle import DACVAEOracle

from sam_audio_tpu.checkpoint import convert_judge_state_dict
from sam_audio_tpu.config import (
    DACVAEConfig,
    ModernBertTextConfig,
    PEAVTransformerConfig,
    SAMAudioJudgeConfig,
)
from sam_audio_tpu.models.judge import judge_forward


class _Attn(nn.Module):
    def __init__(self, h, nh):
        super().__init__()
        self.q_proj = nn.Linear(h, h)
        self.k_proj = nn.Linear(h, h)
        self.v_proj = nn.Linear(h, h)
        self.out_proj = nn.Linear(h, h)
        self.nh = nh

    def forward(self, x, padding_mask):
        b, t, h = x.shape
        q = self.q_proj(x).view(b, t, self.nh, -1).transpose(1, 2)
        k = self.k_proj(x).view(b, t, self.nh, -1).transpose(1, 2)
        v = self.v_proj(x).view(b, t, self.nh, -1).transpose(1, 2)
        mask = None
        if padding_mask is not None:
            mask = padding_mask[:, None, None, :].bool()
        o = F.scaled_dot_product_attention(q, k, v, attn_mask=mask)
        return self.out_proj(o.transpose(1, 2).reshape(b, t, h))


class _Layer(nn.Module):
    def __init__(self, h, nh):
        super().__init__()
        self.self_attn = _Attn(h, nh)
        self.self_attn_layer_norm = nn.LayerNorm(h)
        self.final_layer_norm = nn.LayerNorm(h)
        mlp = 2 * h
        self.fc1 = nn.Linear(h, mlp)
        self.fc2 = nn.Linear(mlp, h)

    def forward(self, x, padding_mask):
        x = x + self.self_attn(self.self_attn_layer_norm(x), padding_mask)
        y = self.fc2(F.gelu(self.fc1(self.final_layer_norm(x)),
                            approximate="tanh"))
        return x + y


class StubPEAVTransformer(nn.Module):
    """Key-faithful stand-in for perception-models' Transformer (fairseq
    naming; prenorm; gelu-tanh; positional-encoding-free)."""

    def __init__(self, cfg):
        super().__init__()
        self.layers = nn.ModuleList([
            _Layer(cfg.hidden_size, cfg.num_heads)
            for _ in range(cfg.num_layers)
        ])

    def forward(self, x, padding_mask=None):
        from core.audio_visual_encoder.transformer import (
            BaseModelOutputWithPooling,
        )

        # judge.py:108 feeds a (B,)-batch mask to the (2B,)-stacked tower
        # call; the tower must tile it (same reading as our judge_forward)
        if padding_mask is not None and padding_mask.size(0) != x.size(0):
            rep = x.size(0) // padding_mask.size(0)
            padding_mask = padding_mask.repeat(rep, 1)
        for layer in self.layers:
            x = layer(x, padding_mask)
        if padding_mask is not None:
            m = padding_mask[:, :, None].float()
            pooled = (x * m).sum(1) / m.sum(1).clamp(min=1.0)
        else:
            pooled = x.mean(1)
        return BaseModelOutputWithPooling(last_hidden_state=x,
                                          pooler_output=pooled)


class StubDACVAEEncoder(nn.Module):
    """Reference DACVAEEncoder semantics (codec.py:42-78) over the torch
    DAC-VAE oracle's encoder + quantizer.in_proj."""

    def __init__(self, cfg):
        super().__init__()
        oracle = DACVAEOracle(cfg.encoder_dim, list(cfg.encoder_rates),
                              cfg.latent_dim, cfg.decoder_dim,
                              list(cfg.decoder_rates), cfg.codebook_dim)
        self.encoder = oracle.encoder
        self.quantizer = nn.Module()
        self.quantizer.in_proj = oracle.quantizer.in_proj
        self.hop_length = math.prod(cfg.encoder_rates)

    def forward(self, waveform):
        length = waveform.size(-1)
        if length % self.hop_length:
            p1d = (0, self.hop_length - (length % self.hop_length))
            waveform = F.pad(waveform, p1d, "reflect")
        z = self.encoder(waveform)
        mean, _ = self.quantizer.in_proj(z).chunk(2, dim=1)
        return mean


def _load_reference_judge():
    if "sam_audio.model.judge" in sys.modules:
        return sys.modules["sam_audio.model.judge"]
    load_reference()

    import dataclasses as dc

    tmod = types.ModuleType("core.audio_visual_encoder.transformer")

    @dc.dataclass
    class BaseModelOutputWithPooling:
        last_hidden_state: torch.Tensor
        pooler_output: torch.Tensor = None

    tmod.BaseModelOutputWithPooling = BaseModelOutputWithPooling
    tmod.Transformer = StubPEAVTransformer
    sys.modules["core.audio_visual_encoder.transformer"] = tmod
    sys.modules["core.audio_visual_encoder"].transformer = tmod

    sys.modules["sam_audio.model.codec"].DACVAEEncoder = StubDACVAEEncoder
    return _exec_module("sam_audio.model.judge", f"{REF_MODEL_DIR}/judge.py")


TEXT = dict(vocab_size=300, hidden_size=16, num_hidden_layers=3,
            num_attention_heads=2, intermediate_size=24,
            global_attn_every_n_layers=3, local_attention=8,
            pad_token_id=0, bos_token_id=1, eos_token_id=2, cls_token_id=3,
            sep_token_id=4)
CODEC = dict(encoder_dim=4, encoder_rates=[2, 4], latent_dim=16,
             decoder_dim=16, decoder_rates=[4, 2], codebook_dim=4,
             sample_rate=8000)


def test_judge_forward_matches_real_reference_pipeline():
    jmod = _load_reference_judge()
    ref_cfg_mod = sys.modules["sam_audio.model.config"]
    ref_cfg = ref_cfg_mod.SAMAudioJudgeConfig(
        audio_codec=dict(CODEC),
        transformer=dict(hidden_size=16, num_layers=2, num_heads=2),
        finetune_transformer=dict(hidden_size=12, num_layers=1, num_heads=2),
        text_model=dict(TEXT),
        nth_text_layer=2,
        bottleneck_dim=8,
    )
    torch.manual_seed(11)
    ref = jmod.SAMAudioJudgeModel(ref_cfg).eval()
    with torch.no_grad():
        ref.mean.copy_(torch.arange(4, dtype=torch.float32))
        ref.std.copy_(torch.full((4,), 2.0))

    b, tw, l = 2, 64, 6
    rng = np.random.RandomState(12)
    input_ids = rng.randint(5, 300, (b, l)).astype(np.int64)
    attention_mask = np.ones((b, l), np.int64)
    attention_mask[1, 4:] = 0
    input_values = rng.randn(b, 1, tw).astype(np.float32) * 0.3
    separated_values = rng.randn(b, 1, tw).astype(np.float32) * 0.3
    padding_mask = np.ones((b, tw), bool)
    padding_mask[1, 40:] = False

    with torch.no_grad():
        want = ref(
            input_ids=torch.from_numpy(input_ids),
            input_values=torch.from_numpy(input_values),
            separated_values=torch.from_numpy(separated_values),
            attention_mask=torch.from_numpy(attention_mask),
            padding_mask=torch.from_numpy(padding_mask),
        )

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = SAMAudioJudgeConfig(
        audio_codec=DACVAEConfig(**{**CODEC,
                                    "encoder_rates": (2, 4),
                                    "decoder_rates": (4, 2)}),
        transformer=PEAVTransformerConfig(hidden_size=16, num_layers=2,
                                          num_heads=2, pos="none"),
        finetune_transformer=PEAVTransformerConfig(hidden_size=12,
                                                   num_layers=1, num_heads=2,
                                                   pos="none"),
        text_model=ModernBertTextConfig(**{
            k: v for k, v in TEXT.items()
            if k in ModernBertTextConfig.__dataclass_fields__}),
        nth_text_layer=2, bottleneck_dim=8, compute_dtype="float32",
    )
    params, unconverted, archs = convert_judge_state_dict(sd, cfg,
                                                          return_arch=True)
    assert unconverted == [], unconverted
    cfg = dataclasses.replace(
        cfg,
        transformer=dataclasses.replace(cfg.transformer,
                                        **archs["transformer"]),
        finetune_transformer=dataclasses.replace(
            cfg.finetune_transformer, **archs["finetune_transformer"]),
    )

    got = judge_forward(
        params, cfg,
        input_ids=jnp.asarray(input_ids.astype(np.int32)),
        input_values=jnp.asarray(input_values),
        separated_values=jnp.asarray(separated_values),
        attention_mask=jnp.asarray(attention_mask.astype(bool)),
        padding_mask=jnp.asarray(padding_mask),
    )
    for name in ("overall", "recall", "precision", "faithfulness"):
        ours = np.asarray(getattr(got, name))
        theirs = getattr(want, name).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4,
                                   err_msg=name)
