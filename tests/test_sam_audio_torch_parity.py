"""Full-model golden parity: a reference-shaped torch SAMAudio (codec oracle +
top-level conditioning layers + DiT oracle) converted through
checkpoint.convert_sam_audio_state_dict must reproduce one complete velocity-
field evaluation (align_inputs + anchors + video fusion + memory + DiT) and
the codec encode path through our JAX stack."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sam_audio_tpu.checkpoint import convert_sam_audio_state_dict
from sam_audio_tpu.config import DACVAEConfig, SAMAudioConfig, T5EncoderConfig, TransformerConfig
from sam_audio_tpu.models import dacvae
from sam_audio_tpu.models.sam_audio import forward

from torch_dacvae_oracle import DACVAEOracle
from torch_dit_oracle import DiTOracle, RMSNorm, SwiGLU  # noqa: F401

ACFG = DACVAEConfig(
    encoder_dim=4, encoder_rates=(2, 4), latent_dim=16, decoder_dim=16,
    decoder_rates=(4, 2), codebook_dim=4, sample_rate=8000,
)
DIM, HEADS, LAYERS, CTX, OUT = 32, 4, 2, 32, 8
TCFG = TransformerConfig(
    dim=DIM, n_heads=HEADS, n_layers=LAYERS, dropout=0.0, context_dim=CTX,
    max_positions=64, frequency_embedding_dim=8, out_channels=OUT,
    in_channels=None,
)
CFG = SAMAudioConfig(
    in_channels=3 * 2 * ACFG.codebook_dim,  # 24
    audio_codec=ACFG,
    text_encoder=T5EncoderConfig(dim=16, num_layers=1, num_heads=2, head_dim=8,
                                 d_ff=32, vocab_size=64),
    transformer=TCFG,
    num_anchors=3,
    anchor_embedding_dim=8,
    span_predictor=None,
    compute_dtype="float32",
)
VISION_DIM = CFG.vision_encoder.dim  # 1024 default


class SAMAudioOracle(torch.nn.Module):
    """Reference-shaped top model (state_dict keys match the reference)."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(0)
        self.audio_codec = DACVAEOracle(
            encoder_dim=ACFG.encoder_dim, encoder_rates=list(ACFG.encoder_rates),
            latent_dim=ACFG.latent_dim, decoder_dim=ACFG.decoder_dim,
            decoder_rates=list(ACFG.decoder_rates), codebook_dim=ACFG.codebook_dim,
        )
        self.transformer = DiTOracle(DIM, HEADS, LAYERS, CTX, OUT,
                                     TCFG.ffn_hidden_dim, max_positions=64,
                                     freq_dim=8)
        self.proj = torch.nn.Linear(CFG.in_channels, DIM)
        self.align_masked_video = torch.nn.Module()
        self.align_masked_video.conv = torch.nn.Conv1d(VISION_DIM, DIM, 1)
        self.align_masked_video.layer_norm = torch.nn.LayerNorm(DIM)
        self.align_masked_video.gate = torch.nn.Parameter(torch.tensor([0.3]))
        self.embed_anchors = torch.nn.Module()
        self.embed_anchors.embed = torch.nn.Embedding(
            CFG.num_anchors + 1, CFG.anchor_embedding_dim,
            padding_idx=CFG.num_anchors,
        )
        self.embed_anchors.gate = torch.nn.Parameter(torch.tensor([0.2]))
        self.embed_anchors.proj = torch.nn.Linear(CFG.anchor_embedding_dim, DIM,
                                                  bias=False)
        self.memory_proj = torch.nn.Linear(CFG.text_encoder.dim, DIM)

    def sinusoidal(self, pos, dim=DIM, theta=10000):
        import math

        half = dim // 2
        inv_freq = torch.exp(-math.log(theta) * torch.arange(half).float() / half)
        emb = torch.einsum("i,j->ij", pos, inv_freq)
        return torch.cat((emb.cos(), emb.sin()), dim=-1)

    def forward(self, noisy, audio_features, text_features, time, video,
                text_mask, anchor_ids, anchor_alignment, pad_mask):
        x = torch.cat([noisy, torch.zeros_like(audio_features), audio_features],
                      dim=2)
        projected = self.proj(x)
        post = self.align_masked_video.conv(video).permute(0, 2, 1)
        post = self.align_masked_video.layer_norm(post)
        aligned = projected + self.align_masked_video.gate.tanh() * post
        embs = self.embed_anchors.embed(anchor_ids.gather(1, anchor_alignment))
        aligned = aligned + self.embed_anchors.gate.tanh() * \
            self.embed_anchors.proj(embs)
        memory = self.memory_proj(text_features) + \
            self.sinusoidal(time).unsqueeze(1)
        return self.transformer(aligned, time, padding_mask=pad_mask,
                                memory=memory, memory_padding_mask=text_mask)


def test_full_forward_parity():
    oracle = SAMAudioOracle().eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_sam_audio_state_dict(sd, CFG)

    rng = np.random.RandomState(0)
    b, t, l = 2, 8, 5
    c2 = 2 * ACFG.codebook_dim
    noisy = rng.randn(b, t, c2).astype(np.float32)
    feats = rng.randn(b, t, c2).astype(np.float32)
    text = rng.randn(b, l, CFG.text_encoder.dim).astype(np.float32)
    time = rng.rand(b).astype(np.float32)
    video = rng.randn(b, VISION_DIM, t).astype(np.float32)
    text_mask = np.ones((b, l), bool)
    text_mask[0, 3:] = False
    anchor_ids = np.array([[0, 3, 1, 3], [0, 3, 2, 1]], np.int64)
    alignment = rng.randint(0, 4, (b, t)).astype(np.int64)
    pad_mask = np.ones((b, t), bool)
    pad_mask[1, 6:] = False

    ours = np.asarray(forward(
        params, CFG,
        noisy_audio=jnp.asarray(noisy),
        audio_features=jnp.asarray(feats),
        text_features=jnp.asarray(text),
        time=jnp.asarray(time),
        masked_video_features=jnp.asarray(video),
        text_mask=jnp.asarray(text_mask),
        anchor_ids=jnp.asarray(anchor_ids.astype(np.int32)),
        anchor_alignment=jnp.asarray(alignment.astype(np.int32)),
        audio_pad_mask=jnp.asarray(pad_mask),
    ))
    with torch.no_grad():
        theirs = oracle(
            torch.from_numpy(noisy), torch.from_numpy(feats),
            torch.from_numpy(text), torch.from_numpy(time),
            torch.from_numpy(video), torch.from_numpy(text_mask),
            torch.from_numpy(anchor_ids), torch.from_numpy(alignment),
            torch.from_numpy(pad_mask),
        ).numpy()
    np.testing.assert_allclose(ours[pad_mask], theirs[pad_mask],
                               rtol=1e-4, atol=1e-4)


def test_codec_paths_through_full_converter():
    oracle = SAMAudioOracle().eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_sam_audio_state_dict(sd, CFG)

    rng = np.random.RandomState(1)
    wav = (rng.randn(2, 1, 37) * 0.3).astype(np.float32)
    ours_enc = np.asarray(dacvae.encode(params["audio_codec"],
                                        jnp.asarray(wav), ACFG))
    with torch.no_grad():
        theirs_enc = oracle.audio_codec.encode(torch.from_numpy(wav)).numpy()
    np.testing.assert_allclose(ours_enc, theirs_enc, rtol=1e-4, atol=1e-4)

    z = rng.randn(1, ACFG.codebook_dim, 6).astype(np.float32)
    ours_dec = np.asarray(dacvae.decode(params["audio_codec"],
                                        jnp.asarray(z), ACFG))
    with torch.no_grad():
        theirs_dec = oracle.audio_codec.decode(torch.from_numpy(z)).numpy()
    np.testing.assert_allclose(ours_dec, theirs_dec, rtol=1e-4, atol=1e-4)
