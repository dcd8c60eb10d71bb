"""Span predictor: infers temporal anchors ("when does the described sound
occur") from text + mixture latents.

Capability parity with the reference's PEAudioFrame "pe-a-frame-large" hook
(reference: sam_audio/model/model.py:96-102, 231-245): input is the text
prompt plus the first 128 latent channels of the mixture; output is a list of
(start_sec, end_sec) spans per item, which `separate(predict_spans=True)`
converts to "+" anchors and re-runs `batch.process_anchors`.

Architecture (TPU-native design, not a port of PE-AV): audio latents ->
linear embed -> N pre-LN transformer layers with RoPE self-attention and
cross-attention to T5 text features -> per-frame sigmoid head. Frame
probabilities are decoded to spans on the host with hysteresis thresholding
and a minimum-duration filter.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops.attention import attend
from sam_audio_tpu.ops.rope import apply_rope, precompute_rope


@dataclass(frozen=True)
class SpanPredictorConfig:
    audio_dim: int = 128
    text_dim: int = 768
    hidden: int = 512
    n_layers: int = 4
    n_heads: int = 8
    norm_eps: float = 1e-5
    max_positions: int = 10000
    threshold: float = 0.5
    min_duration_s: float = 0.2
    frame_rate: float = 25.0


def _layer_init(key, cfg: SpanPredictorConfig, dtype=jnp.float32):
    h = cfg.hidden
    ks = jax.random.split(key, 9)
    return {
        "ln1": N.layernorm_init(h, dtype),
        "self_attn": {
            "wq": N.linear_init(ks[0], h, h, dtype=dtype),
            "wk": N.linear_init(ks[1], h, h, dtype=dtype),
            "wv": N.linear_init(ks[2], h, h, dtype=dtype),
            "wo": N.linear_init(ks[3], h, h, dtype=dtype),
        },
        "ln_cross": N.layernorm_init(h, dtype),
        "cross_attn": {
            "wq": N.linear_init(ks[4], h, h, dtype=dtype),
            "wk": N.linear_init(ks[5], h, h, dtype=dtype),
            "wv": N.linear_init(ks[6], h, h, dtype=dtype),
            "wo": N.linear_init(ks[7], h, h, dtype=dtype),
        },
        "ln2": N.layernorm_init(h, dtype),
        "mlp": N.feedforward_init(ks[8], h, 4 * h, non_linearity="swiglu",
                                  dtype=dtype),
    }


def span_predictor_init(key, cfg: SpanPredictorConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    layer_keys = jax.random.split(ks[0], cfg.n_layers)
    return {
        "audio_embed": N.linear_init(ks[1], cfg.audio_dim, cfg.hidden,
                                     dtype=dtype),
        "text_embed": N.linear_init(ks[2], cfg.text_dim, cfg.hidden,
                                    dtype=dtype),
        "layers": jax.vmap(lambda k: _layer_init(k, cfg, dtype))(layer_keys),
        "final_norm": N.layernorm_init(cfg.hidden, dtype),
        "head": N.linear_init(ks[3], cfg.hidden, 1, dtype=dtype),
    }


def span_predictor_forward(params, cfg: SpanPredictorConfig,
                           audio_features, audio_pad_mask,
                           text_features, text_mask, compute_dtype=None):
    """audio_features: (B, T, audio_dim); text_features: (B, L, text_dim).
    Returns frame logits (B, T) fp32."""
    b, t, _ = audio_features.shape
    nh = cfg.n_heads
    hd = cfg.hidden // nh
    h = N.linear(params["audio_embed"], audio_features, compute_dtype)
    y = N.linear(params["text_embed"], text_features, compute_dtype)
    cos, sin = precompute_rope(hd, t, max(10000, 2 * cfg.max_positions))

    def body(carry, layer):
        hc = carry
        x = N.layernorm(layer["ln1"], hc, cfg.norm_eps)
        q = N.linear(layer["self_attn"]["wq"], x, compute_dtype).reshape(b, t, nh, hd)
        k = N.linear(layer["self_attn"]["wk"], x, compute_dtype).reshape(b, t, nh, hd)
        v = N.linear(layer["self_attn"]["wv"], x, compute_dtype).reshape(b, t, nh, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        o = attend(q, k, v, key_padding_mask=audio_pad_mask).reshape(b, t, -1)
        hc = hc + N.linear(layer["self_attn"]["wo"], o, compute_dtype)

        x = N.layernorm(layer["ln_cross"], hc, cfg.norm_eps)
        q = N.linear(layer["cross_attn"]["wq"], x, compute_dtype).reshape(b, t, nh, hd)
        k = N.linear(layer["cross_attn"]["wk"], y, compute_dtype).reshape(
            b, y.shape[1], nh, hd)
        v = N.linear(layer["cross_attn"]["wv"], y, compute_dtype).reshape(
            b, y.shape[1], nh, hd)
        o = attend(q, k, v, key_padding_mask=text_mask).reshape(b, t, -1)
        hc = hc + N.linear(layer["cross_attn"]["wo"], o, compute_dtype)

        x = N.layernorm(layer["ln2"], hc, cfg.norm_eps)
        hc = hc + N.feedforward(layer["mlp"], x, "swiglu", compute_dtype)
        return hc, None

    h, _ = jax.lax.scan(body, h, params["layers"])
    h = N.layernorm(params["final_norm"], h, cfg.norm_eps)
    return N.linear(params["head"], h, compute_dtype)[..., 0].astype(jnp.float32)


def frames_to_spans(probs: np.ndarray, valid_mask: np.ndarray,
                    threshold: float = 0.5, min_duration_s: float = 0.2,
                    frame_rate: float = 25.0) -> List[List[Tuple[float, float]]]:
    """Per-item run-length decoding of frame probabilities into (start, end)
    second spans."""
    out = []
    min_frames = max(1, int(round(min_duration_s * frame_rate)))
    for p, m in zip(probs, valid_mask):
        active = (p > threshold) & m
        spans = []
        start = None
        for i, a in enumerate(active.tolist() + [False]):
            if a and start is None:
                start = i
            elif not a and start is not None:
                if i - start >= min_frames:
                    spans.append((start / frame_rate, i / frame_rate))
                start = None
        out.append(spans)
    return out


# ---------------------------------------------------------------------------
# PEAudioFrame-compatible executor
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PEAudioFrameConfig:
    """Config for a converted PEAudioFrame ("pe-a-frame-large") checkpoint
    (reference model.py:96-102). The transformer arch switches are sniffed at
    conversion time by checkpoint.convert_peav_tower."""

    audio_dim: int = 128
    hidden: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    vocab_size: int = 50368
    threshold: float = 0.5
    min_duration_s: float = 0.2
    prenorm: bool = True
    act: str = "gelu_tanh"
    pos: str = "sinusoidal"
    norm: str = "layernorm"


def peaudioframe_forward(params, cfg: PEAudioFrameConfig, audio_features,
                         audio_pad_mask, input_ids, attention_mask,
                         compute_dtype=None):
    """Joint-sequence PEAudioFrame executor: [text token embeddings ;
    projected audio frames] through one PE-AV transformer, frame head over
    the audio positions. Returns frame logits (B, T) fp32.

    audio_features: (B, T, audio_dim) mixture latents (first 128 channels,
    reference model.py:238); input_ids/attention_mask from the text
    transform (reference model.py:234-242)."""
    from sam_audio_tpu.config import PEAVTransformerConfig
    from sam_audio_tpu.models.peav import peav_apply

    b, t, _ = audio_features.shape
    text = N.embedding(params["text_embed"], input_ids)
    audio = N.linear(params["data_proj"], audio_features, compute_dtype)
    x = jnp.concatenate([text.astype(audio.dtype), audio], axis=1)
    mask = jnp.concatenate(
        [attention_mask.astype(bool), audio_pad_mask.astype(bool)], axis=1
    )
    tf_cfg = PEAVTransformerConfig(
        hidden_size=cfg.hidden, num_layers=cfg.num_layers,
        num_heads=cfg.num_heads, prenorm=cfg.prenorm, act=cfg.act,
        pos=cfg.pos, norm=cfg.norm,
    )
    out = peav_apply(params["transformer"], x, tf_cfg, padding_mask=mask,
                     compute_dtype=compute_dtype)
    frames = out.last_hidden_state[:, -t:]
    return N.linear(params["head"], frames, None)[..., 0].astype(jnp.float32)


class PEAudioFrameModel:
    """Span predictor running a converted PEAudioFrame checkpoint; same
    callable interface as SpanPredictor."""

    def __init__(self, cfg: PEAudioFrameConfig, params, tokenizer=None):
        self.cfg = cfg
        self.params = params
        self._tokenizer = tokenizer

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

            self._tokenizer = ByteFallbackTokenizer(self.cfg.vocab_size)
        return self._tokenizer

    def __call__(self, model, batch, audios) -> List[List[Tuple[float, float]]]:
        from sam_audio_tpu.models import dacvae

        lat = dacvae.encode(model.params["audio_codec"], jnp.asarray(audios),
                            model.cfg.audio_codec)
        lat = jnp.swapaxes(lat, 1, 2)[..., : self.cfg.audio_dim]
        ids, mask = self.tokenizer(batch.descriptions)
        pad_mask = jnp.asarray(batch.audio_pad_mask)
        logits = peaudioframe_forward(
            self.params, self.cfg, lat, pad_mask, jnp.asarray(ids),
            jnp.asarray(mask),
        )
        probs = np.asarray(jax.nn.sigmoid(logits))
        fps = model.sample_rate / model.hop_length
        return frames_to_spans(
            probs, np.asarray(batch.audio_pad_mask),
            threshold=self.cfg.threshold,
            min_duration_s=self.cfg.min_duration_s, frame_rate=fps,
        )


def convert_peaudioframe_state_dict(sd, cfg: PEAudioFrameConfig):
    """Map a PEAudioFrame checkpoint onto the executor params.

    The transformer tower is layout-sniffed via checkpoint.convert_peav_tower
    (same naming families validated for the judge's PE-AV towers); the text
    embedding / audio projection / frame head are matched by common names.
    Returns (params, arch, unconverted)."""
    import numpy as onp

    from sam_audio_tpu.checkpoint import convert_peav_tower

    sd = {k[7:] if k.startswith("module.") else k: onp.asarray(v)
          for k, v in sd.items()}
    consumed = set()

    def lin(base):
        p = {"weight": jnp.asarray(sd[f"{base}.weight"])}
        consumed.add(f"{base}.weight")
        if f"{base}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{base}.bias"])
            consumed.add(f"{base}.bias")
        return p

    def find(cands):
        for c in cands:
            if f"{c}.weight" in sd:
                return c
        return None

    tower_prefix = None
    for cand in ("transformer.", "audio_encoder.", "encoder.", "model.", ""):
        try:
            tower, arch, left = convert_peav_tower(sd, cand, cfg)
            tower_prefix = cand
            break
        except (ValueError, KeyError):
            continue
    if tower_prefix is None:
        raise ValueError("no PE-AV transformer tower found in state_dict")
    consumed |= {k for k in sd if k.startswith(tower_prefix)} - set(left)

    params = {"transformer": tower}
    emb = find(["text_embed", "token_embedding", "embed_tokens",
                "text_embedding", "word_embeddings",
                "text_encoder.embed_tokens"])
    if emb:
        params["text_embed"] = lin(emb)
    proj = find(["data_proj", "input_proj", "audio_proj", "in_proj", "proj"])
    if proj:
        params["data_proj"] = lin(proj)
    head = find(["head", "frame_head", "classifier", "span_head", "fc_out"])
    if head:
        params["head"] = lin(head)
    unconverted = sorted(set(sd) - consumed)
    return params, arch, unconverted


class SpanPredictor:
    """Callable attached to SAMAudio.span_predictor: (model, batch, audios)
    -> per-item span lists."""

    def __init__(self, cfg: SpanPredictorConfig, params):
        self.cfg = cfg
        self.params = params

    @classmethod
    def init_random(cls, key, cfg: SpanPredictorConfig = SpanPredictorConfig()):
        return cls(cfg, span_predictor_init(key, cfg))

    def __call__(self, model, batch, audios) -> List[List[Tuple[float, float]]]:
        from sam_audio_tpu.models import dacvae
        from sam_audio_tpu.models.t5 import t5_encode

        # Featurize in the model's compute dtype — train/span.py encodes
        # features the same way, so train and serve see identical inputs.
        compute_dtype = jnp.dtype(model.cfg.compute_dtype)
        lat = dacvae.encode(model.params["audio_codec"], jnp.asarray(audios),
                            model.cfg.audio_codec,
                            compute_dtype=compute_dtype)
        lat = jnp.swapaxes(lat, 1, 2).astype(jnp.float32)[..., : self.cfg.audio_dim]
        text_ids, text_mask = model._tokenize(batch.descriptions)
        text_features = t5_encode(model.params["text_encoder"], text_ids,
                                  text_mask, model.cfg.text_encoder,
                                  compute_dtype=compute_dtype)
        pad_mask = jnp.asarray(batch.audio_pad_mask)
        logits = span_predictor_forward(
            self.params, self.cfg, lat, pad_mask, text_features, text_mask
        )
        probs = np.asarray(jax.nn.sigmoid(logits))
        fps = model.sample_rate / model.hop_length
        return frames_to_spans(
            probs, np.asarray(batch.audio_pad_mask),
            threshold=self.cfg.threshold,
            min_duration_s=self.cfg.min_duration_s, frame_rate=fps,
        )
