"""SAMAudioJudge: quality scorer for (text, mixture, separated) triplets.

Scores 4 axes — overall, recall, precision, faithfulness — matching the
reference pipeline (sam_audio/model/judge.py:35-132):

  text:  ModernBERT -> hidden layer `nth_text_layer` -> CLS -> text_proj1
  audio: [mixture ; separated] stacked on batch -> frozen DAC-VAE *encoder*
         -> data_proj -> shared PE-AV transformer
  fuse:  concat(hyp, input) -> cat_audio_proj (bottleneck 256)
         + layernorm(text_proj2(text)) broadcast -> proj_audio_and_text
         -> finetune PE-AV transformer -> 4-dim head -> masked mean
         -> de-normalize (x * std + mean)

The whole forward is one jittable function; the two PE-AV towers run the
stacked 2B batch in a single pass so the MXU sees one large matmul stream.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from sam_audio_tpu.config import SAMAudioJudgeConfig
from sam_audio_tpu.models import dacvae
from sam_audio_tpu.models.modernbert import modernbert_encode, modernbert_init
from sam_audio_tpu.models.peav import peav_apply, peav_init
from sam_audio_tpu.ops import nn as N


@dataclass
class SAMAudioJudgeOutput:
    """reference: sam_audio/model/judge.py:16-32."""

    overall: Optional[jnp.ndarray] = None
    recall: Optional[jnp.ndarray] = None
    precision: Optional[jnp.ndarray] = None
    faithfulness: Optional[jnp.ndarray] = None


def judge_init(key, cfg: SAMAudioJudgeConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 10)
    h = cfg.transformer.hidden_size
    return {
        "audio_codec": dacvae.dacvae_init(ks[0], cfg.audio_codec, dtype,
                                          with_decoder=False),
        "data_proj": N.linear_init(ks[1], cfg.audio_codec.codebook_dim, h,
                                   dtype=dtype),
        "transformer": peav_init(ks[2], cfg.transformer, dtype),
        "finetune_transformer": peav_init(ks[3], cfg.finetune_transformer, dtype),
        "text_model": modernbert_init(ks[4], cfg.text_model, dtype),
        "cat_audio_proj": N.linear_init(ks[5], 2 * h, cfg.bottleneck_dim,
                                        dtype=dtype),
        "text_proj1": N.linear_init(ks[6], cfg.text_model.hidden_size, h,
                                    bias=False, dtype=dtype),
        "text_proj2": N.linear_init(ks[7], h, cfg.bottleneck_dim, dtype=dtype),
        "layer_norm": N.layernorm_init(cfg.bottleneck_dim, dtype),
        "proj_audio_and_text": N.linear_init(
            ks[8], 2 * cfg.bottleneck_dim, cfg.bottleneck_dim, dtype=dtype
        ),
        "finetune_data_proj": N.linear_init(
            ks[9], cfg.bottleneck_dim, cfg.finetune_transformer.hidden_size,
            dtype=dtype,
        ),
        "head": N.linear_init(jax.random.fold_in(key, 99),
                              cfg.finetune_transformer.hidden_size, 4,
                              bias=False, dtype=dtype),
        "mean": jnp.zeros((4,), dtype),
        "std": jnp.ones((4,), dtype),
    }


def judge_forward(
    params,
    cfg: SAMAudioJudgeConfig,
    input_ids: jnp.ndarray,        # (B, L) tokenized text
    input_values: jnp.ndarray,     # (B, 1, Tw) mixture waveform
    separated_values: jnp.ndarray, # (B, 1, Tw) separated waveform
    attention_mask: Optional[jnp.ndarray] = None,
    padding_mask: Optional[jnp.ndarray] = None,  # (B, Tw) audio sample mask
    compute_dtype=None,
) -> SAMAudioJudgeOutput:
    if attention_mask is None:
        attention_mask = jnp.ones(input_ids.shape, bool)
    nth = cfg.nth_text_layer
    last, hidden = modernbert_encode(
        params["text_model"], input_ids, attention_mask, cfg.text_model,
        compute_dtype, output_hidden_states=nth is not None,
    )
    text_out = last if nth is None else hidden[nth]
    text_features = N.linear(params["text_proj1"], text_out[:, 0], compute_dtype)

    # stack mixture+separated on the batch axis: one codec/tower pass
    stacked = jnp.concatenate([input_values, separated_values], axis=0)
    codec_feats = dacvae.encode(params["audio_codec"], stacked, cfg.audio_codec,
                                compute_dtype)  # (2B, C, T)
    feature_padding_mask = None
    if padding_mask is not None:
        feature_padding_mask = padding_mask[:, :: cfg.audio_codec.hop_length]
        stacked_mask = jnp.concatenate([feature_padding_mask] * 2, axis=0)
    else:
        stacked_mask = None

    x = N.linear(params["data_proj"], jnp.swapaxes(codec_feats, 1, 2),
                 compute_dtype)
    tower_out = peav_apply(params["transformer"], x, cfg.transformer,
                           padding_mask=stacked_mask, compute_dtype=compute_dtype)
    b = input_values.shape[0]
    input_features = tower_out.last_hidden_state[:b]
    hyp_features = tower_out.last_hidden_state[b:]

    return _fuse_and_score(params, cfg, text_features, input_features,
                           hyp_features, feature_padding_mask, compute_dtype)


def _fuse_and_score(params, cfg, text_features, input_features, hyp_features,
                    feature_padding_mask, compute_dtype):
    """Per-candidate fusion tail (reference judge.py:112-132): bottleneck the
    (hyp, input) tower features, add the broadcast text bottleneck, run the
    finetune PE-AV tower, score 4 axes, masked-mean pool, de-normalize."""
    audio_features = N.linear(
        params["cat_audio_proj"],
        jnp.concatenate([hyp_features, input_features], axis=2),
        compute_dtype,
    )
    expanded_text = N.layernorm(
        params["layer_norm"],
        N.linear(params["text_proj2"], text_features, compute_dtype),
    )[:, None, :]
    expanded_text = jnp.broadcast_to(
        expanded_text, audio_features.shape[:2] + expanded_text.shape[2:]
    )
    audio_and_text = N.linear(
        params["proj_audio_and_text"],
        jnp.concatenate([audio_features, expanded_text.astype(audio_features.dtype)],
                        axis=2),
        compute_dtype,
    )
    ft_out = peav_apply(
        params["finetune_transformer"],
        N.linear(params["finetune_data_proj"], audio_and_text, compute_dtype),
        cfg.finetune_transformer,
        padding_mask=feature_padding_mask,
        compute_dtype=compute_dtype,
    )
    result = N.linear(params["head"], ft_out.last_hidden_state, compute_dtype)
    result = result.astype(jnp.float32)
    if feature_padding_mask is not None:
        m = feature_padding_mask[:, :, None].astype(jnp.float32)
        pooled = jnp.sum(result * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    else:
        pooled = jnp.mean(result, axis=1)
    de_norm = pooled * params["std"].astype(jnp.float32) + params["mean"].astype(
        jnp.float32
    )
    return SAMAudioJudgeOutput(
        overall=de_norm[:, 0:1],
        recall=de_norm[:, 1:2],
        precision=de_norm[:, 2:3],
        faithfulness=de_norm[:, 3:4],
    )


def judge_forward_grouped(
    params,
    cfg: SAMAudioJudgeConfig,
    input_ids: jnp.ndarray,        # (B, L) — ONE text per item
    input_values: jnp.ndarray,     # (B, 1, Tw) — ONE mixture per item
    separated_values: jnp.ndarray, # (B*k, 1, Tw) — k candidates per item
    attention_mask: Optional[jnp.ndarray] = None,   # (B, L)
    padding_mask: Optional[jnp.ndarray] = None,     # (B, Tw), shared by an
                                                    # item's mixture+candidates
    k: int = 1,
    compute_dtype=None,
) -> SAMAudioJudgeOutput:
    """Exact-parity dedup of `judge_forward` for k-candidate reranking.

    `judge_forward` on the flattened (B*k) pair batch runs ModernBERT k times
    per text and the codec encoder + shared PE-AV tower k times per mixture —
    all on identical inputs (the reference pays the same redundancy,
    sam_audio/ranking/judge.py:29-32). Here the mixture-side towers run once
    per ITEM and their features are repeated k* afterwards: 1 text row and
    B*(k+1) codec/tower streams instead of B*k and 2*B*k. Same math, same
    outputs (row order i-major like the reference flatten), ~44% less
    mixture-tower compute at k=8."""
    b = input_values.shape[0]
    if attention_mask is None:
        attention_mask = jnp.ones(input_ids.shape, bool)
    nth = cfg.nth_text_layer
    last, hidden = modernbert_encode(
        params["text_model"], input_ids, attention_mask, cfg.text_model,
        compute_dtype, output_hidden_states=nth is not None,
    )
    text_out = last if nth is None else hidden[nth]
    text_features = N.linear(params["text_proj1"], text_out[:, 0], compute_dtype)

    # codec + shared tower, separately per side: B mixture streams and B*k
    # candidate streams stay tile-aligned batches (a concatenated B+B*k batch
    # measured SLOWER on v5e — conv batch padding eats the dedup saving)
    if padding_mask is not None:
        item_feat_mask = padding_mask[:, :: cfg.audio_codec.hop_length]
        cand_feat_mask = jnp.repeat(item_feat_mask, k, axis=0)
    else:
        item_feat_mask = cand_feat_mask = None

    def _shared_tower(values, mask):
        feats = dacvae.encode(params["audio_codec"], values, cfg.audio_codec,
                              compute_dtype)
        x = N.linear(params["data_proj"], jnp.swapaxes(feats, 1, 2),
                     compute_dtype)
        return peav_apply(params["transformer"], x, cfg.transformer,
                          padding_mask=mask,
                          compute_dtype=compute_dtype).last_hidden_state

    input_features = jnp.repeat(_shared_tower(input_values, item_feat_mask),
                                k, axis=0)
    hyp_features = _shared_tower(separated_values, cand_feat_mask)

    return _fuse_and_score(params, cfg, jnp.repeat(text_features, k, axis=0),
                           input_features, hyp_features, cand_feat_mask,
                           compute_dtype)


class SAMAudioJudgeModel:
    """Wrapper with from_pretrained/init_random, mirroring the reference class
    (judge checkpoints live at HF revision 'sam_audio', judge.py:37)."""

    config_cls = SAMAudioJudgeConfig
    revision = "sam_audio"

    def __init__(self, cfg: SAMAudioJudgeConfig, params):
        self.cfg = cfg
        self.params = params

    @classmethod
    def init_random(cls, key, cfg: SAMAudioJudgeConfig):
        return cls(cfg, judge_init(key, cfg))

    @classmethod
    def from_pretrained(cls, model_id_or_path: str, **overrides):
        import json
        import os

        if os.path.isdir(model_id_or_path):
            snapshot = model_id_or_path
        else:
            from huggingface_hub import snapshot_download

            from sam_audio_tpu.text_tokenizer import hub_reachable

            # local HF cache directly when air-gapped (no retry backoff)
            snapshot = snapshot_download(repo_id=model_id_or_path,
                                         revision=cls.revision,
                                         local_files_only=not hub_reachable())
        with open(os.path.join(snapshot, "config.json")) as fin:
            cfg_dict = json.load(fin)
        cfg_dict.update(overrides)
        cfg = SAMAudioJudgeConfig.from_dict(cfg_dict)
        npz = os.path.join(snapshot, "params.npz")
        if os.path.exists(npz):
            from sam_audio_tpu.checkpoint import load_params

            params = load_params(npz)
        else:
            raise FileNotFoundError(
                f"No params.npz in {snapshot}; convert the torch checkpoint "
                "first (checkpoint.convert_judge_state_dict)."
            )
        return cls(cfg, params)

    def quantize(self):
        """Opt-in int8 serving mode for the scorer stack: both PE-AV towers
        + ModernBERT run W8A8 on the MXU (see ops/quant.py). Non-parity;
        returns self."""
        from sam_audio_tpu.ops.quant import quantize_judge_params

        self.params = quantize_judge_params(self.params)
        return self

    def __call__(self, **kwargs) -> SAMAudioJudgeOutput:
        return judge_forward(self.params, self.cfg, **kwargs)
