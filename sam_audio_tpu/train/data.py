"""Training data pipeline: (mixture, target, residual, text) examples ->
flow-matching batches.

The reference ships no training code (SURVEY.md section 0); this pipeline
completes the trainer: host-side batching/tokenization (reusing the inference
processor's padding/anchor semantics) + on-device codec encoding of mixture
and ground-truth stems into the latent tensors flow_matching_loss consumes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import SAMAudioConfig
from sam_audio_tpu.models import dacvae
from sam_audio_tpu.models.t5 import t5_encode
from sam_audio_tpu.processor import Anchor, SAMAudioProcessor


@dataclass
class TrainExample:
    mixture: np.ndarray          # (1, T) or (T,) waveform @ model sample rate
    target: np.ndarray           # ground-truth isolated source
    residual: np.ndarray         # mixture minus target
    description: str
    anchors: Optional[List[Anchor]] = None


@partial(jax.jit, static_argnames=("cfg",))
def encode_training_batch(params, mixtures, targets, residuals, text_ids,
                          text_mask, anchor_ids, anchor_alignment,
                          audio_pad_mask, *, cfg: SAMAudioConfig):
    """Device-side featurization: codec-encode the three stems in ONE batched
    pass and build the conditioning/target latents."""
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    b = mixtures.shape[0]
    stacked = jnp.concatenate([mixtures, targets, residuals], axis=0)
    lat = dacvae.encode(params["audio_codec"], stacked, cfg.audio_codec,
                        compute_dtype=compute_dtype)
    lat = jnp.swapaxes(lat, 1, 2).astype(jnp.float32)  # (3B, T, C)
    mix_lat, tgt_lat, res_lat = lat[:b], lat[b:2 * b], lat[2 * b:]
    text_features = t5_encode(params["text_encoder"], text_ids, text_mask,
                              cfg.text_encoder, compute_dtype=compute_dtype)
    return {
        "audio_features": jnp.concatenate([mix_lat, mix_lat], axis=2),
        "target_latents": jnp.concatenate([tgt_lat, res_lat], axis=2),
        "text_features": text_features,
        "text_mask": text_mask.astype(bool),
        "anchor_ids": anchor_ids,
        "anchor_alignment": anchor_alignment,
        "audio_pad_mask": audio_pad_mask.astype(bool),
    }


def pad_text_to_bucket(ids, mask, multiple: int = 16):
    """Round the tokenized text width up to a multiple of `multiple`.

    The tokenizer pads to the batch's longest description, so real-data
    batches vary in L — and every distinct (L, anchor_width) pair retraces
    the featurization jit AND the donated train step (200-300 s/compile on
    a relay-backed chip). Bucketing L bounds the program count at
    max_length/multiple. Padded positions carry mask=False, which the T5
    attention and the cross-attention both honor, so results are unchanged.
    """
    ids = np.asarray(ids)
    mask = np.asarray(mask)
    n = ids.shape[1]
    target = -(-max(n, 1) // multiple) * multiple
    if target == n:
        return ids, mask
    pad = ((0, 0), (0, target - n))
    return np.pad(ids, pad), np.pad(mask, pad)


class FlowMatchingDataPipeline:
    """Host batching + device featurization for flow-matching training.

    Compile-shape discipline: time is bucketed (`bucket_seconds`), text is
    bucketed to multiples of `text_bucket`, and anchor slots are pinned to
    at least `pad_anchors_to` — so steady-state training replays a bounded
    set of compiled programs instead of retracing per batch."""

    def __init__(self, cfg: SAMAudioConfig, params, tokenizer,
                 bucket_seconds: float = 2.0, text_bucket: int = 16,
                 pad_anchors_to: int = 8):
        self.cfg = cfg
        # Featurization needs only the frozen towers. Copy them: the Trainer
        # donates its state buffers each step (jit donate_argnums), which
        # would invalidate a shared params tree after the first step.
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True),
            {"audio_codec": params["audio_codec"],
             "text_encoder": params["text_encoder"]},
        )
        self.tokenizer = tokenizer
        self.text_bucket = int(text_bucket)
        self.pad_anchors_to = int(pad_anchors_to)
        self.processor = SAMAudioProcessor(
            audio_hop_length=cfg.audio_codec.hop_length,
            audio_sampling_rate=cfg.audio_codec.sample_rate,
            bucket_seconds=bucket_seconds,
        )

    def make_batch(self, examples: Sequence[TrainExample]) -> Dict[str, Any]:
        def as2d(w):
            w = np.asarray(w, np.float32)
            return w if w.ndim == 2 else w[None]

        # anchors are all-or-nothing per batch; examples without spans get an
        # empty list (=> only the <null>/<pad> slots, like no-anchor items)
        anchors = None
        if any(e.anchors for e in examples):
            anchors = [e.anchors or [] for e in examples]
        batch = self.processor(
            descriptions=[e.description for e in examples],
            audios=[as2d(e.mixture) for e in examples],
            anchors=anchors,
            pad_anchors_to=self.pad_anchors_to,
        )
        tmax = batch.audios.shape[-1]

        def pad_stack(wavs):
            out = np.zeros((len(wavs), 1, tmax), np.float32)
            for i, w in enumerate(wavs):
                w = as2d(w).mean(0)
                out[i, 0, : min(w.shape[-1], tmax)] = w[:tmax]
            return out

        targets = pad_stack([e.target for e in examples])
        residuals = pad_stack([e.residual for e in examples])
        ids, mask = self.tokenizer(
            [e.description for e in examples],
            max_length=self.cfg.text_encoder.max_length,
        )
        ids, mask = pad_text_to_bucket(ids, mask, self.text_bucket)
        return encode_training_batch(
            self.params,
            jnp.asarray(batch.audios),
            jnp.asarray(targets),
            jnp.asarray(residuals),
            jnp.asarray(ids),
            jnp.asarray(mask),
            jnp.asarray(batch.anchor_ids),
            jnp.asarray(batch.anchor_alignment),
            jnp.asarray(batch.audio_pad_mask),
            cfg=self.cfg,
        )
