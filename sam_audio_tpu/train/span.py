"""Span-predictor training: learn "when does the described sound occur".

The reference always loads a pretrained PEAudioFrame span predictor from its
own HF repo (reference: sam_audio/model/model.py:96-102) and ships no way to
train one. This module makes the TPU-first `models/span_predictor.
SpanPredictor` trainable end to end, so a deployment without the
(egress-gated) pe-a-frame-large weights can train its own from the SAME
sharded records the flow-matching trainer consumes.

Self-supervised labels: a latent frame is positive when the TARGET stem is
audible in it — frame RMS within (activity_db) of the stem's peak RMS, the
same peak-relative criterion as the sound-activity ranker
(ranking/sound_activity.py, reference sound_activity.py:18-30). So
(mixture, target, text) records need no extra annotation: the target stem IS
the span supervision.

Objective: per-frame weighted binary cross-entropy on the predictor's
logits, masked to real frames. Everything device-side is one jitted program
(featurization: codec-encode mixture + T5 + label extraction; step:
forward + BCE + adamw), mirroring train/flow_matching.py.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict
from functools import partial
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sam_audio_tpu.config import SAMAudioConfig
from sam_audio_tpu.models import dacvae
from sam_audio_tpu.models.span_predictor import (
    SpanPredictorConfig,
    span_predictor_forward,
    span_predictor_init,
)
from sam_audio_tpu.models.t5 import t5_encode
from sam_audio_tpu.processor import SAMAudioProcessor
from sam_audio_tpu.train.flow_matching import TrainState, Trainer, make_lr_schedule


def frame_activity_labels(wavs, hop: int, t_frames: int,
                          activity_db: float = -40.0,
                          silence_floor: float = 1e-4) -> jnp.ndarray:
    """(B, 1, Twav) or (B, Twav) waveforms -> (B, t_frames) {0,1} labels.

    A frame is active when its RMS is within `activity_db` of the item's
    peak frame RMS (peak-relative, like ranking/sound_activity.py) AND above
    an absolute floor (an all-silent stem yields all-zero labels rather
    than everything within 40 dB of numeric noise).
    """
    w = jnp.asarray(wavs, jnp.float32)
    if w.ndim == 3:
        w = w[:, 0, :]
    b, t_wav = w.shape
    pad = t_frames * hop - t_wav
    if pad < 0:
        w = w[:, : t_frames * hop]
    elif pad > 0:
        w = jnp.pad(w, ((0, 0), (0, pad)))
    frames = w.reshape(b, t_frames, hop)
    rms = jnp.sqrt(jnp.mean(jnp.square(frames), axis=-1) + 1e-12)
    peak = jnp.max(rms, axis=-1, keepdims=True)
    thresh = peak * (10.0 ** (activity_db / 20.0))
    active = (rms > thresh) & (rms > silence_floor)
    return active.astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg", "audio_dim"))
def encode_span_batch(tower_params, mixtures, targets, text_ids, text_mask,
                      audio_pad_mask, *, cfg: SAMAudioConfig, audio_dim: int):
    """Device-side featurization for span training: codec-encode the MIXTURE
    (the predictor's input is the first `audio_dim` latent channels, matching
    reference model.py:238), T5-encode the text, and derive activity labels
    from the TARGET stem."""
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    lat = dacvae.encode(tower_params["audio_codec"], mixtures, cfg.audio_codec,
                        compute_dtype=compute_dtype)
    lat = jnp.swapaxes(lat, 1, 2).astype(jnp.float32)[..., :audio_dim]
    text_features = t5_encode(tower_params["text_encoder"], text_ids,
                              text_mask, cfg.text_encoder,
                              compute_dtype=compute_dtype)
    labels = frame_activity_labels(targets, cfg.audio_codec.hop_length,
                                   lat.shape[1])
    return {
        "audio_features": lat,
        "text_features": text_features,
        "text_mask": text_mask.astype(bool),
        "audio_pad_mask": audio_pad_mask.astype(bool),
        "labels": labels,
    }


def span_bce_loss(sp_params, sp_cfg: SpanPredictorConfig,
                  batch: Dict[str, Any], pos_weight: float = 1.0,
                  return_logits: bool = False):
    """Masked per-frame BCE-with-logits; `pos_weight` scales the positive
    class (active frames are often the minority in long mixtures).
    `return_logits=True` additionally returns the forward logits so the
    train step can compute frame metrics without a second full forward."""
    logits = span_predictor_forward(
        sp_params, sp_cfg, batch["audio_features"], batch["audio_pad_mask"],
        batch["text_features"], batch["text_mask"],
    ).astype(jnp.float32)
    y = batch["labels"].astype(jnp.float32)
    # stable BCE: max(x,0) - x*y + log1p(exp(-|x|)), positives weighted
    per = jnp.maximum(logits, 0.0) - logits * y + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    w = jnp.where(y > 0.5, pos_weight, 1.0)
    mask = batch["audio_pad_mask"].astype(jnp.float32)
    loss = jnp.sum(per * w * mask) / jnp.maximum(jnp.sum(w * mask), 1.0)
    return (loss, logits) if return_logits else loss


def _frame_metrics(logits, labels, mask):
    pred = (logits > 0.0) & mask
    pos = (labels > 0.5) & mask
    tp = jnp.sum(pred & pos)
    precision = tp / jnp.maximum(jnp.sum(pred), 1)
    recall = tp / jnp.maximum(jnp.sum(pos), 1)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-9)
    return {"frame_precision": precision, "frame_recall": recall,
            "frame_f1": f1}


class SpanTrainer:
    """adamw trainer over the TPU-first span predictor (one jitted step,
    donated state). Same step/fit interface as the flow-matching Trainer."""

    def __init__(self, sp_cfg: SpanPredictorConfig, params=None, *,
                 rng=None, learning_rate: float = 3e-4,
                 weight_decay: float = 0.01, grad_clip: float = 1.0,
                 lr_schedule: str = "constant", warmup_steps: int = 0,
                 total_steps: int = 0, final_lr_ratio: float = 0.0,
                 pos_weight: float = 1.0):
        self.cfg = sp_cfg
        if params is None:
            params = span_predictor_init(
                rng if rng is not None else jax.random.PRNGKey(0), sp_cfg)
        lr = make_lr_schedule(learning_rate, lr_schedule, warmup_steps,
                              total_steps, final_lr_ratio)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(lr, weight_decay=weight_decay),
        )
        opt_state = jax.jit(self.optimizer.init)(params)
        self.state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
        optimizer = self.optimizer

        def train_step(state: TrainState, batch, rng):
            del rng  # deterministic objective; kept for interface parity

            def loss_fn(p):
                return span_bce_loss(p, sp_cfg, batch,
                                     pos_weight=pos_weight,
                                     return_logits=True)

            # Metrics reuse the loss-pass logits (pre-update params) —
            # a second full forward would cost ~1.5x per step (ADVICE r4).
            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            new = optax.apply_updates(state.params, updates)
            metrics = {"loss": loss,
                       "grad_norm": optax.global_norm(grads)}
            metrics.update(_frame_metrics(
                logits, batch["labels"], batch["audio_pad_mask"]))
            return TrainState(new, opt_state, state.step + 1), metrics

        self._step = jax.jit(train_step, donate_argnums=(0,))
        self._shard_batch = lambda b: b

    def step(self, batch, rng=None) -> Dict[str, float]:
        self.state, metrics = self._step(self.state, batch, rng)
        return metrics

    def ema_inference_params(self):
        return self.state.params

    fit = Trainer.fit


class SpanDataPipeline:
    """Host batching + device featurization for span training; consumes the
    same TrainExample records as the flow-matching pipeline (residual and
    anchors are unused — the target stem supplies the labels)."""

    def __init__(self, cfg: SAMAudioConfig, params, tokenizer,
                 sp_cfg: SpanPredictorConfig, bucket_seconds: float = 2.0,
                 text_bucket: int = 16):
        self.cfg = cfg
        self.sp_cfg = sp_cfg
        self.text_bucket = int(text_bucket)
        # Copy the frozen towers (same rationale as the flow pipeline: a
        # Trainer donates its buffers; the copy keeps this pipeline valid).
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True),
            {"audio_codec": params["audio_codec"],
             "text_encoder": params["text_encoder"]},
        )
        self.tokenizer = tokenizer
        self.processor = SAMAudioProcessor(
            audio_hop_length=cfg.audio_codec.hop_length,
            audio_sampling_rate=cfg.audio_codec.sample_rate,
            bucket_seconds=bucket_seconds,
        )

    def make_batch(self, examples: Sequence) -> Dict[str, Any]:
        def as2d(w):
            w = np.asarray(w, np.float32)
            return w if w.ndim == 2 else w[None]

        batch = self.processor(
            descriptions=[e.description for e in examples],
            audios=[as2d(e.mixture) for e in examples],
        )
        tmax = batch.audios.shape[-1]
        targets = np.zeros((len(examples), 1, tmax), np.float32)
        for i, e in enumerate(examples):
            w = as2d(e.target).mean(0)
            targets[i, 0, : min(w.shape[-1], tmax)] = w[:tmax]
        ids, mask = self.tokenizer(
            [e.description for e in examples],
            max_length=self.cfg.text_encoder.max_length,
        )
        # text-width bucketing: same compile-shape discipline as the flow
        # pipeline (see data.pad_text_to_bucket)
        from sam_audio_tpu.train.data import pad_text_to_bucket

        ids, mask = pad_text_to_bucket(ids, mask, self.text_bucket)
        return encode_span_batch(
            self.params,
            jnp.asarray(batch.audios),
            jnp.asarray(targets),
            jnp.asarray(ids),
            jnp.asarray(mask),
            jnp.asarray(batch.audio_pad_mask),
            cfg=self.cfg,
            audio_dim=self.sp_cfg.audio_dim,
        )


SPAN_ARCH_TAG = "sam_audio_tpu_span"


def save_span_predictor(snapshot_dir: str, sp_cfg: SpanPredictorConfig,
                        params) -> str:
    """Write <snapshot>/span_predictor/{config.json, params.npz} so
    `SAMAudio.from_pretrained(snapshot)` attaches the trained TPU-native
    predictor (checkpoint.py dispatches on the "arch" tag; untagged dirs
    keep loading as converted PEAudioFrame checkpoints)."""
    from sam_audio_tpu.checkpoint import save_params

    def _write_json_atomic(path: str, obj) -> None:
        # tmp + os.replace: a crash mid-write must never leave a truncated
        # config.json — especially the PARENT snapshot's, which would make
        # the user's whole serving snapshot unloadable (same crash-safe
        # pattern as records.py shard writes).
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1)
        os.replace(tmp, path)

    sp_dir = os.path.join(snapshot_dir, "span_predictor")
    os.makedirs(sp_dir, exist_ok=True)
    _write_json_atomic(os.path.join(sp_dir, "config.json"),
                       {"arch": SPAN_ARCH_TAG, **asdict(sp_cfg)})
    save_params(os.path.join(sp_dir, "params.npz"), jax.device_get(params))
    # The loader attaches span_predictor/ only when the model config names a
    # span predictor (checkpoint.py mirrors the reference's gate). If the
    # parent snapshot's config would gate it off, un-gate it here — writing
    # a trained predictor into a snapshot means the user wants it attached.
    model_cfg_path = os.path.join(snapshot_dir, "config.json")
    if os.path.exists(model_cfg_path):
        with open(model_cfg_path) as f:
            raw = json.load(f)
        if not raw.get("span_predictor"):
            raw["span_predictor"] = SPAN_ARCH_TAG
            _write_json_atomic(model_cfg_path, raw)
    return sp_dir


def synthetic_span_batch(cfg: SAMAudioConfig, sp_cfg: SpanPredictorConfig,
                         rng: jax.Array, batch_size: int = 2,
                         t_frames: int = 16, text_len: int = 8):
    """Random span-training batch with the right shapes (smoke tests). The
    labels are a fixed function of the first audio-feature channel, so the
    objective is learnable."""
    ks = jax.random.split(rng, 3)
    feats = jax.random.normal(ks[0], (batch_size, t_frames, sp_cfg.audio_dim))
    return {
        "audio_features": feats,
        "text_features": jax.random.normal(
            ks[1], (batch_size, text_len, cfg.text_encoder.dim)),
        "text_mask": jnp.ones((batch_size, text_len), bool),
        "audio_pad_mask": jnp.ones((batch_size, t_frames), bool),
        "labels": (feats[..., 0] > 0).astype(jnp.float32),
    }
