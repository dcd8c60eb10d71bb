"""Conditional flow-matching training for SAMAudio.

The reference ships inference only (SURVEY.md section 0); its generation
integrates dx/dt = v(x, t) from noise (t=0) to data (t=1) with a midpoint
solver (reference: sam_audio/model/model.py:285-290). The matching training
objective is rectified-flow / CFM:

    x_t = (1 - t) * x0 + t * x1,   x0 ~ N(0, I),  x1 = [target || residual]
    loss = || v_theta(x_t, t, cond) - (x1 - x0) ||^2     (masked mean)

This module provides the loss, an optax-based train step, and a pjit'd
multi-chip step with dp-sharded batches and tp-sharded params (see
parallel/mesh.py). Gradient checkpointing (jax.checkpoint over the DiT layer
scan) keeps HBM bounded at large batch x seq.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from sam_audio_tpu.config import SAMAudioConfig
from sam_audio_tpu.models.sam_audio import forward


def flow_matching_loss(params, cfg: SAMAudioConfig, batch: Dict[str, Any],
                       rng: jax.Array, remat="full") -> jnp.ndarray:
    """`remat`: "full" (O(1-layer) activation memory) or "dots" (save matmul
    outputs; fewer backward FLOPs, more HBM — see models/dit.dit_apply).

    batch keys:
      audio_features (B,T,2C) conditioning (stacked mixture latents),
      target_latents (B,T,2C) = [target || residual] latents,
      text_features (B,L,text_dim), text_mask (B,L),
      anchor_ids (B,A), anchor_alignment (B,T), audio_pad_mask (B,T),
      masked_video_features optional (B,vision_dim,T).
    """
    x1 = batch["target_latents"].astype(jnp.float32)
    b = x1.shape[0]
    t_rng, n_rng, d_rng = jax.random.split(rng, 3)
    t = jax.random.uniform(t_rng, (b,), jnp.float32)
    x0 = jax.random.normal(n_rng, x1.shape, jnp.float32)
    xt = (1.0 - t[:, None, None]) * x0 + t[:, None, None] * x1
    v_target = x1 - x0

    v_pred = forward(
        params, cfg,
        noisy_audio=xt,
        audio_features=batch["audio_features"],
        text_features=batch["text_features"],
        time=t,
        masked_video_features=batch.get("masked_video_features"),
        text_mask=batch["text_mask"],
        anchor_ids=batch["anchor_ids"],
        anchor_alignment=batch["anchor_alignment"],
        audio_pad_mask=batch["audio_pad_mask"],
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        remat=remat,
        dropout_rng=d_rng if cfg.transformer.dropout > 0 else None,
    ).astype(jnp.float32)

    err = jnp.square(v_pred - v_target)
    mask = batch["audio_pad_mask"][:, :, None].astype(jnp.float32)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask) * err.shape[-1], 1.0)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    ema_params: Any = None


def make_lr_schedule(learning_rate: float, schedule: str = "constant",
                     warmup_steps: int = 0, total_steps: int = 0,
                     final_lr_ratio: float = 0.0):
    """Warmup + decay LR schedule. `schedule`: constant | cosine | linear.
    With warmup_steps=0 and constant, returns the plain float (so existing
    optimizer states stay bit-identical)."""
    if schedule == "constant" and warmup_steps == 0:
        return learning_rate
    decay_steps = max(total_steps - warmup_steps, 1)
    end = learning_rate * final_lr_ratio
    if schedule == "constant":
        main = optax.constant_schedule(learning_rate)
    elif schedule == "cosine":
        main = optax.cosine_decay_schedule(learning_rate, decay_steps,
                                           alpha=final_lr_ratio)
    elif schedule == "linear":
        main = optax.linear_schedule(learning_rate, end, decay_steps)
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    if warmup_steps == 0:
        return main
    warmup = optax.linear_schedule(0.0, learning_rate, warmup_steps)
    return optax.join_schedules([warmup, main], [warmup_steps])


DEFAULT_FROZEN_PREFIXES = ("audio_codec", "text_encoder")


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def make_train_step(cfg: SAMAudioConfig, optimizer: optax.GradientTransformation,
                    trainable_filter=None, ema_decay: float = 0.0,
                    remat="full"):
    """Returns train_step(state, batch, rng) -> (state, metrics). Pure —
    compose with jit/pjit at the call site.

    trainable_filter(path_str) -> bool freezes params where it returns False.
    Default: the codec and text encoder stay frozen, matching the reference's
    tower policy (reference model.py:346-359 — they load from their own
    repos and are not trained with the DiT).

    With ema_decay > 0 the state carries an exponential moving average of the
    *trainable* leaves (frozen leaves alias the live params — no extra HBM),
    updated as ema = d*ema + (1-d)*p with debiasing left to the caller."""
    if trainable_filter is None:
        def trainable_filter(path: str) -> bool:
            return not path.startswith(DEFAULT_FROZEN_PREFIXES)

    def mask_grads(grads):
        return jax.tree_util.tree_map_with_path(
            lambda path, g: g if trainable_filter(_path_str(path))
            else jnp.zeros_like(g),
            grads,
        )

    def update_ema(ema, params):
        d = ema_decay
        return jax.tree_util.tree_map_with_path(
            lambda path, e, p: d * e + (1.0 - d) * p.astype(e.dtype)
            if trainable_filter(_path_str(path)) else p,
            ema, params,
        )

    def train_step(state: TrainState, batch, rng):
        def loss_fn(params):
            return flow_matching_loss(params, cfg, batch, rng, remat=remat)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = mask_grads(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        ema = state.ema_params
        if ema_decay > 0.0 and ema is not None:
            ema = update_ema(ema, params)
        return (
            TrainState(params, opt_state, state.step + 1, ema),
            {"loss": loss, "grad_norm": gnorm},
        )

    return train_step


class Trainer:
    """Single- or multi-chip flow-matching trainer.

    With a (dp, tp) mesh: params/optimizer state sharded by the TP rules,
    batches sharded over dp; XLA derives the collectives.
    """

    def __init__(self, cfg: SAMAudioConfig, params, mesh=None,
                 learning_rate: float = 1e-4, weight_decay: float = 0.01,
                 grad_clip: float = 1.0, trainable_filter=None,
                 lr_schedule: str = "constant", warmup_steps: int = 0,
                 total_steps: int = 0, final_lr_ratio: float = 0.0,
                 ema_decay: float = 0.0, accum_steps: int = 1,
                 remat="full"):
        self.cfg = cfg
        self.mesh = mesh
        self.ema_decay = ema_decay
        lr = make_lr_schedule(learning_rate, lr_schedule, warmup_steps,
                              total_steps, final_lr_ratio)
        if trainable_filter is None:
            def trainable_filter(path: str) -> bool:
                return not path.startswith(DEFAULT_FROZEN_PREFIXES)
        self._trainable_filter = trainable_filter

        # Weight decay must skip frozen towers: grads are masked to zero, but
        # adamw's add_decayed_weights applies to every leaf regardless, so an
        # unmasked decay would shrink "frozen" codec/T5 params by lr*wd each
        # step (and the EMA aliases frozen leaves, so eval weights would
        # drift too).
        def decay_mask(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: trainable_filter(_path_str(path)), params
            )

        self.optimizer = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(lr, weight_decay=weight_decay, mask=decay_mask),
        )
        if accum_steps > 1:
            # gradient accumulation: micro-batch grads are averaged over k
            # calls, the inner chain (clip + adamw) applies on the mean —
            # exactly one full-batch step's semantics per k micro-steps.
            # Note ema_decay stays per-MICRO-step (effective d^k per update).
            self.optimizer = optax.MultiSteps(
                self.optimizer, every_k_schedule=accum_steps)
        step_fn = make_train_step(cfg, self.optimizer, trainable_filter,
                                  ema_decay, remat=remat)

        if mesh is not None:
            from sam_audio_tpu.parallel.mesh import shard_batch, shard_params

            params = shard_params(params, mesh)
            self._shard_batch = lambda b: shard_batch(b, mesh)
        else:
            self._shard_batch = lambda b: b

        opt_state = jax.jit(self.optimizer.init)(params)
        ema = None
        if ema_decay > 0.0:
            # f32 EMA of trainable leaves; frozen leaves alias live params
            # (intentional — no extra HBM, and the step writes them back
            # unchanged). Trainable leaves must be REAL copies: with f32
            # params, astype(f32) is an identity no-op and a jitted identity
            # returns the input buffer — the EMA would alias the live
            # params, and a buffer appearing twice in the donated TrainState
            # is an INVALID_ARGUMENT on real TPU backends (CPU ignores
            # donation, so only hardware runs catch it).
            ema = jax.tree_util.tree_map_with_path(
                lambda path, x: jnp.array(x, dtype=jnp.float32, copy=True)
                if trainable_filter(_path_str(path)) else x, params)
        self.state = TrainState(params, opt_state,
                                jnp.zeros((), jnp.int32), ema)
        # Under jit, output shardings follow inputs; donate state buffers.
        self._step = jax.jit(step_fn, donate_argnums=(0,))

    def step(self, batch, rng) -> Dict[str, float]:
        batch = self._shard_batch(batch)
        self.state, metrics = self._step(self.state, batch, rng)
        return metrics

    def ema_inference_params(self):
        """Params for evaluation: EMA where tracked, live elsewhere, cast back
        to the live params' dtypes."""
        if self.state.ema_params is None:
            return self.state.params
        return jax.tree_util.tree_map(
            lambda e, p: e.astype(p.dtype), self.state.ema_params,
            self.state.params)

    def fit(self, batches, rng, *, eval_fn=None, eval_every: int = 0,
            log_every: int = 50, log_fn=print):
        """Drive training over an iterable of batches. `eval_fn(trainer,
        step)` runs every `eval_every` steps (and once at the end); its dict
        result is merged into the step metrics history returned."""
        history = []
        for i, batch in enumerate(batches):
            rng, step_rng = jax.random.split(rng)
            metrics = self.step(batch, step_rng)
            step = int(self.state.step)
            if log_every and (i % log_every == 0):
                log_fn(f"step {step}: loss={float(metrics['loss']):.4f} "
                       f"grad_norm={float(metrics['grad_norm']):.3f}")
            rec = {"step": step, "loss": float(metrics["loss"])}
            if eval_fn is not None and eval_every and step % eval_every == 0:
                rec.update(eval_fn(self, step) or {})
            history.append(rec)
        if eval_fn is not None and history and (
                not eval_every or history[-1]["step"] % eval_every != 0):
            history[-1].update(eval_fn(self, int(self.state.step)) or {})
        return history


def synthetic_batch(cfg: SAMAudioConfig, rng: jax.Array, batch_size: int = 2,
                    t_frames: int = 16, text_len: int = 8):
    """Random training batch with the right shapes (tests / dryruns)."""
    c2 = 2 * cfg.audio_codec.codebook_dim
    ks = jax.random.split(rng, 4)
    return {
        "audio_features": jax.random.normal(ks[0], (batch_size, t_frames, c2)),
        "target_latents": jax.random.normal(ks[1], (batch_size, t_frames, c2)),
        "text_features": jax.random.normal(
            ks[2], (batch_size, text_len, cfg.text_encoder.dim)
        ),
        "text_mask": jnp.ones((batch_size, text_len), bool),
        "anchor_ids": jnp.zeros((batch_size, 4), jnp.int32)
        .at[:, 1:].set(3),
        "anchor_alignment": jnp.zeros((batch_size, t_frames), jnp.int32),
        "audio_pad_mask": jnp.ones((batch_size, t_frames), bool),
    }
