"""LoRA (low-rank adaptation) fine-tuning for SAMAudio.

The reference is inference-only (SURVEY.md section 0); full fine-tuning is
provided by `train.flow_matching.Trainer`. LoRA makes fine-tuning cheap on
one chip: every targeted weight W (out, in) is reparameterized as

    W' = W + (alpha / rank) * B @ A,   A: (rank, in),  B: (out, rank)

with only A and B trained (B zero-init, so step 0 is exactly the base
model). Optimizer state shrinks from the full 1.15B trainable params to the
adapter factors (~0.1-1%), and the merged checkpoint serves at exactly the
base model's cost.

TPU-native shape: params are pure pytrees with torch-layout (out, in)
linear weights, and the DiT's per-layer weights are STACKED on a leading
n_layers axis for the `lax.scan` layer loop (models/dit.py:233). Adapters
mirror that stacking — a: (L, rank, in), b: (L, out, rank) — and the merge
is one broadcasted `b @ a` per target, so the whole reparameterization
stays inside the jitted train step and XLA fuses it with the consumer
matmuls. No module wrappers, no graph surgery: `lora_merge` is a pure
function from (base, adapters) to the params pytree every existing
forward/step already accepts.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sam_audio_tpu.train.flow_matching import (
    Trainer, TrainState, flow_matching_loss, make_lr_schedule)

# Attention projections in every DiT block (self + cross), the classic LoRA
# target set. Keys are path regexes over "/"-joined pytree paths.
DEFAULT_TARGETS = (
    r"transformer/layers/(attention|cross_attention)/w[qkvo]/weight$",
)
# Broader preset: + SwiGLU FFN projections.
FFN_TARGETS = DEFAULT_TARGETS + (
    r"transformer/layers/feed_forward/w[123]/weight$",
)

TARGET_PRESETS = {
    "attention": DEFAULT_TARGETS,
    "attention+ffn": FFN_TARGETS,
}


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _match(patterns: Iterable[str], path: str) -> bool:
    return any(re.search(p, path) for p in patterns)


def lora_init(rng: jax.Array, params, *, rank: int,
              targets: Iterable[str] = DEFAULT_TARGETS,
              dtype=jnp.float32) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Build adapters for every leaf whose path matches `targets`.

    Returns {path: {"a": (..., rank, in), "b": (..., out, rank)}} where
    leading dims mirror the leaf's stacked-layer axes. A is N(0, 1/rank)
    (standard LoRA init), B is zeros — merged == base at step 0.
    """
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    leaves = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _path_str(path)
        if _match(targets, key):
            if leaf.ndim < 2:
                raise ValueError(
                    f"LoRA target {key} has ndim {leaf.ndim}; targets must be "
                    "(..., out, in) weight matrices")
            leaves.append((key, leaf.shape))
    if not leaves:
        raise ValueError(f"no params matched LoRA targets {tuple(targets)}")
    adapters = {}
    for (key, shape), k in zip(leaves, jax.random.split(rng, len(leaves))):
        *stack, out, inp = shape
        adapters[key] = {
            "a": jax.random.normal(k, (*stack, rank, inp), dtype) / np.sqrt(rank),
            "b": jnp.zeros((*stack, out, rank), dtype),
        }
    return adapters


def lora_scaling(rank: int, alpha: float | None) -> float:
    """alpha defaults to rank (scaling 1.0), the common convention."""
    return (alpha if alpha is not None else float(rank)) / float(rank)


def lora_merge(params, adapters: Dict[str, Dict[str, jnp.ndarray]],
               scaling: float = 1.0):
    """params with every adapted weight replaced by W + scaling * b @ a.

    Pure and differentiable in `adapters` — the train step takes gradients
    through this merge, so only the factors receive updates. Broadcasted
    matmul handles the stacked (n_layers, ...) leading axes.
    """
    hit = set()

    def fn(path, w):
        key = _path_str(path)
        ab = adapters.get(key)
        if ab is None:
            return w
        hit.add(key)
        delta = jnp.matmul(ab["b"], ab["a"])  # (..., out, in)
        return w + (scaling * delta).astype(w.dtype)

    merged = jax.tree_util.tree_map_with_path(fn, params)
    missing = set(adapters) - hit
    if missing:
        raise ValueError(f"adapters with no matching param: {sorted(missing)}")
    return merged


# ---------------------------------------------------------------------------
# Adapter checkpoint format: flat npz, "<path>::a" / "<path>::b" keys.
# ---------------------------------------------------------------------------


def save_lora(path: str, adapters, *, rank: int, alpha: float | None = None,
              targets: Iterable[str] = DEFAULT_TARGETS) -> None:
    arrays = {"__meta_rank": np.int64(rank),
              "__meta_alpha": np.float64(alpha if alpha is not None else rank),
              "__meta_targets": np.array(list(targets))}
    for key, ab in adapters.items():
        arrays[f"{key}::a"] = np.asarray(ab["a"])
        arrays[f"{key}::b"] = np.asarray(ab["b"])
    np.savez(path, **arrays)


def load_lora(path: str) -> Tuple[Dict[str, Dict[str, jnp.ndarray]], Dict[str, Any]]:
    """Returns (adapters, meta) with meta = {rank, alpha, targets, scaling}."""
    with np.load(path, allow_pickle=False) as z:
        meta = {
            "rank": int(z["__meta_rank"]),
            "alpha": float(z["__meta_alpha"]),
            "targets": [str(t) for t in z["__meta_targets"]],
        }
        adapters: Dict[str, Dict[str, jnp.ndarray]] = {}
        for name in z.files:
            if name.startswith("__meta"):
                continue
            key, _, part = name.rpartition("::")
            adapters.setdefault(key, {})[part] = jnp.asarray(z[name])
    meta["scaling"] = lora_scaling(meta["rank"], meta["alpha"])
    return adapters, meta


def merge_lora_checkpoint(params, lora_path: str):
    """Load adapters from `lora_path` and fold them into `params` for
    serving — the merged pytree runs at exactly the base model's cost."""
    adapters, meta = load_lora(lora_path)
    return lora_merge(params, adapters, meta["scaling"])


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


class LoRATrainer:
    """Flow-matching fine-tuning where only LoRA adapters train.

    Same step/fit interface as `flow_matching.Trainer`, but the optimizer
    (and EMA) state covers just the adapter factors; the base params ride
    along as a frozen, non-donated jit input. With a (dp, tp) mesh the base
    params shard by the TP rules while adapters replicate (they are ~0.1%
    of the model; the merged delta reshards once per step inside XLA).
    """

    def __init__(self, cfg, params, *, rank: int, alpha: float | None = None,
                 targets: Iterable[str] | str = "attention", rng=None,
                 mesh=None, learning_rate: float = 1e-4,
                 weight_decay: float = 0.0, grad_clip: float = 1.0,
                 lr_schedule: str = "constant", warmup_steps: int = 0,
                 total_steps: int = 0, final_lr_ratio: float = 0.0,
                 ema_decay: float = 0.0, accum_steps: int = 1, remat="full"):
        if isinstance(targets, str):
            targets = TARGET_PRESETS[targets]
        self.cfg = cfg
        self.mesh = mesh
        self.rank = rank
        self.alpha = alpha
        self.targets = tuple(targets)
        self.scaling = lora_scaling(rank, alpha)
        self.ema_decay = ema_decay
        if rng is None:
            rng = jax.random.PRNGKey(0)
        adapters = lora_init(rng, params, rank=rank, targets=self.targets)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from sam_audio_tpu.parallel.mesh import shard_batch, shard_params

            params = shard_params(params, mesh)
            replicate = NamedSharding(mesh, PartitionSpec())
            adapters = jax.device_put(adapters, replicate)
            self._shard_batch = lambda b: shard_batch(b, mesh)
        else:
            self._shard_batch = lambda b: b
        self.base_params = params

        lr = make_lr_schedule(learning_rate, lr_schedule, warmup_steps,
                              total_steps, final_lr_ratio)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(lr, weight_decay=weight_decay),
        )
        if accum_steps > 1:
            self.optimizer = optax.MultiSteps(
                self.optimizer, every_k_schedule=accum_steps)
        opt_state = jax.jit(self.optimizer.init)(adapters)
        ema = None
        if ema_decay > 0.0:
            # Must be a REAL copy: adapters are already f32, and astype with
            # an unchanged dtype is an identity no-op — the EMA tree would
            # alias the live adapters leaf-for-leaf, putting every buffer in
            # the donated TrainState twice. The TPU runtime rejects that
            # (INVALID_ARGUMENT on the first step); CPU ignores donation,
            # which is why only hardware runs caught it.
            ema = jax.tree_util.tree_map(
                lambda x: jnp.array(x, dtype=jnp.float32, copy=True),
                adapters)
        self.state = TrainState(adapters, opt_state,
                                jnp.zeros((), jnp.int32), ema)
        scaling = self.scaling
        optimizer = self.optimizer

        def train_step(state: TrainState, base, batch, rng):
            def loss_fn(adapters):
                merged = lora_merge(base, adapters, scaling)
                return flow_matching_loss(merged, cfg, batch, rng, remat=remat)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params)
            new = optax.apply_updates(state.params, updates)
            gnorm = optax.global_norm(grads)
            ema = state.ema_params
            if ema_decay > 0.0 and ema is not None:
                d = ema_decay
                ema = jax.tree_util.tree_map(
                    lambda e, p: d * e + (1.0 - d) * p.astype(e.dtype),
                    ema, new)
            return (
                TrainState(new, opt_state, state.step + 1, ema),
                {"loss": loss, "grad_norm": gnorm},
            )

        self._step = jax.jit(train_step, donate_argnums=(0,))

    @property
    def adapters(self):
        return self.state.params

    def step(self, batch, rng) -> Dict[str, float]:
        batch = self._shard_batch(batch)
        self.state, metrics = self._step(self.state, self.base_params,
                                         batch, rng)
        return metrics

    def ema_adapters(self):
        if self.state.ema_params is None:
            return self.state.params
        return jax.tree_util.tree_map(
            lambda e, p: e.astype(p.dtype), self.state.ema_params,
            self.state.params)

    def ema_inference_params(self):
        """Merged params for evaluation/serving (EMA adapters if tracked)."""
        return lora_merge(self.base_params, self.ema_adapters(), self.scaling)

    def save_adapters(self, path: str) -> None:
        save_lora(path, jax.device_get(self.ema_adapters()),
                  rank=self.rank, alpha=self.alpha, targets=self.targets)

    # fit() is identical to the full trainer's driver loop.
    fit = Trainer.fit
