"""Device mesh + sharding rules.

The reference's only multi-device story is NCCL data-parallel eval
(reference: eval/main.py:53-85). The TPU-native design is richer:

  * mesh axes ("dp", "tp"): batch x candidates shard over "dp", the DiT's
    matmul dimensions shard Megatron-style over "tp" (column-parallel
    wq/wk/wv/w1/w3, row-parallel wo/w2) — XLA inserts all_gather/
    reduce_scatter over ICI from the shardings alone.
  * Inference at reference scale (1B params) fits one v5e chip, so "tp"=1 and
    "dp"=N is the serving default: k-candidate reranking and batch items
    parallelize embarrassingly across chips.
  * Training (not in the reference; we support it) uses dp x tp meshes with
    sharded optimizer state.

Param classification is by pytree path, so the same rules apply to randomly
initialized and checkpoint-converted trees.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    """Create a (dp, tp) mesh. dp defaults to n_devices // tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp < 1 or tp < 1:
        # dp = n // tp silently hits 0 when tp > n; an empty (0, tp) mesh
        # would only fail later deep inside device_put with an obscure error
        raise ValueError(
            f"make_mesh: a {dp}x{tp} (dp x tp) mesh is impossible with {n} "
            f"device(s) — tp must be <= the device count (and >= 1).")
    assert dp * tp <= n, f"mesh {dp}x{tp} needs {dp*tp} devices, have {n}"
    dev_array = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))


# Megatron-style tensor-parallel rules for the DiT / T5 / codec param tree.
# Patterns are matched against "/"-joined pytree paths. Weights are
# torch-layout (out, in) — possibly with a leading stacked-layer axis.
# "w8" is the int8 serving mode's quantized weight (ops/quant.py) — same
# (out, in) layout as "weight", so it shards identically; its per-out-channel
# "w_scale" follows the out axis on column-parallel matmuls and stays
# replicated on row-parallel ones (scales apply after the tp reduction).
_COLUMN_PARALLEL = re.compile(
    r"(attention|cross_attention|attn)/(wq|wk|wv|q|k|v)/(weight|w8)$"
    r"|feed_forward/(w1|w3)/(weight|w8)$"
    # "mlp/..." covers every ViT-family tower that uses an mlp group:
    # PE-CLIP, PE-AV, ImageBind trunks, and the span predictor's swiglu FFN.
    # shard_params falls back to replication per-leaf when a matched dim is
    # not divisible by the tp axis, so towers with odd widths stay safe.
    r"|mlp/(fc1|w1|w3)/(weight|w8)$"
    r"|ff/wi/weight$"
    r"|t_block/weight$"
)
_ROW_PARALLEL = re.compile(
    r"(attention|cross_attention|attn)/(wo|o)/(weight|w8)$"
    r"|feed_forward/w2/(weight|w8)$"
    r"|mlp/(fc2|w2)/(weight|w8)$"
    r"|ff/wo/weight$"
)
_COLUMN_BIAS = re.compile(
    r"(attention|cross_attention|attn)/(wq|wk|wv)/(bias|w_scale)$"
    r"|feed_forward/(w1|w3)/(bias|w_scale)$"
    r"|mlp/(fc1|w1|w3)/(bias|w_scale)$"
    r"|t_block/bias$"
)


def param_partition_spec(path: str, ndim: int) -> P:
    """PartitionSpec for a param at `path` with `ndim` dims. Stacked layer
    params have a leading layer axis (never sharded)."""
    if _COLUMN_PARALLEL.search(path):
        # (out, in) or (L, out, in): shard `out` on tp
        return P(*([None] * (ndim - 2) + ["tp", None]))
    if _ROW_PARALLEL.search(path):
        # shard `in` on tp
        return P(*([None] * (ndim - 2) + [None, "tp"]))
    if _COLUMN_BIAS.search(path):
        return P(*([None] * (ndim - 1) + ["tp"]))
    return P(*([None] * ndim))


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def params_pspec_tree(params):
    """Tree of PartitionSpecs matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: param_partition_spec(_path_str(path), np.ndim(x)), params
    )


def shard_params(params, mesh: Mesh):
    """Place params on the mesh per the TP rules (replicated when tp=1).

    A leaf whose matched dimension is not divisible by the tp axis size is
    replicated instead of erroring — correctness never depends on placement,
    and odd-width towers (e.g. a custom span predictor) must not break
    `model.shard()`."""
    def place(path, x):
        spec = param_partition_spec(_path_str(path), np.ndim(x))
        axes = dict(zip(spec, np.shape(x)))
        for name, dim in axes.items():
            if name is not None and dim % mesh.shape[name] != 0:
                spec = P(*([None] * np.ndim(x)))
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh):
    """Shard array leaves along the batch axis over "dp".

    Single-process: the whole (global) batch lives on this host and
    device_put splits it across the mesh. Multi-process (dp over DCN, the
    reference's torchrun scheme at eval/main.py:53-60): each process holds
    only ITS batch rows (disjoint record reads, train/records.py), so the
    local leaves are assembled into one global array whose dp axis
    concatenates the per-process batches in process order."""
    multiprocess = jax.process_count() > 1 and any(
        d.process_index != jax.process_index()
        for d in mesh.devices.flatten())

    def place(x):
        spec = P(*(["dp"] + [None] * (np.ndim(x) - 1)))
        sharding = NamedSharding(mesh, spec)
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, batch)


def process_allgather(tree):
    """Multi-host metric aggregation (the reference's all_gather_object
    equivalent, eval/main.py:24-27) over DCN."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
