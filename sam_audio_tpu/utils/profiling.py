"""Profiling and tracing utilities.

The reference has no profiling hooks (SURVEY.md section 5 — tqdm only); the
TPU build needs them because the north-star metric is audio-sec/sec/chip.

  * StageTimer — wall-clock per pipeline stage (encode / ode / decode /
    rerank), with device-sync on entry+exit so TPU async dispatch doesn't
    hide work. Handles relay-attached backends where block_until_ready is a
    no-op by forcing a scalar fetch.
  * trace — context manager around jax.profiler for deep dives
    (tensorboard-viewable).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def device_sync(x=None):
    """Synchronize with the device. On relay backends a scalar fetch is the
    only reliable barrier."""
    if x is not None:
        leaves = [l for l in jax.tree_util.tree_leaves(x)
                  if hasattr(l, "dtype")]
        if leaves:
            jnp.asarray(leaves[0]).ravel()[:1].block_until_ready()
            float(jnp.sum(leaves[0].ravel()[:1].astype(jnp.float32)))
            return
    # generic barrier
    float(jnp.zeros(()).block_until_ready() + 0)


class StageTimer:
    """Accumulates per-stage wall time.

    with timer.stage("ode"):
        y = run(...)
        timer.sync(y)       # force completion inside the stage
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield self
            return
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def sync(self, x):
        if self.enabled:
            device_sync(x)

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)

    def report(self) -> str:
        total = sum(self.totals.values())
        lines = []
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            pct = 100.0 * t / total if total else 0.0
            lines.append(
                f"{name:>12}: {t*1000:8.1f} ms ({pct:4.1f}%) over "
                f"{self.counts[name]} calls"
            )
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """jax.profiler trace (viewable in TensorBoard/XProf)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
