"""Fixed-step ODE integrators as lax.scan loops.

The reference integrates the flow-matching velocity field with torchdiffeq's
fixed-grid midpoint method, step 2/32 over t in [0, 1] => 16 steps, 32 NFE
(reference: sam_audio/model/model.py:22, 285-290). Here the whole solve is one
`lax.scan` so XLA compiles a single fused step program and the Python loop
disappears.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _num_steps(t0: float, t1: float, step_size: float) -> int:
    n = (t1 - t0) / step_size
    n_int = round(n)
    if abs(n - n_int) > 1e-9:
        # torchdiffeq's fixed-grid solvers take a final partial step; we keep
        # the grid uniform and require divisibility (all reference configs are).
        raise ValueError(f"step_size {step_size} must divide interval [{t0},{t1}]")
    return int(n_int)


def odeint(
    func: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    y0: jnp.ndarray,
    t0: float = 0.0,
    t1: float = 1.0,
    method: str = "midpoint",
    step_size: float = 1.0 / 16,
) -> jnp.ndarray:
    """Integrate dy/dt = func(t, y) from t0 to t1; returns y(t1).

    func: (t scalar, y pytree) -> dy pytree.
    """
    n_steps = _num_steps(t0, t1, step_size)
    h = jnp.asarray(step_size, dtype=jnp.float32)

    if method == "euler":

        def step(y, i):
            t = t0 + i.astype(jnp.float32) * h
            return jax.tree_util.tree_map(
                lambda yy, dy: yy + h.astype(yy.dtype) * dy.astype(yy.dtype),
                y, func(t, y),
            ), None

    elif method == "midpoint":

        def step(y, i):
            t = t0 + i.astype(jnp.float32) * h
            k1 = func(t, y)
            y_mid = jax.tree_util.tree_map(
                lambda yy, dy: yy + (h / 2).astype(yy.dtype) * dy.astype(yy.dtype),
                y, k1,
            )
            k2 = func(t + h / 2, y_mid)
            return jax.tree_util.tree_map(
                lambda yy, dy: yy + h.astype(yy.dtype) * dy.astype(yy.dtype),
                y, k2,
            ), None

    elif method == "rk4":

        def step(y, i):
            t = t0 + i.astype(jnp.float32) * h
            tm = jax.tree_util.tree_map
            k1 = func(t, y)
            k2 = func(t + h / 2, tm(lambda yy, d: yy + (h / 2).astype(yy.dtype) * d.astype(yy.dtype), y, k1))
            k3 = func(t + h / 2, tm(lambda yy, d: yy + (h / 2).astype(yy.dtype) * d.astype(yy.dtype), y, k2))
            k4 = func(t + h, tm(lambda yy, d: yy + h.astype(yy.dtype) * d.astype(yy.dtype), y, k3))
            return tm(
                lambda yy, a, b, c, d: yy
                + (h / 6).astype(yy.dtype)
                * (a + 2 * b + 2 * c + d).astype(yy.dtype),
                y, k1, k2, k3, k4,
            ), None

    else:
        raise ValueError(f"Unknown ODE method: {method!r}")

    y_final, _ = jax.lax.scan(step, y0, jnp.arange(n_steps))
    return y_final
