import jax.numpy as jnp
import numpy as np
import pytest

from sam_audio_tpu.ops.ode import odeint


def test_midpoint_exponential():
    # dy/dt = y, y(0)=1 -> e
    y = odeint(lambda t, y: y, jnp.asarray(1.0), method="midpoint",
               step_size=1 / 16)
    assert abs(float(y) - np.e) < 2e-3


def test_midpoint_second_order_convergence():
    def err(h):
        y = odeint(lambda t, y: y, jnp.asarray(1.0), method="midpoint",
                   step_size=h)
        return abs(float(y) - np.e)

    # halving h should reduce error ~4x
    ratio = err(1 / 8) / err(1 / 16)
    assert 3.0 < ratio < 5.0


def test_nfe_count_midpoint():
    count = [0]

    def f(t, y):
        count[0] += 1
        return y

    # tracing counts each distinct call site; run un-jitted semantics by
    # checking the traced function is called twice per step inside scan:
    # instead verify via euler (1 eval) vs midpoint (2 evals) error behavior.
    y_e = odeint(lambda t, y: y, jnp.asarray(1.0), method="euler", step_size=1 / 16)
    y_m = odeint(lambda t, y: y, jnp.asarray(1.0), method="midpoint", step_size=1 / 16)
    assert abs(float(y_m) - np.e) < abs(float(y_e) - np.e)


def test_time_dependent_field():
    # dy/dt = 2t -> y(1) = y(0) + 1
    y = odeint(lambda t, y: jnp.broadcast_to(2 * t, y.shape),
               jnp.zeros((3,)), method="midpoint", step_size=1 / 16)
    np.testing.assert_allclose(np.asarray(y), np.ones(3), rtol=1e-6)


def test_rk4_more_accurate_than_midpoint():
    y_m = odeint(lambda t, y: y, jnp.asarray(1.0), method="midpoint", step_size=1 / 8)
    y_r = odeint(lambda t, y: y, jnp.asarray(1.0), method="rk4", step_size=1 / 8)
    assert abs(float(y_r) - np.e) < abs(float(y_m) - np.e)


def test_invalid_step_size_raises():
    with pytest.raises(ValueError):
        odeint(lambda t, y: y, jnp.asarray(1.0), step_size=0.3)


def test_pytree_state():
    y0 = {"a": jnp.ones((2,)), "b": jnp.zeros((3,))}
    y = odeint(lambda t, y: {"a": y["a"], "b": jnp.ones_like(y["b"])}, y0,
               method="midpoint", step_size=1 / 4)
    np.testing.assert_allclose(np.asarray(y["b"]), np.ones(3), rtol=1e-6)
