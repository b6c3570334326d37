"""ODE integrator accuracy and trajectory semantics (reference: cfm.py:38-122)."""

import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu.models.ode import METHODS, odeint


@pytest.mark.parametrize("method,tol", [("euler", 5e-2), ("midpoint", 2e-3), ("rk4", 1e-6)])
def test_exponential_decay(method, tol):
    # dy/dt = -y, y(0)=1 -> y(1) = e^-1
    f = lambda t, y: -y
    t = jnp.linspace(0.0, 1.0, 17)
    traj = odeint(f, jnp.ones((1,)), t, method)
    assert traj.shape == (17, 1)
    np.testing.assert_allclose(float(traj[-1, 0]), np.exp(-1.0), atol=tol)


def test_trajectory_starts_at_y0():
    f = lambda t, y: jnp.cos(t) * jnp.ones_like(y)
    y0 = jnp.full((2, 3), 5.0)
    traj = odeint(f, y0, jnp.linspace(0, 1, 4), "rk4")
    np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(y0))
    # analytic: y(1) = 5 + sin(1)
    np.testing.assert_allclose(np.asarray(traj[-1]), 5.0 + np.sin(1.0), atol=1e-5)


def test_time_dependent_field():
    # dy/dt = 2t -> y(1) = y0 + 1; catches steppers that ignore `t`
    f = lambda t, y: 2 * t * jnp.ones_like(y)
    for method in METHODS:
        traj = odeint(f, jnp.zeros((1,)), jnp.linspace(0, 1, 9), method)
        tol = 1e-4 if method != "euler" else 0.2
        np.testing.assert_allclose(float(traj[-1, 0]), 1.0, atol=tol)


def test_unknown_method():
    with pytest.raises(ValueError):
        odeint(lambda t, y: y, jnp.zeros(1), jnp.linspace(0, 1, 3), "dopri5")


def test_schedule_fn_slices_match_direct_evaluation():
    """With schedule_fn, each stage must receive the conditioning slice for
    its OWN evaluation time (euler: t; midpoint: +dt/2; rk4: k2/k3 share the
    half step). Encoding the time through the schedule must reproduce the
    plain time-dependent integration exactly."""
    f_plain = lambda t, y: 2 * t * jnp.ones_like(y)
    sched_fn = lambda times: {"t2": 2.0 * times}
    f_sched = lambda t, y, sch: sch["t2"] * jnp.ones_like(y)
    grid = jnp.linspace(0.0, 1.0, 9)
    for method in METHODS:
        a = odeint(f_plain, jnp.zeros((1,)), grid, method)
        b = odeint(f_sched, jnp.zeros((1,)), grid, method, schedule_fn=sched_fn)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
