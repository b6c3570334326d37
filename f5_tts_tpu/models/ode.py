"""Fixed-step explicit ODE integrators as `lax.scan` loops.

Behavioral parity with reference: cfm.py:38-122 (Euler / midpoint / RK4,
trajectory includes y0). The reference unrolls a Python loop over an
`mx.compile`d step (cfm.py:392); here the whole integration is a single scan
inside one jit region, and the trajectory is the scan's stacked outputs.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

FlowFn = Callable[[jax.Array, jax.Array], jax.Array]  # (t, y) -> dy/dt


def _euler_step(func: FlowFn, y: jax.Array, t: jax.Array, dt: jax.Array) -> jax.Array:
    return y + dt * func(t, y)


def _midpoint_step(func: FlowFn, y: jax.Array, t: jax.Array, dt: jax.Array) -> jax.Array:
    k1 = func(t, y)
    k2 = func(t + 0.5 * dt, y + 0.5 * dt * k1)
    return y + dt * k2


def _rk4_step(func: FlowFn, y: jax.Array, t: jax.Array, dt: jax.Array) -> jax.Array:
    k1 = func(t, y)
    k2 = func(t + 0.5 * dt, y + 0.5 * dt * k1)
    k3 = func(t + 0.5 * dt, y + 0.5 * dt * k2)
    k4 = func(t + dt, y + dt * k3)
    return y + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


_STEPPERS = {"euler": _euler_step, "midpoint": _midpoint_step, "rk4": _rk4_step}

METHODS = tuple(_STEPPERS)


def odeint(
    func: FlowFn, y0: jax.Array, t: jax.Array, method: str = "rk4",
    return_trajectory: bool = True,
) -> jax.Array:
    """Integrate dy/dt = func(t, y) over the (static-length) time grid `t`.

    With return_trajectory (default), returns [len(t), *y0.shape] with y0
    first, matching the reference solvers' stacked output (cfm.py:47-61);
    otherwise returns only the final state (no per-step HBM writes — the
    serving path never reads the trajectory).
    """
    if method not in _STEPPERS:
        raise ValueError(f"Unknown method: {method}; expected one of {METHODS}")
    stepper = _STEPPERS[method]

    def step(y, tt):
        t_cur, t_next = tt
        y_next = stepper(func, y, t_cur, t_next - t_cur)
        return y_next, y_next if return_trajectory else None

    y_final, ys = jax.lax.scan(step, y0, (t[:-1], t[1:]))
    if not return_trajectory:
        return y_final[None]
    return jnp.concatenate([y0[None], ys], axis=0)
