"""Constrained pendulum swing-up model.

Single definition of the problem the reference inlines in
examples/pendulum_runtime.py:19-72: torque box |u| <= 5 as two inequalities,
quadratic tracking costs with angle wrapping, damped pendulum ODE.
"""

from __future__ import annotations

import jax.numpy as jnp

from ipoc_tpu.problem import OCP, barrier_ocp
from ipoc_tpu.utils.integrators import euler, wrap_angle

GRAVITY = 9.81
LENGTH = 1.0
MASS = 1.0
DAMPING = 1e-3

CONTROL_BOUND = 5.0  # pendulum_runtime.py:22-23
GOAL = (jnp.pi, 0.0)  # upright
STATE_WEIGHTS = (1.0, 1e-1)  # pendulum_runtime.py:32,42
ACTION_WEIGHT = 1e-3  # pendulum_runtime.py:43


def ode(state, action):
    """Damped pendulum dynamics (reference pendulum_runtime.py:59-72)."""
    position, velocity = state
    accel = (
        -GRAVITY / LENGTH * jnp.sin(position)
        + (action[0] - DAMPING * velocity) / (MASS * LENGTH**2)
    )
    return jnp.stack([velocity, accel])


def constraints(state, control):
    """Torque box as two inequalities c <= 0 (pendulum_runtime.py:19-27)."""
    return jnp.concatenate([control - CONTROL_BOUND, -control - CONTROL_BOUND])


def _error(state):
    angle, ang_vel = state
    goal = jnp.asarray(GOAL, dtype=state.dtype)
    return jnp.stack([wrap_angle(angle), ang_vel]) - goal


def stage_cost(state, action):
    """Raw quadratic stage cost (barrier added by the solver layer);
    reference pendulum_runtime.py:40-51 minus the hand-written barrier."""
    err = _error(state)
    w = jnp.asarray(STATE_WEIGHTS, dtype=state.dtype)
    return 0.5 * jnp.sum(w * err**2) + 0.5 * ACTION_WEIGHT * jnp.sum(action**2)


def final_cost(state):
    """Terminal cost, same weights as stage (pendulum_runtime.py:30-37)."""
    err = _error(state)
    w = jnp.asarray(STATE_WEIGHTS, dtype=state.dtype)
    return 0.5 * jnp.sum(w * err**2)


def make_ocp(dt: float) -> OCP:
    """Euler-discretized constrained pendulum OCP (pendulum_runtime.py:88)."""
    return barrier_ocp(euler(ode, dt), constraints, stage_cost, final_cost)


def initial_state(dtype=jnp.float32):
    """Benchmark initial state (pendulum_runtime.py:90)."""
    return jnp.array([wrap_angle(0.1), -0.1], dtype=dtype)
