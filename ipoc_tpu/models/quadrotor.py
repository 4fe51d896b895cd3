"""Planar quadrotor (PVTOL) hover-to-target model.

Beyond the reference's model zoo (it ships pendulum, cartpole and a double
integrator only — SURVEY §2.7): a 6-state, 2-input underactuated vehicle
with per-rotor thrust boxes, exercising nu > 1 through every solver and
kernel path (the reference's problems are all single-input).

State  x = (px, py, theta, vx, vy, omega); controls u = (f1, f2) rotor
thrusts.  Dynamics:

    px' = vx,  py' = vy,  theta' = omega
    vx' = -(f1 + f2) sin(theta) / m
    vy' =  (f1 + f2) cos(theta) / m - g
    omega' = arm * (f2 - f1) / inertia

Constraints: thrust boxes ``f_min <= f_i <= f_max`` as four inequalities
``c <= 0`` (reference convention, optimal_control_problem.py:7).
"""

from __future__ import annotations

import jax.numpy as jnp

from ipoc_tpu.problem import OCP, barrier_ocp
from ipoc_tpu.utils.integrators import euler

GRAVITY = 9.81
MASS = 1.0
ARM = 0.2
INERTIA = 0.02

F_MIN = 0.1
F_MAX = 12.0
HOVER = MASS * GRAVITY / 2.0  # per-rotor hover thrust, well inside the box

GOAL = (1.0, 1.0, 0.0, 0.0, 0.0, 0.0)
STATE_WEIGHTS = (1.0, 1.0, 0.5, 0.1, 0.1, 0.05)
ACTION_WEIGHT = 1e-2


def ode(state, action):
    _, _, theta, vx, vy, omega = state
    f1 = action[0]
    f2 = action[1]
    thrust = f1 + f2
    s, c = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([
        vx,
        vy,
        omega,
        -thrust * s / MASS,
        thrust * c / MASS - GRAVITY,
        ARM * (f2 - f1) / INERTIA,
    ])


def constraints(state, control):
    """Per-rotor thrust box as four inequalities c <= 0."""
    return jnp.concatenate([
        control - F_MAX,
        F_MIN - control,
    ])


def _error(state):
    return state - jnp.asarray(GOAL, dtype=state.dtype)


def stage_cost(state, action):
    err = _error(state)
    w = jnp.asarray(STATE_WEIGHTS, dtype=state.dtype)
    du = action - HOVER
    return 0.5 * jnp.sum(w * err**2) + 0.5 * ACTION_WEIGHT * jnp.sum(du**2)


def final_cost(state):
    err = _error(state)
    w = jnp.asarray(STATE_WEIGHTS, dtype=state.dtype)
    return 5.0 * jnp.sum(w * err**2)


def make_ocp(dt: float) -> OCP:
    """Euler-discretized thrust-boxed planar quadrotor OCP."""
    return barrier_ocp(euler(ode, dt), constraints, stage_cost, final_cost)


def initial_state(dtype=jnp.float32):
    """Hover at the origin; goal is (1, 1) with zero attitude."""
    return jnp.zeros((6,), dtype)


def hover_controls(horizon: int, dtype=jnp.float32):
    """Feasible warm start: per-rotor hover thrust."""
    return jnp.full((horizon, 2), HOVER, dtype)
