"""Unicycle (differential-drive) obstacle avoidance.

Beyond the reference's model zoo (SURVEY §2.7: pendulum, cartpole, double
integrator — all with control-box constraints only): the first model with a
NONLINEAR STATE constraint — a circular keep-out region — giving a
nonconvex feasible set that exercises the log-barrier machinery well beyond
box limits (reference convention for constraints: elementwise ``c <= 0``,
optimal_control_problem.py:7).

State  x = (px, py, theta); controls u = (v, omega):

    px' = v cos(theta),  py' = v sin(theta),  theta' = omega

Constraints (all ``<= 0``):

    v - V_MAX, -v - V_MAX, omega - W_MAX, -omega - W_MAX     control boxes
    RADIUS^2 - ||p - CENTER||^2                              keep-out disc

The benchmark scenario drives from the origin to ``GOAL`` past an obstacle
blocking the straight-line path (its center sits slightly off-axis: a
perfectly centered disc makes the straight line a symmetric saddle that
Newton cannot leave), so the converged trajectory must swerve around the
disc and, for a tight margin, ride its boundary.
"""

from __future__ import annotations

import jax.numpy as jnp

from ipoc_tpu.problem import OCP, barrier_ocp
from ipoc_tpu.utils.integrators import euler

V_MAX = 2.0
W_MAX = 4.0
CENTER = (1.0, 0.06)
RADIUS = 0.3
GOAL = (2.0, 0.0, 0.0)
STATE_WEIGHTS = (1.0, 1.0, 0.01)
ACTION_WEIGHTS = (0.05, 0.01)
FINAL_WEIGHT = 20.0


def ode(state, control):
    theta = state[2]
    v, omega = control[0], control[1]
    return jnp.stack([v * jnp.cos(theta), v * jnp.sin(theta), omega])


def constraints(state, control):
    """Control boxes + circular keep-out disc, all as c <= 0."""
    v, omega = control[0], control[1]
    d2 = (state[0] - CENTER[0]) ** 2 + (state[1] - CENTER[1]) ** 2
    return jnp.stack([
        v - V_MAX, -v - V_MAX,
        omega - W_MAX, -omega - W_MAX,
        RADIUS ** 2 - d2,
    ])


def _error(state):
    goal = jnp.asarray(GOAL, dtype=state.dtype)
    return state - goal


def stage_cost(state, control):
    err = _error(state)
    w = jnp.asarray(STATE_WEIGHTS, dtype=state.dtype)
    r = jnp.asarray(ACTION_WEIGHTS, dtype=control.dtype)
    return 0.5 * jnp.sum(w * err**2) + 0.5 * jnp.sum(r * control**2)


def final_cost(state):
    err = _error(state)
    w = jnp.asarray(STATE_WEIGHTS, dtype=state.dtype)
    return 0.5 * FINAL_WEIGHT * jnp.sum(w * err**2)


def make_ocp(dt: float) -> OCP:
    """Euler-discretized obstacle-avoidance unicycle OCP."""
    return barrier_ocp(euler(ode, dt), constraints, stage_cost, final_cost)


def initial_state(dtype=jnp.float32):
    """Origin, pointing at the goal (the obstacle blocks the straight line)."""
    return jnp.zeros((3,), dtype)
