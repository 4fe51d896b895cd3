"""Constrained cartpole swing-up model.

Single definition of the problem the reference inlines in
examples/cartpole_runtime.py:18-81: force box |u| <= 50, quadratic costs with
pole-angle wrapping, underactuated.mit.edu cartpole ODE.
"""

from __future__ import annotations

import jax.numpy as jnp

from ipoc_tpu.problem import OCP, barrier_ocp
from ipoc_tpu.utils.integrators import euler, wrap_angle

GRAVITY = 9.81
POLE_LENGTH = 0.5
CART_MASS = 10.0
POLE_MASS = 1.0

CONTROL_BOUND = 50.0  # cartpole_runtime.py:19-20
GOAL = (0.0, jnp.pi, 0.0, 0.0)  # pole upright
STATE_WEIGHTS = (1.0, 10.0, 1e-1, 1e-1)  # cartpole_runtime.py:29,38
ACTION_WEIGHT = 1e-3  # cartpole_runtime.py:39


def ode(state, action):
    """Cartpole dynamics (reference cartpole_runtime.py:54-81)."""
    _, pole_pos, cart_vel, pole_vel = state
    total_mass = CART_MASS + POLE_MASS
    u = action[0]

    sth = jnp.sin(pole_pos)
    cth = jnp.cos(pole_pos)
    denom = CART_MASS + POLE_MASS * sth**2

    cart_acc = (
        u + POLE_MASS * sth * (POLE_LENGTH * pole_vel**2 + GRAVITY * cth)
    ) / denom
    pole_acc = (
        -u * cth
        - POLE_MASS * POLE_LENGTH * pole_vel**2 * cth * sth
        - total_mass * GRAVITY * sth
    ) / (POLE_LENGTH * denom)

    return jnp.stack([cart_vel, pole_vel, cart_acc, pole_acc])


def constraints(state, control):
    """Force box as two inequalities c <= 0 (cartpole_runtime.py:18-24)."""
    return jnp.stack([control[0] - CONTROL_BOUND, -control[0] - CONTROL_BOUND])


def make_constraints(cart_limit: float | None = None):
    """Input box plus optional cart-position state box |x_cart| <= limit.

    The state-constrained variant covers BASELINE.json config 3
    ("parallel IP with input+state constraints"); the reference only demos
    control boxes, but its interface (and ours) supports general
    ``c(x, u) <= 0``.
    """
    if cart_limit is None:
        return constraints

    def cons(state, control):
        return jnp.concatenate(
            [
                constraints(state, control),
                jnp.stack(
                    [state[0] - cart_limit, -state[0] - cart_limit]
                ),
            ]
        )

    return cons


def _error(state):
    goal = jnp.asarray(GOAL, dtype=state.dtype)
    wrapped = jnp.stack([state[0], wrap_angle(state[1]), state[2], state[3]])
    return wrapped - goal


def stage_cost(state, action):
    """Raw quadratic stage cost (barrier added by the solver layer);
    reference cartpole_runtime.py:36-45 minus the hand-written barrier."""
    err = _error(state)
    w = jnp.asarray(STATE_WEIGHTS, dtype=state.dtype)
    return 0.5 * jnp.sum(w * err**2) + 0.5 * ACTION_WEIGHT * jnp.sum(action**2)


def final_cost(state):
    """Terminal cost, same weights as stage (cartpole_runtime.py:27-33)."""
    err = _error(state)
    w = jnp.asarray(STATE_WEIGHTS, dtype=state.dtype)
    return 0.5 * jnp.sum(w * err**2)


def make_ocp(dt: float, cart_limit: float | None = None) -> OCP:
    """Euler-discretized constrained cartpole OCP (cartpole_runtime.py:99).

    ``cart_limit`` adds the state box |x_cart| <= limit (input+state
    constrained variant)."""
    return barrier_ocp(
        euler(ode, dt), make_constraints(cart_limit), stage_cost, final_cost
    )


def initial_state(dtype=jnp.float32):
    """Benchmark initial state (cartpole_runtime.py:101)."""
    return jnp.array([0.01, wrap_angle(-0.01), 0.01, -0.01], dtype=dtype)
