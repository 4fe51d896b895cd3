"""Double-integrator model (linear sanity / MPC demo problem).

Single definition of the system the reference inlines in both
examples/linear_demo_cuda.py:19-47 and examples/linear_mpc_parallel.py:24-64.
"""

from __future__ import annotations

import jax.numpy as jnp

from ipoc_tpu.problem import OCP, unconstrained_ocp
from ipoc_tpu.utils.integrators import discretize_dynamics

STATE_WEIGHTS = (1e2, 1e0)  # linear_demo_cuda.py:35, linear_mpc_parallel.py:46
ACTION_WEIGHT = 1e-1  # linear_demo_cuda.py:36, linear_mpc_parallel.py:47


def ode(state, control):
    """xdot = [[0,1],[0,0]] x + [[0],[1]] u (linear_demo_cuda.py:19-22)."""
    A = jnp.array([[0.0, 1.0], [0.0, 0.0]], dtype=state.dtype)
    B = jnp.array([[0.0], [1.0]], dtype=state.dtype)
    return A @ state + B @ control


def stage_cost(state, control):
    w = jnp.asarray(STATE_WEIGHTS, dtype=state.dtype)
    return 0.5 * jnp.sum(w * state**2) + 0.5 * ACTION_WEIGHT * jnp.sum(
        control**2
    )


def final_cost(state):
    w = jnp.asarray(STATE_WEIGHTS, dtype=state.dtype)
    return 0.5 * jnp.sum(w * state**2)


def make_ocp(dt: float, downsampling: int = 1) -> OCP:
    """RK4-discretized unconstrained LQR problem (linear_demo_cuda.py:25-47)."""
    return unconstrained_ocp(
        discretize_dynamics(ode, dt, downsampling), stage_cost, final_cost
    )
