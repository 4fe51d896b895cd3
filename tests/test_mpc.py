"""MPC driver tests (reference linear_mpc_parallel.py semantics):
par and seq LQT passes must produce identical closed-loop trajectories."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import ipoc_tpu
from ipoc_tpu.models import pendulum
from ipoc_tpu.mpc import lqt_mpc_loop, nmpc_loop


def _build_lqt(T=5, dt=1e-3):
    from examples.linear_mpc import build_lqt

    return build_lqt(T=T, dt=dt, dtype=jnp.float64)


def test_par_seq_mpc_identical():
    """SURVEY §4 item 1: par and seq passes on the same LQT MPC loop must
    coincide."""
    lqt = _build_lqt()
    x0 = jnp.array([2.0, 1.0])
    xs_p, us_p = jax.jit(lambda x: lqt_mpc_loop(lqt, x, 300, "par"))(x0)
    xs_s, us_s = jax.jit(lambda x: lqt_mpc_loop(lqt, x, 300, "seq"))(x0)
    np.testing.assert_allclose(xs_p, xs_s, atol=1e-10)
    np.testing.assert_allclose(us_p, us_s, atol=1e-10)


def test_mpc_regulates_to_origin():
    lqt = _build_lqt(T=10, dt=0.01)
    x0 = jnp.array([2.0, 1.0])
    xs, _ = jax.jit(lambda x: lqt_mpc_loop(lqt, x, 2000, "par"))(x0)
    assert float(jnp.linalg.norm(xs[-1])) < 1e-2


@pytest.mark.smoke
def test_nmpc_loop_runs_and_is_finite():
    ocp = pendulum.make_ocp(0.05)
    cfg = ipoc_tpu.FAST_CONFIG.replace(max_newton_iters=20)

    def solve(u, x):
        return ipoc_tpu.par_interior_point_optimal_control(ocp, u, x, cfg)[0]

    x0 = pendulum.initial_state(jnp.float64)
    xs, us = jax.jit(
        lambda x, u: nmpc_loop(solve, ocp.dynamics, x, u, 10)
    )(x0, jnp.zeros((15, 1)))
    assert xs.shape == (10, 2) and us.shape == (10, 1)
    assert bool(jnp.all(jnp.isfinite(xs)))
    assert float(jnp.abs(us).max()) <= pendulum.CONTROL_BOUND
