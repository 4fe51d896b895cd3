"""Model-layer tests: dynamics, constraints, costs match reference configs."""

import pytest
import jax.numpy as jnp
import numpy as np

from ipoc_tpu.models import cartpole, double_integrator, pendulum
from ipoc_tpu.utils.integrators import (
    discretize_dynamics,
    euler,
    rollout,
    runge_kutta,
    wrap_angle,
)


def test_wrap_angle():
    np.testing.assert_allclose(
        float(wrap_angle(jnp.array(2 * jnp.pi + 0.3))), 0.3, atol=1e-12
    )
    np.testing.assert_allclose(
        float(wrap_angle(jnp.array(-0.01))), 2 * jnp.pi - 0.01, atol=1e-12
    )


def test_rk4_exact_on_linear_system():
    """RK4 matches expm for a linear ODE to O(dt^5)."""
    import scipy.linalg

    A = np.array([[0.0, 1.0], [-2.0, -0.5]])

    def ode(x, u):
        return jnp.asarray(A) @ x

    x0 = jnp.array([1.0, -1.0])
    dt = 0.01
    x1 = runge_kutta(x0, jnp.zeros(1), ode, dt)
    x1_exact = scipy.linalg.expm(A * dt) @ np.asarray(x0)
    np.testing.assert_allclose(np.asarray(x1), x1_exact, atol=1e-10)


def test_euler_step():
    def ode(x, u):
        return -x

    dyn = euler(ode, 0.1)
    np.testing.assert_allclose(dyn(jnp.array([1.0]), jnp.zeros(1)), [0.9])


def test_discretize_downsampling():
    def ode(x, u):
        return -x

    d1 = discretize_dynamics(ode, 0.05, 2)
    d2 = discretize_dynamics(ode, 0.05, 1)
    x = jnp.array([1.0])
    np.testing.assert_allclose(d1(x, jnp.zeros(1)), d2(d2(x, jnp.zeros(1)), jnp.zeros(1)), atol=1e-12)


def test_rollout_shape_and_consistency():
    ocp = pendulum.make_ocp(0.01)
    x0 = pendulum.initial_state(jnp.float64)
    u = 0.1 * jnp.ones((10, 1))
    X = rollout(ocp.dynamics, u, x0)
    assert X.shape == (11, 2)
    np.testing.assert_allclose(X[0], x0)
    np.testing.assert_allclose(X[3], ocp.dynamics(X[2], u[2]), atol=1e-12)


def test_pendulum_ode_values():
    """Pendulum ODE matches the reference formula at a known point
    (pendulum_runtime.py:59-72)."""
    x = jnp.array([0.5, 1.2])
    u = jnp.array([0.7])
    dx = pendulum.ode(x, u)
    expected_acc = -9.81 / 1.0 * np.sin(0.5) + (0.7 - 1e-3 * 1.2) / 1.0
    np.testing.assert_allclose(dx, [1.2, expected_acc], rtol=1e-12)


def test_cartpole_ode_values():
    """Cartpole ODE matches the underactuated.mit.edu formulas
    (cartpole_runtime.py:54-81)."""
    x = jnp.array([0.1, 0.5, -0.2, 0.3])
    u = jnp.array([2.0])
    dx = cartpole.ode(x, u)
    mc, mp, l, g = 10.0, 1.0, 0.5, 9.81
    sth, cth = np.sin(0.5), np.cos(0.5)
    denom = mc + mp * sth**2
    cart_acc = (2.0 + mp * sth * (l * 0.3**2 + g * cth)) / denom
    pole_acc = (
        -2.0 * cth - mp * l * 0.3**2 * cth * sth - (mc + mp) * g * sth
    ) / (l * denom)
    np.testing.assert_allclose(dx, [-0.2, 0.3, cart_acc, pole_acc], rtol=1e-12)


@pytest.mark.smoke
def test_barrier_cost_matches_reference_formula():
    """barrier_ocp synthesizes exactly the hand-written reference cost
    (pendulum_runtime.py:40-51)."""
    ocp = pendulum.make_ocp(0.01)
    x = jnp.array([0.3, -0.4])
    u = jnp.array([1.5])
    bp = 0.02
    goal = np.array([np.pi, 0.0])
    w = np.array([1.0, 0.1])
    err = np.array([0.3, -0.4]) - goal
    raw = 0.5 * err @ np.diag(w) @ err + 0.5 * 1e-3 * 1.5**2
    barrier = -(np.log(-(1.5 - 5.0)) + np.log(-(-1.5 - 5.0)))
    np.testing.assert_allclose(
        float(ocp.stage_cost(x, u, bp)), raw + bp * barrier, rtol=1e-12
    )


def test_total_cost_sums_stages():
    ocp = cartpole.make_ocp(0.01)
    x0 = cartpole.initial_state(jnp.float64)
    u = 0.1 * jnp.ones((5, 1))
    X = rollout(ocp.dynamics, u, x0)
    bp = 0.1
    expected = sum(
        float(ocp.stage_cost(X[k], u[k], bp)) for k in range(5)
    ) + float(ocp.final_cost(X[5]))
    np.testing.assert_allclose(float(ocp.total_cost(X, u, bp)), expected, rtol=1e-12)


def test_double_integrator_unconstrained():
    ocp = double_integrator.make_ocp(0.1)
    c = ocp.constraints(jnp.zeros(2), jnp.zeros(1))
    assert bool(jnp.all(c < 0))
    # bp-independent cost
    assert float(ocp.stage_cost(jnp.ones(2), jnp.ones(1), 0.5)) == float(
        ocp.stage_cost(jnp.ones(2), jnp.ones(1), 0.0)
    )
