"""Derivative-engine tests against finite differences and shape contracts."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ipoc_tpu.models import cartpole
from ipoc_tpu.ops.derivatives import (
    check_feasibility,
    compute_derivatives,
    compute_lqr_params,
)
from ipoc_tpu.parallel.costates import seq_costates
from ipoc_tpu.utils.integrators import rollout


def _setup(H=7, bp=0.05):
    ocp = cartpole.make_ocp(0.01)
    x0 = cartpole.initial_state(jnp.float64)
    u = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (H, 1))
    x = rollout(ocp.dynamics, u, x0)
    return ocp, x, u, bp


def test_shapes():
    ocp, x, u, bp = _setup(H=7)
    d = compute_derivatives(ocp, x, u, bp)
    T, nx, nu = 7, 4, 1
    assert d.cx.shape == (T, nx) and d.cu.shape == (T, nu)
    assert d.cxx.shape == (T, nx, nx) and d.cuu.shape == (T, nu, nu)
    assert d.cxu.shape == (T, nx, nu)
    assert d.fx.shape == (T, nx, nx) and d.fu.shape == (T, nx, nu)
    assert d.fxx.shape == (T, nx, nx, nx)
    assert d.fuu.shape == (T, nx, nu, nu)
    assert d.fxu.shape == (T, nx, nx, nu)


def test_gradients_vs_finite_differences():
    ocp, x, u, bp = _setup(H=5)
    d = compute_derivatives(ocp, x, u, bp)
    eps = 1e-6
    k = 2
    for i in range(4):
        dx = jnp.zeros(4).at[i].set(eps)
        fd = (
            ocp.stage_cost(x[k] + dx, u[k], bp)
            - ocp.stage_cost(x[k] - dx, u[k], bp)
        ) / (2 * eps)
        np.testing.assert_allclose(d.cx[k, i], fd, rtol=1e-4)
    du = jnp.array([eps])
    fd_u = (
        ocp.stage_cost(x[k], u[k] + du, bp) - ocp.stage_cost(x[k], u[k] - du, bp)
    ) / (2 * eps)
    np.testing.assert_allclose(d.cu[k, 0], fd_u, rtol=1e-4)
    # dynamics jacobian
    for i in range(4):
        dx = jnp.zeros(4).at[i].set(eps)
        fd = (ocp.dynamics(x[k] + dx, u[k]) - ocp.dynamics(x[k] - dx, u[k])) / (
            2 * eps
        )
        np.testing.assert_allclose(d.fx[k, :, i], fd, rtol=1e-4, atol=1e-8)


def test_lqr_params_match_reference_contraction():
    """ru/Q/R/M match the per-stage tensordot definition (reference
    par_interior_point_newton.py:31-42)."""
    ocp, x, u, bp = _setup(H=6)
    d = compute_derivatives(ocp, x, u, bp)
    lam = seq_costates(ocp, x[-1], d)
    lin = compute_lqr_params(lam, d)
    for k in range(6):
        l = np.asarray(lam[k + 1])
        np.testing.assert_allclose(
            lin.r[k], np.asarray(d.cu[k]) + np.asarray(d.fu[k]).T @ l, atol=1e-12
        )
        np.testing.assert_allclose(
            lin.Q[k],
            np.asarray(d.cxx[k]) + np.tensordot(l, np.asarray(d.fxx[k]), axes=1),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            lin.R[k],
            np.asarray(d.cuu[k]) + np.tensordot(l, np.asarray(d.fuu[k]), axes=1),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            lin.M[k],
            np.asarray(d.cxu[k]) + np.tensordot(l, np.asarray(d.fxu[k]), axes=1),
            atol=1e-12,
        )


def test_feasibility_check():
    ocp, x, u, _ = _setup()
    assert bool(check_feasibility(ocp, x, u))
    u_bad = u.at[3].set(60.0)  # bound is 50
    assert not bool(check_feasibility(ocp, x, u_bad))
    # boundary counts as feasible (reference semantics, par:45-47)
    u_edge = u.at[3].set(50.0)
    assert bool(check_feasibility(ocp, x, u_edge))


@pytest.mark.smoke
def test_hamiltonian_lqr_matches_tensor_path():
    """compute_hamiltonian_lqr == compute_lqr_params(compute_derivatives):
    same Newton stage data without materializing dynamics curvature."""
    import jax
    import jax.numpy as jnp

    from ipoc_tpu.models import cartpole
    from ipoc_tpu.ops.derivatives import (
        compute_derivatives,
        compute_hamiltonian_lqr,
        compute_lqr_params,
    )
    from ipoc_tpu.parallel.costates import seq_costates
    from ipoc_tpu.utils.integrators import rollout

    T = 30
    ocp = cartpole.make_ocp(1.0 / T)
    x0 = cartpole.initial_state(jnp.float64)
    u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (T, 1))
    X = rollout(ocp.dynamics, u0, x0)
    bp = jnp.float64(0.05)
    d = compute_derivatives(ocp, X, u0, bp)
    lam = seq_costates(ocp, X[-1], d)
    ref = compute_lqr_params(lam, d)
    out = compute_hamiltonian_lqr(ocp, X, u0, lam, bp)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)
