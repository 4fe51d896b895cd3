"""LQT pass tests: seq == par by construction, and both == brute-force QP.

This is the correctness core of the framework — the in-repo replacement for
the reference's external ``paroc`` dependency (SURVEY §2.8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoc_tpu.parallel.lqt import (
    par_bwd_pass,
    par_fwd_pass,
    seq_bwd_pass,
    seq_bwd_pass_full,
    seq_fwd_pass,
)
from tests.conftest import lqt_total_cost, make_random_lqt


@pytest.mark.parametrize("cross", [False, True])
@pytest.mark.parametrize("shape", [(8, 3, 2), (8, 2, 1), (4, 4, 4)])
def test_par_equals_seq(rng, cross, shape):
    T, nx, nu = shape
    lqt = make_random_lqt(rng, T=T, nx=nx, nu=nu, cross=cross)
    Kp, dp, Sp, vp, predp, feasp = par_bwd_pass(lqt)
    Ks, ds, Ss, vs, preds, feass = seq_bwd_pass_full(lqt)
    np.testing.assert_allclose(Kp, Ks, atol=1e-10)
    np.testing.assert_allclose(dp, ds, atol=1e-10)
    np.testing.assert_allclose(Sp, Ss, atol=1e-9)
    np.testing.assert_allclose(vp, vs, atol=1e-9)
    np.testing.assert_allclose(predp, preds, rtol=1e-10)
    assert bool(feasp) and bool(feass)

    x0 = jnp.array(rng.normal(size=(nx,)))
    up, xp = par_fwd_pass(lqt, x0, Kp, dp)
    us, xs = seq_fwd_pass(lqt, x0, Ks, ds)
    np.testing.assert_allclose(up, us, atol=1e-10)
    np.testing.assert_allclose(xp, xs, atol=1e-10)


def test_optimal_vs_brute_force(rng):
    """The closed-loop solution must minimize the QP exactly."""
    T, nx, nu = 7, 3, 2
    lqt = make_random_lqt(rng, T=T, nx=nx, nu=nu)
    x0 = jnp.array(rng.normal(size=(nx,)))

    def flat_cost(uflat):
        return lqt_total_cost(lqt, uflat.reshape(T, nu), x0)

    g = jax.grad(flat_cost)(jnp.zeros(T * nu))
    Hm = jax.hessian(flat_cost)(jnp.zeros(T * nu))
    u_star = -np.linalg.solve(np.array(Hm), np.array(g))

    K, d, *_ = par_bwd_pass(lqt)
    u, x = par_fwd_pass(lqt, x0, K, d)
    np.testing.assert_allclose(np.asarray(u).ravel(), u_star, atol=1e-9)


@pytest.mark.smoke
def test_pred_reduction_exact_for_newton_case(rng):
    """With zero drift (the Newton-step LQT), pred_reduction equals the exact
    model-cost change of the full step from zero deviation."""
    lqt = make_random_lqt(rng, T=6, nx=3, nu=2, drift=False)
    nx = 3
    K, d, _, _, pred, _ = par_bwd_pass(lqt)
    u, _ = par_fwd_pass(lqt, jnp.zeros(nx), K, d)
    c_step = lqt_total_cost(lqt, np.asarray(u), jnp.zeros(nx))
    c_zero = lqt_total_cost(lqt, np.zeros_like(np.asarray(u)), jnp.zeros(nx))
    np.testing.assert_allclose(float(pred), float(c_step - c_zero), rtol=1e-9)


def test_infeasible_flag_on_indefinite_U(rng):
    lqt = make_random_lqt(rng, T=6, nx=3, nu=2)
    U_bad = lqt.U.at[2].set(-jnp.eye(2))
    lqt = lqt._replace(U=U_bad)
    *_, feasible = par_bwd_pass(lqt)
    assert not bool(feasible)


def test_seq_bwd_pass_public_interface(rng):
    """seq_bwd_pass returns the recovered 4-tuple paroc interface."""
    lqt = make_random_lqt(rng, T=5, nx=2, nu=1)
    out = seq_bwd_pass(lqt)
    assert len(out) == 4
    K, d, S, v = out
    assert K.shape == (5, 1, 2) and d.shape == (5, 1)
    assert S.shape == (6, 2, 2) and v.shape == (6, 2)


def test_jit_and_grad_through_passes(rng):
    """Passes are jit-closed and differentiable (pure JAX)."""
    lqt = make_random_lqt(rng, T=5, nx=2, nu=1)
    x0 = jnp.array([1.0, -1.0])

    @jax.jit
    def solve_u0(lqt, x0):
        K, d, *_ = par_bwd_pass(lqt)
        u, _ = par_fwd_pass(lqt, x0, K, d)
        return jnp.sum(u[0] ** 2)

    val = solve_u0(lqt, x0)
    g = jax.grad(solve_u0, argnums=1)(lqt, x0)
    assert jnp.isfinite(val)
    assert jnp.all(jnp.isfinite(g))
