"""Fused Newton-trial kernel tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import ipoc_tpu
from ipoc_tpu.models import cartpole, pendulum
from ipoc_tpu.ops.derivatives import compute_derivatives, compute_lqr_params
from ipoc_tpu.ops.pallas import set_pallas_scans
from ipoc_tpu.ops.pallas.newton_kernel import fused_newton_step
from ipoc_tpu.parallel.costates import par_costates
from ipoc_tpu.parallel.lqt import newton_lqt, par_bwd_pass, par_fwd_pass
from ipoc_tpu.solvers.ip_newton import _regularized
from ipoc_tpu.utils.integrators import rollout


@pytest.fixture(autouse=True)
def _restore_gate():
    yield
    set_pallas_scans("auto")


def _stage_data(model, T, nx, rp=1.0, bp=0.1):
    ocp = model.make_ocp(1.0 / T)
    x0 = model.initial_state(jnp.float32)
    u0 = (0.1 * jax.random.normal(jax.random.PRNGKey(1), (T, 1))).astype(
        jnp.float32
    )
    X = rollout(ocp.dynamics, u0, x0)
    d = compute_derivatives(ocp, X, u0, jnp.float32(bp))
    lam = par_costates(ocp, X[-1], d)
    lin = compute_lqr_params(lam, d)
    lin_reg = _regularized(lin, d, jnp.float32(rp), True)
    XT = jax.hessian(ocp.final_cost)(X[-1])
    return ocp, d, lin_reg, XT


@pytest.mark.parametrize("model,T,nx", [
    pytest.param(cartpole, 40, 4, marks=pytest.mark.slow),
    pytest.param(pendulum, 60, 2, marks=pytest.mark.slow),
    (pendulum, 16, 2),
])
def test_fused_matches_pipeline(model, T, nx):
    ocp, d, lin_reg, XT = _stage_data(model, T, nx)
    lqt = newton_lqt(lin_reg, d, XT)
    K, kff, _, _, pred_ref, feas_ref = par_bwd_pass(lqt)
    du_ref, dx_ref = par_fwd_pass(lqt, jnp.zeros(nx, jnp.float32), K, kff)

    du, dx, pred, ok = fused_newton_step(
        lin_reg.r, lin_reg.Q, lin_reg.R, lin_reg.M, d.fx, d.fu, XT,
        interpret=True,
    )
    scale = float(jnp.abs(du_ref).max()) + 1e-6
    np.testing.assert_allclose(du, du_ref, atol=2e-5 * scale)
    np.testing.assert_allclose(dx, dx_ref, atol=2e-5 * scale)
    np.testing.assert_allclose(float(pred), float(pred_ref), rtol=1e-4)
    assert bool(ok) == bool(feas_ref)


def test_fused_vmap_and_infeasible_flag_fast():
    """Fast-tier twin of test_fused_vmap_batch_rule AND
    test_fused_infeasible_flag (ADVICE r2) in ONE lowering: a 2-lane vmap
    where lane 1 carries an indefinite R — checks the custom_vmap dispatch
    (lane 0 matches the unbatched call) and the per-lane feasibility flag
    (lane 1 trips ok=False) with a tiny horizon."""
    ocp, d, lin_reg, XT = _stage_data(pendulum, 8, 2)
    B = 2
    tile = lambda a: jnp.broadcast_to(a, (B,) + a.shape) * jnp.linspace(
        0.9, 1.1, B
    ).astype(jnp.float32).reshape((B,) + (1,) * a.ndim)
    ru, Q, R, M = map(tile, (lin_reg.r, lin_reg.Q, lin_reg.R, lin_reg.M))
    fx, fu, XTb = map(tile, (d.fx, d.fu, XT))
    R = R.at[1, 3].set(-jnp.eye(1, dtype=jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        du_b, dx_b, pred_b, ok_b = jax.vmap(
            lambda *a: fused_newton_step(*a)
        )(ru, Q, R, M, fx, fu, XTb)
        du_0, _, pred_0, _ = fused_newton_step(
            ru[0], Q[0], R[0], M[0], fx[0], fu[0], XTb[0]
        )
    np.testing.assert_allclose(du_b[0], du_0, atol=1e-5)
    np.testing.assert_allclose(float(pred_b[0]), float(pred_0), rtol=1e-5)
    assert bool(ok_b[0])
    assert not bool(ok_b[1])


@pytest.mark.slow
def test_fused_infeasible_flag():
    """Indefinite R (negative regularized control weight) must trip the
    feasibility flag, matching par_bwd_pass semantics."""
    ocp, d, lin_reg, XT = _stage_data(cartpole, 30, 4)
    R_bad = lin_reg.R.at[5].set(-jnp.eye(1, dtype=jnp.float32))
    lin_bad = lin_reg._replace(R=R_bad)

    lqt = newton_lqt(lin_bad, d, XT)
    *_, feas_ref = par_bwd_pass(lqt)
    _, _, _, ok = fused_newton_step(
        lin_bad.r, lin_bad.Q, lin_bad.R, lin_bad.M, d.fx, d.fu, XT,
        interpret=True,
    )
    assert not bool(ok)
    assert not bool(feas_ref)


@pytest.mark.slow
def test_fused_vmap_batch_rule():
    """vmapped fused step == per-lane results (custom_vmap dispatch)."""
    ocp, d, lin_reg, XT = _stage_data(cartpole, 30, 4)
    B = 3
    tile = lambda a: jnp.broadcast_to(a, (B,) + a.shape) * jnp.linspace(
        0.9, 1.1, B
    ).astype(jnp.float32).reshape((B,) + (1,) * a.ndim)

    ru, Q, R, M = map(tile, (lin_reg.r, lin_reg.Q, lin_reg.R, lin_reg.M))
    fx, fu, XTb = map(tile, (d.fx, d.fu, XT))

    with pltpu.force_tpu_interpret_mode():
        du_b, dx_b, pred_b, ok_b = jax.vmap(
            lambda *a: fused_newton_step(*a)
        )(ru, Q, R, M, fx, fu, XTb)
        for i in range(B):
            du_i, dx_i, pred_i, ok_i = fused_newton_step(
                ru[i], Q[i], R[i], M[i], fx[i], fu[i], XTb[i]
            )
            np.testing.assert_allclose(du_b[i], du_i, atol=1e-5)
            np.testing.assert_allclose(float(pred_b[i]), float(pred_i),
                                       rtol=1e-5)


@pytest.mark.slow
def test_solver_end_to_end_with_fused_kernel():
    """Full pendulum solve with all kernels forced on (interpreter) matches
    the pure-XLA solve."""
    ocp = pendulum.make_ocp(0.05)
    x0 = pendulum.initial_state(jnp.float32)
    u0 = (0.1 * jax.random.normal(jax.random.PRNGKey(1), (20, 1))).astype(
        jnp.float32
    )
    cfg = ipoc_tpu.FAST_CONFIG.replace(max_newton_iters=40)
    u_ref, it_ref = ipoc_tpu.par_interior_point_optimal_control(
        ocp, u0, x0, cfg
    )

    set_pallas_scans("on")
    with pltpu.force_tpu_interpret_mode():
        u_k, it_k = ipoc_tpu.par_interior_point_optimal_control(
            ocp, u0, x0, cfg
        )
    assert bool(jnp.all(jnp.isfinite(u_k)))
    # Different f32 rounding in the kernel changes the LM acceptance path, so
    # the two solves may stop at slightly different points along flat
    # directions; assert closeness plus true stationarity of the kernel path.
    np.testing.assert_allclose(u_k, u_ref, atol=1e-1)
    set_pallas_scans("auto")  # stationarity check on the plain XLA path
    x_k = rollout(ocp.dynamics, u_k, x0)
    d_k = compute_derivatives(ocp, x_k, u_k, jnp.float32(0.1 / 5**4))
    lam_k = par_costates(ocp, x_k[-1], d_k)
    lin_k = compute_lqr_params(lam_k, d_k)
    assert float(jnp.abs(lin_k.r).max()) < cfg.tol * 5
