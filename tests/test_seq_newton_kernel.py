"""Fused batched sequential Newton-trial kernel tests (interpreter mode).

The sequential trial (ops/pallas/seq_newton_kernel.py and its pure-JAX
fallback) must agree with the parallel LQT pipeline — same quadratic model,
same stationary point, same predicted-reduction formula (reference
seq_interior_point_newton.py:42-90 vs par_interior_point_newton.py:107-124).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ipoc_tpu
from ipoc_tpu.models import cartpole, pendulum
from ipoc_tpu.ops.derivatives import compute_derivatives, compute_lqr_params
from ipoc_tpu.ops.pallas.seq_newton_kernel import seq_newton_trial_batched
from ipoc_tpu.parallel.costates import par_costates
from ipoc_tpu.parallel.lqt import newton_lqt, par_bwd_pass, par_fwd_pass
from ipoc_tpu.solvers.ip_newton import _regularized, _seq_trial_scan
from ipoc_tpu.utils.integrators import rollout


def _stage_data(model, T, rp=1.0, bp=0.1, dtype=jnp.float32):
    ocp = model.make_ocp(1.0 / T)
    x0 = model.initial_state(dtype)
    u0 = (0.1 * jax.random.normal(jax.random.PRNGKey(1), (T, 1))).astype(dtype)
    X = rollout(ocp.dynamics, u0, x0)
    d = compute_derivatives(ocp, X, u0, dtype(bp))
    lam = par_costates(ocp, X[-1], d)
    lin = compute_lqr_params(lam, d)
    lin_reg = _regularized(lin, d, dtype(rp), True)
    XT = jax.hessian(ocp.final_cost)(X[-1])
    return ocp, d, lin_reg, XT


@pytest.mark.parametrize("model,T,nx", [
    (cartpole, 8, 4),
    pytest.param(cartpole, 40, 4, marks=pytest.mark.slow),
    pytest.param(pendulum, 60, 2, marks=pytest.mark.slow),
])
def test_seq_trial_scan_matches_par_pipeline(model, T, nx):
    """The pure-JAX sequential fallback == the parallel LQT pipeline (f64)."""
    ocp, d, lin_reg, XT = _stage_data(model, T, dtype=jnp.float64)
    lqt = newton_lqt(lin_reg, d, XT)
    K, kff, _, _, pred_ref, feas_ref = par_bwd_pass(lqt)
    du_ref, dx_ref = par_fwd_pass(lqt, jnp.zeros(nx, jnp.float64), K, kff)

    du, dx, pred, ok = _seq_trial_scan(lin_reg, d, XT)
    scale = float(jnp.abs(du_ref).max()) + 1e-9
    np.testing.assert_allclose(du, du_ref, atol=1e-9 * scale)
    np.testing.assert_allclose(dx, dx_ref, atol=1e-9 * scale)
    np.testing.assert_allclose(float(pred), float(pred_ref), rtol=1e-9)
    assert bool(ok) == bool(feas_ref)


@pytest.mark.parametrize("model,T,nx", [
    pytest.param(cartpole, 40, 4, marks=pytest.mark.slow),
    (pendulum, 10, 2),
    pytest.param(pendulum, 60, 2, marks=pytest.mark.slow),
])
def test_seq_kernel_matches_scan(model, T, nx):
    """The Pallas kernel (interpret) == the scan fallback, batched (f32)."""
    _, d, lin_reg, XT = _stage_data(model, T, dtype=jnp.float32)
    du_ref, dx_ref, pred_ref, ok_ref = _seq_trial_scan(lin_reg, d, XT)

    B = 3
    bat = lambda a: jnp.stack([a] * B)
    du, dx, pred, ok = seq_newton_trial_batched(
        bat(lin_reg.r), bat(lin_reg.Q), bat(lin_reg.R), bat(lin_reg.M),
        bat(d.fx), bat(d.fu), bat(XT), interpret=True,
    )
    scale = float(jnp.abs(du_ref).max()) + 1e-6
    for b in range(B):
        np.testing.assert_allclose(du[b], du_ref, atol=2e-5 * scale)
        np.testing.assert_allclose(dx[b], dx_ref, atol=2e-5 * scale)
        np.testing.assert_allclose(float(pred[b]), float(pred_ref), rtol=1e-4)
        assert bool(ok[b]) == bool(ok_ref)


@pytest.mark.slow
def test_seq_kernel_infeasible_flag():
    """A negative-definite regularized control weight must trip ok=False."""
    _, d, lin_reg, XT = _stage_data(cartpole, 24, dtype=jnp.float32)
    R_bad = lin_reg.R - 1e3 * jnp.broadcast_to(
        jnp.eye(1, dtype=jnp.float32), lin_reg.R.shape
    )
    bat = lambda a: a[None]
    _, _, _, ok = seq_newton_trial_batched(
        bat(lin_reg.r), bat(lin_reg.Q), bat(R_bad), bat(lin_reg.M),
        bat(d.fx), bat(d.fu), bat(XT), interpret=True,
    )
    assert not bool(ok[0])


@pytest.mark.smoke
def test_seq_costate_kernel_matches_scan():
    """The fused costate kernel (interpret) == seq_costates, batched."""
    from ipoc_tpu.ops.pallas.seq_newton_kernel import seq_costates_batched
    from ipoc_tpu.parallel.costates import seq_costates

    T = 33
    ocp = cartpole.make_ocp(1.0 / T)
    x0 = cartpole.initial_state(jnp.float32)
    u0 = (0.1 * jax.random.normal(jax.random.PRNGKey(2), (T, 1))).astype(
        jnp.float32
    )
    X = rollout(ocp.dynamics, u0, x0)
    d = compute_derivatives(ocp, X, u0, jnp.float32(0.1))
    lam_ref = seq_costates(ocp, X[-1], d)

    lam_T = jax.grad(ocp.final_cost)(X[-1])
    B = 2
    bat = lambda a: jnp.stack([a] * B)
    lam = seq_costates_batched(bat(d.cx), bat(d.fx), bat(lam_T),
                               interpret=True)
    scale = float(jnp.abs(lam_ref).max()) + 1e-6
    for b in range(B):
        np.testing.assert_allclose(lam[b], lam_ref, atol=1e-5 * scale)


@pytest.mark.parametrize("nx,nu,full", [
    (3, 2, False),  # fast tier: batched kernel only (nu>1 RHS layout pin)
    pytest.param(3, 2, True, marks=pytest.mark.slow),
    pytest.param(4, 3, True, marks=pytest.mark.slow),
])
def test_trial_kernels_multi_input(nx, nu, full):
    """nu > 1 regression: the gain-solve RHS must be interleaved row-major
    (a plain [Qu; Qxu^T] concatenation only matches the row layout for
    nu == 1 — latent until the first multi-input model)."""
    from ipoc_tpu.ops.pallas.seq_newton_kernel import (
        seq_newton_trial_batched,
        seq_newton_trial_streamed,
    )
    from ipoc_tpu.problem import Derivatives, LinearizedOCP
    from ipoc_tpu.solvers.ip_newton import _seq_trial_scan

    B, T = 2, 7
    ks = iter(jax.random.split(jax.random.PRNGKey(0), 10))

    def rnd(*s):
        return jax.random.normal(next(ks), s, jnp.float32) * 0.3

    ru = rnd(B, T, nu)
    A_ = rnd(B, T, nx, nx)
    Q = A_ @ jnp.swapaxes(A_, -1, -2) + 2 * jnp.eye(nx, dtype=jnp.float32)
    Br = rnd(B, T, nu, nu)
    R = Br @ jnp.swapaxes(Br, -1, -2) + 2 * jnp.eye(nu, dtype=jnp.float32)
    M = rnd(B, T, nx, nu) * 0.1
    fx = rnd(B, T, nx, nx)
    fu = rnd(B, T, nx, nu)
    XTa = rnd(B, nx, nx)
    XT = XTa @ jnp.swapaxes(XTa, -1, -2) + jnp.eye(nx, dtype=jnp.float32)

    refs = [
        _seq_trial_scan(
            LinearizedOCP(ru[i], Q[i], R[i], M[i]),
            Derivatives(None, None, None, None, None, fx[i], fu[i],
                        None, None, None),
            XT[i],
        )
        for i in range(B)
    ]
    du_r = jnp.stack([o[0] for o in refs])
    dx_r = jnp.stack([o[1] for o in refs])
    pred_r = jnp.stack([o[2] for o in refs])

    kernels = [seq_newton_trial_batched]
    if full:
        kernels.append(
            lambda *a, **kw: seq_newton_trial_streamed(*a, sublanes=1, **kw))
    with jax.enable_x64(False):
        for fn in kernels:
            du_k, dx_k, pred_k, ok_k = fn(ru, Q, R, M, fx, fu, XT,
                                          interpret=True)
            np.testing.assert_allclose(du_k, du_r, atol=1e-5)
            np.testing.assert_allclose(dx_k, dx_r, atol=1e-5)
            np.testing.assert_allclose(pred_k, pred_r, atol=1e-5)
            assert bool(jnp.all(ok_k))

        # the parallel-in-time fused trial shares the gain-solve layout
        from ipoc_tpu.ops.pallas.newton_kernel import fused_newton_step

        for i in range(B if full else 1):
            du_k, dx_k, pred_k, ok_k = fused_newton_step(
                ru[i], Q[i], R[i], M[i], fx[i], fu[i], XT[i],
                interpret=True)
            np.testing.assert_allclose(du_k, du_r[i], atol=1e-4)
            np.testing.assert_allclose(dx_k, dx_r[i], atol=1e-4)
            np.testing.assert_allclose(pred_k, pred_r[i], atol=1e-4)


def test_solver_newton_impl_seq_agrees():
    """Full IP solve with newton_impl='seq' matches the default 'par' path."""
    ocp = pendulum.make_ocp(1.0 / 60)
    x0 = pendulum.initial_state(jnp.float64)
    u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (60, 1))
    cfg_par = ipoc_tpu.FAST_CONFIG
    cfg_seq = cfg_par.replace(newton_impl="seq")
    u_par, it_par = jax.jit(
        lambda u, x: ipoc_tpu.par_interior_point_optimal_control(
            ocp, u, x, cfg_par
        )
    )(u0, x0)
    u_seq, it_seq = jax.jit(
        lambda u, x: ipoc_tpu.par_interior_point_optimal_control(
            ocp, u, x, cfg_seq
        )
    )(u0, x0)
    np.testing.assert_allclose(u_seq, u_par, atol=2e-3)
    assert int(it_seq) > 0


def _lane_batch(a, B, key, scale=1e-3):
    """B distinct lanes: the base stage data plus small per-lane noise."""
    noise = scale * jax.random.normal(key, (B,) + a.shape, a.dtype)
    return a[None] + noise


@pytest.mark.parametrize("model,T,nx,S", [
    pytest.param(cartpole, 9, 4, 2, marks=pytest.mark.slow),
    pytest.param(cartpole, 17, 4, 2, marks=pytest.mark.slow),
    pytest.param(pendulum, 23, 2, 2, marks=pytest.mark.slow),
])
def test_streamed_kernel_matches_batched(model, T, nx, S):
    """The sublane-packed T-streamed kernel (interpret) == the
    whole-horizon-in-VMEM kernel, lane for lane, including batch padding."""
    from ipoc_tpu.ops.pallas.seq_newton_kernel import (
        seq_newton_trial_streamed,
    )

    _, d, lin_reg, XT = _stage_data(model, T, dtype=jnp.float32)
    B = 5  # not a multiple of S*128: exercises padding
    keys = jax.random.split(jax.random.PRNGKey(7), 7)
    args = tuple(
        _lane_batch(a, B, k)
        for a, k in zip(
            (lin_reg.r, lin_reg.Q, lin_reg.R, lin_reg.M, d.fx, d.fu, XT),
            keys,
        )
    )
    du_ref, dx_ref, pred_ref, ok_ref = seq_newton_trial_batched(
        *args, interpret=True
    )
    du, dx, pred, ok = seq_newton_trial_streamed(
        *args, sublanes=S, interpret=True
    )
    # f32 ulp-level differences only (different tile shapes reassociate
    # compiler-fused multiply-adds): scale the tolerance to the data.
    scale = float(np.abs(np.asarray(du_ref)).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(du), np.asarray(du_ref),
                               atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred_ref),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))


@pytest.mark.slow
def test_streamed_costates_match_batched():
    from ipoc_tpu.ops.pallas.seq_newton_kernel import (
        seq_costates_batched,
        seq_costates_streamed,
    )

    T = 19
    ocp = cartpole.make_ocp(1.0 / T)
    x0 = cartpole.initial_state(jnp.float32)
    u0 = (0.1 * jax.random.normal(jax.random.PRNGKey(2), (T, 1))).astype(
        jnp.float32
    )
    X = rollout(ocp.dynamics, u0, x0)
    d = compute_derivatives(ocp, X, u0, jnp.float32(0.1))
    lam_T = jax.grad(ocp.final_cost)(X[-1])
    B = 3
    keys = jax.random.split(jax.random.PRNGKey(9), 3)
    cx = _lane_batch(d.cx, B, keys[0])
    fx = _lane_batch(d.fx, B, keys[1])
    lT = _lane_batch(lam_T, B, keys[2])
    lam_ref = seq_costates_batched(cx, fx, lT, interpret=True)
    lam = seq_costates_streamed(cx, fx, lT, sublanes=2, interpret=True)
    np.testing.assert_allclose(np.asarray(lam), np.asarray(lam_ref),
                               atol=1e-6)


def test_stream_sublanes_rule():
    from ipoc_tpu.ops.pallas.seq_newton_kernel import _stream_sublanes

    assert _stream_sublanes(64) == 0
    assert _stream_sublanes(128) == 0
    assert _stream_sublanes(256) == 2
    assert _stream_sublanes(700) == 4
    assert _stream_sublanes(1024) == 8
    # Deepest packing the batch fills (S=16/32 = 2/4 f32 vregs per row op;
    # measured wins on v5e, docs/PERFORMANCE.md).
    assert _stream_sublanes(2048) == 16
    assert _stream_sublanes(4096) == 32
    # IPOC_KERNEL_SUBLANES forces a specific packing for measurement.
    import os

    os.environ["IPOC_KERNEL_SUBLANES"] = "8"
    try:
        assert _stream_sublanes(4096) == 8
        assert _stream_sublanes(128) == 0
    finally:
        del os.environ["IPOC_KERNEL_SUBLANES"]
