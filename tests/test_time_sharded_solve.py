"""Full nonlinear IP solve with the horizon sharded (SURVEY §5.7 end-goal).

Runs on the 8-virtual-CPU-device mesh from conftest; pins that the
time-sharded solver reproduces the unsharded single-trial parallel solver
exactly (same controls, same iteration count) — the sharding must change
execution layout only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ipoc_tpu
from ipoc_tpu.models import cartpole, pendulum
from ipoc_tpu.parallel.sharding import make_mesh
from ipoc_tpu.solvers.time_sharded import ip_newton_time_sharded, sharded_rollout
from ipoc_tpu.utils.integrators import rollout

CFG = ipoc_tpu.DEFAULT_CONFIG.replace(globalization="single")


def _unsharded(ocp, u0, x0, cfg):
    return jax.jit(
        lambda u, x: ipoc_tpu.par_interior_point_optimal_control(
            ocp, u, x, cfg
        )
    )(u0, x0)


def test_sharded_rollout_matches_serial():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    T = 64
    ocp = pendulum.make_ocp(1.0 / T)
    x0 = pendulum.initial_state(jnp.float64)
    u = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (T, 1))
    mesh = make_mesh(time=4)
    xs, xT = jax.jit(shard_map(
        lambda uu, xx: sharded_rollout(ocp.dynamics, uu, xx),
        mesh=mesh, in_specs=(P("time", None), P()),
        out_specs=(P("time", None), P()), check_vma=False,
    ))(u, x0)
    ref = rollout(ocp.dynamics, u, x0)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref[:-1]),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(xT), np.asarray(ref[-1]),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n_time", [pytest.param(2, marks=pytest.mark.slow), 8])
@pytest.mark.smoke
def test_time_sharded_solve_matches_unsharded(n_time):
    T = 64
    ocp = pendulum.make_ocp(1.0 / T)
    x0 = pendulum.initial_state(jnp.float64)
    u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (T, 1))
    mesh = make_mesh(time=n_time)

    u_sh, it_sh = jax.jit(
        lambda u, x: ip_newton_time_sharded(ocp, u, x, mesh, CFG)
    )(u0, x0)
    u_ref, it_ref = _unsharded(ocp, u0, x0, CFG)
    assert int(it_sh) == int(it_ref)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=1e-8, atol=1e-9)


def test_time_sharded_solve_reference_terminal_quirk():
    """The XT=Q[0] quirk needs a cross-shard broadcast of the globally
    first stage; pin agreement in that mode too."""
    T = 16
    ocp = pendulum.make_ocp(1.0 / T)
    x0 = pendulum.initial_state(jnp.float64)
    u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (T, 1))
    cfg = CFG.replace(terminal_hessian="reference")
    mesh = make_mesh(time=4)
    u_sh, it_sh = jax.jit(
        lambda u, x: ip_newton_time_sharded(ocp, u, x, mesh, cfg)
    )(u0, x0)
    u_ref, it_ref = _unsharded(ocp, u0, x0, cfg)
    assert int(it_sh) == int(it_ref)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=1e-8, atol=1e-9)


@pytest.mark.slow
def test_time_sharded_long_horizon_cartpole():
    """T=1024 constrained cartpole across 8 shards — the long-horizon
    story end-to-end (VERDICT r1 #7), validated against the unsharded
    solver."""
    T = 1024
    ocp = cartpole.make_ocp(1.0 / T)
    x0 = cartpole.initial_state(jnp.float64)
    u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (T, 1))
    cfg = ipoc_tpu.FAST_CONFIG.replace(globalization="single")
    mesh = make_mesh(time=8)
    u_sh, it_sh = jax.jit(
        lambda u, x: ip_newton_time_sharded(ocp, u, x, mesh, cfg)
    )(u0, x0)
    u_ref, it_ref = _unsharded(ocp, u0, x0, cfg)
    assert int(it_sh) == int(it_ref)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=1e-7, atol=1e-8)


def test_batch_time_sharded_matches_unsharded():
    """Batch x time composition (VERDICT r2 #7): a ('batch','time') mesh
    solves N scenarios, each horizon-sharded, inside ONE shard_map; every
    scenario reproduces its unsharded solve exactly."""
    from ipoc_tpu.solvers.time_sharded import ip_newton_batch_time_sharded

    T, N = 16, 2
    ocp = pendulum.make_ocp(1.0 / T)
    x0 = pendulum.initial_state(jnp.float64)
    key = jax.random.PRNGKey(7)
    u0 = 0.1 * jax.random.normal(key, (N, T, 1))
    x0b = x0[None] + 0.02 * jax.random.normal(
        jax.random.PRNGKey(8), (N, 2))
    mesh = make_mesh(batch=2, time=4)
    u_sh, it_sh = jax.jit(
        lambda u, x: ip_newton_batch_time_sharded(ocp, u, x, mesh, CFG)
    )(u0, x0b)
    assert u_sh.shape == u0.shape
    for i in range(N):
        u_ref, it_ref = _unsharded(
            ocp, u0[i], x0b[i], CFG.replace(barrier_mode="flat")
        )
        assert int(it_sh[i]) == int(it_ref)
        np.testing.assert_allclose(np.asarray(u_sh[i]), np.asarray(u_ref),
                                   rtol=1e-8, atol=1e-9)


def test_batch_time_sharded_predictor_matches_unsharded():
    """Predictor-ON batch x time composition (VERDICT r4 #6): the
    central-path stage predictor — previously refused by the batched
    time-sharded entry — reproduces the unsharded flat predictor-on solve
    exactly (same controls, same iteration counts)."""
    from ipoc_tpu.solvers.time_sharded import ip_newton_batch_time_sharded

    cfg = CFG.replace(stage_predictor=True)
    T, N = 16, 2
    ocp = pendulum.make_ocp(1.0 / T)
    x0 = pendulum.initial_state(jnp.float64)
    key = jax.random.PRNGKey(7)
    u0 = 0.1 * jax.random.normal(key, (N, T, 1))
    x0b = x0[None] + 0.02 * jax.random.normal(
        jax.random.PRNGKey(8), (N, 2))
    mesh = make_mesh(batch=2, time=4)
    u_sh, it_sh = jax.jit(
        lambda u, x: ip_newton_batch_time_sharded(ocp, u, x, mesh, cfg)
    )(u0, x0b)
    assert u_sh.shape == u0.shape
    for i in range(N):
        u_ref, it_ref = _unsharded(
            ocp, u0[i], x0b[i], cfg.replace(barrier_mode="flat")
        )
        assert int(it_sh[i]) == int(it_ref)
        np.testing.assert_allclose(np.asarray(u_sh[i]), np.asarray(u_ref),
                                   rtol=1e-8, atol=1e-9)


def test_time_sharded_validation():
    T = 32
    ocp = pendulum.make_ocp(1.0 / T)
    x0 = pendulum.initial_state(jnp.float64)
    u0 = jnp.zeros((T, 1))
    mesh = make_mesh(time=4)
    with pytest.raises(ValueError, match="single"):
        ip_newton_time_sharded(
            ocp, u0, x0, mesh,
            ipoc_tpu.DEFAULT_CONFIG.replace(barrier_mode="flat",
                                            globalization="flat"),
        )
    with pytest.raises(ValueError, match="par"):
        ip_newton_time_sharded(
            ocp, u0, x0, mesh, CFG.replace(newton_impl="seq")
        )
    with pytest.raises(ValueError, match="divisible"):
        ip_newton_time_sharded(ocp, u0[:30], x0, mesh, CFG)


def test_time_sharded_retry_matches_unsharded():
    """globalization='retry' (reference-flagship semantics) inside the
    shard_map == the unsharded retry solver (VERDICT r3 #9: the retry
    scalars are shard-replicated, so the inner while shards as-is)."""
    T = 32
    ocp = pendulum.make_ocp(1.0 / T)
    x0 = pendulum.initial_state(jnp.float64)
    u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (T, 1))
    mesh = make_mesh(time=8)
    cfg = ipoc_tpu.DEFAULT_CONFIG  # globalization="retry", newton_impl="par"
    assert cfg.globalization == "retry"

    u_sh, it_sh = jax.jit(
        lambda u, x: ip_newton_time_sharded(ocp, u, x, mesh, cfg)
    )(u0, x0)
    u_ref, it_ref = _unsharded(ocp, u0, x0, cfg)
    assert int(it_sh) == int(it_ref)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=1e-8, atol=1e-9)
