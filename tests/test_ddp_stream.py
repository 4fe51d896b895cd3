"""DDP as a throughput path (cfg.newton_impl="ddp").

The reference ships IP-DDP as a peer of the Newton solvers
(differential_dynamic_programming.py:98-186); here the DDP trial
(derivatives + Vx-contracted backward pass + nonlinear re-rollout,
ddp:28-90) plugs into the same single-trial/flat/stream executors as the
Newton step, so batched DDP throughput gets the identical lane machinery
(ip_newton._trial_eval's ddp branch / fused_iter_kernel DDP mode).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ipoc_tpu
from ipoc_tpu.models import cartpole, pendulum
from ipoc_tpu.solvers.batched import make_batch
from ipoc_tpu.solvers.stream import solve_stream
from ipoc_tpu.utils.integrators import rollout

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

DDP_CFG = ipoc_tpu.FAST_CONFIG.replace(
    globalization="single", newton_impl="ddp"
)


def _raw_cost(ocp, u, x0):
    x = rollout(ocp.dynamics, u, x0)
    return ocp.total_cost(x, u, 1e-9)


@pytest.mark.smoke
def test_ddp_flat_matches_staged_ddp_solution():
    """Flat-mode DDP (one while loop, per-lane bp) reaches the same optimum
    as the staged reference-structure interior_point_ddp."""
    T = 60
    ocp = pendulum.make_ocp(1.0 / T)
    x0 = pendulum.initial_state(jnp.float64)
    u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (T, 1))

    cfg_flat = DDP_CFG.replace(barrier_mode="flat")
    u_flat, it_flat = jax.jit(
        lambda u, x: ipoc_tpu.par_interior_point_optimal_control(
            ocp, u, x, cfg_flat
        )
    )(u0, x0)
    u_ref, _ = jax.jit(
        lambda u, x: ipoc_tpu.interior_point_ddp(
            ocp, u, x, ipoc_tpu.DEFAULT_CONFIG
        )
    )(u0, x0)
    assert int(it_flat) > 0
    c_flat = float(_raw_cost(ocp, u_flat, x0))
    c_ref = float(_raw_cost(ocp, u_ref, x0))
    assert c_flat == pytest.approx(c_ref, rel=1e-6)


def test_ddp_stream_matches_reference_golden():
    """Streamed DDP on the benchmark scenario lands on the
    reference-implementation-generated DDP solution (cost rtol 1e-6)."""
    data = np.load(os.path.join(GOLDEN_DIR, "cartpole_h100.npz"))
    H = 100
    ocp = cartpole.make_ocp(1.0 / H)
    x0 = cartpole.initial_state(jnp.float64)
    u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (H, 1))

    sol = jax.jit(
        lambda u, x: solve_stream(ocp, u[None], x[None], DDP_CFG, lanes=1)
    )(u0, x0)
    u = jnp.asarray(np.asarray(sol.controls)[0])
    bp = float(data["final_bp"])
    x = rollout(ocp.dynamics, u, x0)
    assert float(ocp.total_cost(x, u, bp)) == pytest.approx(
        float(data["cost_ddp"]), rel=1e-6
    )
    c = jax.vmap(ocp.constraints)(x[:-1], u)
    assert bool(jnp.all(c <= 0))


def test_ddp_stream_batch():
    """A small streamed DDP batch: every scenario feasible, finite, and at
    the single-solve optimum (scheduling-independent results)."""
    T = 50
    ocp = pendulum.make_ocp(1.0 / T)
    x0 = pendulum.initial_state(jnp.float64)
    u0, x0b = make_batch(
        jax.random.PRNGKey(3), x0, 6, T, 1,
        state_scale=0.05, control_scale=0.1, dtype=jnp.float64,
    )
    sol = jax.jit(
        lambda u, x: solve_stream(ocp, u, x, DDP_CFG, lanes=3)
    )(u0, x0b)
    u = np.asarray(sol.controls)
    assert np.isfinite(u).all()
    single = jax.jit(
        lambda u, x: ipoc_tpu.par_interior_point_optimal_control(
            ocp, u, x, DDP_CFG.replace(barrier_mode="flat")
        )
    )
    for i in range(6):
        u_i, _ = single(u0[i], x0b[i])
        np.testing.assert_allclose(u[i], np.asarray(u_i), atol=1e-10)


def test_ddp_impl_requires_single_globalization():
    T = 20
    ocp = pendulum.make_ocp(1.0 / T)
    x0 = pendulum.initial_state(jnp.float64)
    u0 = jnp.zeros((T, 1))
    bad = ipoc_tpu.DEFAULT_CONFIG.replace(newton_impl="ddp")
    with pytest.raises(ValueError, match="single"):
        jax.jit(
            lambda u, x: ipoc_tpu.par_interior_point_optimal_control(
                ocp, u, x, bad
            )
        )(u0, x0)
