"""Direct numerical cross-validation against the ACTUAL reference code.

Imports the reference solvers from ``/root/reference/noc`` (the paroc-free
ones: the sequential IP Newton solver, seq_interior_point_newton.py:180-202,
and IP-DDP, differential_dynamic_programming.py:189-208), runs them on CPU
float64 for the benchmark problems, and asserts ipoc_tpu's solvers agree.

ipoc_tpu's ``OCP`` keeps the reference's exact five-callable interface
(problem.py), so ipoc_tpu model OCPs — with the solver-synthesized log
barrier, matching the hand-written barrier of the reference examples
(pendulum_runtime.py:44-50) — are passed to the reference solvers directly.

What "agree" means, measured (this file's assertions pin these):

* sequential Newton: ipoc_tpu's iterate path is IDENTICAL to the
  reference's — controls match to ~1e-15 and the iteration counts are
  equal.  Asserted at atol 1e-9.
* DDP / parallel Newton: the iterate paths differ (Cholesky vs
  ``jnp.linalg.inv``/``eigh``, retry-loop granularity), but the CONVERGED
  SOLUTIONS coincide: total cost matches to rtol 1e-8 and each solution
  passes the reference's own stationarity criterion (max|Qu| < 1e-4,
  evaluated with the reference's ``bwd_pass``).  Control-space agreement is
  bounded by curvature slack — with action weight R = 1e-3, a gradient
  tolerance of 1e-4 allows ~1e-1 control deviation inside the flat valley;
  the reference's OWN seq-vs-ddp solutions differ by 2e-3..4.4e-3 here.
  Asserted at atol 5e-2 alongside the cost/stationarity checks, which are
  the sharp ones.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ipoc_tpu
from ipoc_tpu.models import cartpole, pendulum

REFERENCE = os.environ.get("IPOC_REFERENCE_PATH", "/root/reference")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "noc")),
    reason="reference implementation not available",
)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

HORIZON = 100
FINAL_BP = 0.1 / 5.0**4  # last solved barrier stage (par:233-248)

# Reference-parity solver config: retry-loop globalization, staged barrier
# schedule, unbounded retrying (the reference has no stall exit).
PARITY_CFG = ipoc_tpu.DEFAULT_CONFIG.replace(stall_exit=False)

MODELS = [("pendulum", pendulum), ("cartpole", cartpole)]


def _setup(model):
    ocp = model.make_ocp(1.0 / HORIZON)
    x0 = model.initial_state(jnp.float64)
    u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (HORIZON, 1))
    return ocp, x0, u0


def _reference_stationarity(ocp, x0, u):
    """max|Qu| at the final barrier stage, computed by the REFERENCE's own
    derivative engine and backward pass (ddp:28-70) with zero reg."""
    from noc.differential_dynamic_programming import bwd_pass, compute_derivatives
    from noc.utils import rollout

    x = rollout(ocp.dynamics, u, x0)
    d = compute_derivatives(ocp, x, u, FINAL_BP)
    _, _, _, _, Qu = bwd_pass(ocp.final_cost, x[-1], d, 0.0)
    return float(jnp.max(jnp.abs(Qu)))


def _final_cost(ocp, x0, u):
    from noc.utils import rollout

    x = rollout(ocp.dynamics, u, x0)
    return float(ocp.total_cost(x, u, FINAL_BP))


@pytest.mark.parametrize("name,model", MODELS)
def test_seq_matches_reference_exactly(name, model):
    """ipoc_tpu seq IP Newton reproduces the reference solver's iterate
    path bit-for-bit (up to f64 roundoff): same controls, same iteration
    count.  Reference: seq_interior_point_newton.py:180-202."""
    from noc.seq_interior_point_newton import (
        seq_interior_point_optimal_control as ref_seq,
    )

    ocp, x0, u0 = _setup(model)
    u_ref, it_ref = jax.jit(lambda u, x: ref_seq(ocp, u, x))(u0, x0)
    u_mine, it_mine = jax.jit(
        lambda u, x: ipoc_tpu.seq_interior_point_optimal_control(
            ocp, u, x, PARITY_CFG
        )
    )(u0, x0)

    np.testing.assert_allclose(np.asarray(u_mine), np.asarray(u_ref),
                               atol=1e-9)
    assert int(it_mine) == int(it_ref)


@pytest.mark.parametrize("name,model", [
    pytest.param("pendulum", pendulum, marks=pytest.mark.slow),
    ("cartpole", cartpole),
])
def test_ddp_matches_reference_solution(name, model):
    """ipoc_tpu IP-DDP converges to the same solution as the reference
    IP-DDP: equal cost (rtol 1e-8), reference-criterion stationarity,
    curvature-slack-bounded controls.  Reference: ddp:189-208."""
    from noc.differential_dynamic_programming import interior_point_ddp as ref_ddp

    ocp, x0, u0 = _setup(model)
    u_ref, _ = jax.jit(lambda u, x: ref_ddp(ocp, u, x))(u0, x0)
    u_mine, _ = jax.jit(
        lambda u, x: ipoc_tpu.interior_point_ddp(ocp, u, x, PARITY_CFG)
    )(u0, x0)

    assert _final_cost(ocp, x0, u_mine) == pytest.approx(
        _final_cost(ocp, x0, u_ref), rel=1e-8
    )
    assert _reference_stationarity(ocp, x0, u_mine) < 1e-4
    np.testing.assert_allclose(np.asarray(u_mine), np.asarray(u_ref),
                               atol=5e-2)


@pytest.mark.parametrize("terminal_hessian", ["reference", "exact"])
@pytest.mark.parametrize("name,model", [
    ("pendulum", pendulum),
    pytest.param("cartpole", cartpole, marks=pytest.mark.slow),
])
def test_par_matches_reference_solution(name, model, terminal_hessian):
    """ipoc_tpu parallel IP Newton converges to the reference sequential
    solver's solution (the reference's own validation strategy, SURVEY §4:
    its par solver needs the uninstalled paroc; seq is its ground truth).
    Both the XT=Q[0]-quirk-replicating and the corrected terminal-Hessian
    modes must land on the same optimum (par_interior_point_newton.py:74)."""
    from noc.seq_interior_point_newton import (
        seq_interior_point_optimal_control as ref_seq,
    )

    ocp, x0, u0 = _setup(model)
    u_ref, _ = jax.jit(lambda u, x: ref_seq(ocp, u, x))(u0, x0)
    cfg = PARITY_CFG.replace(terminal_hessian=terminal_hessian)
    u_mine, _ = jax.jit(
        lambda u, x: ipoc_tpu.par_interior_point_optimal_control(
            ocp, u, x, cfg
        )
    )(u0, x0)

    assert _final_cost(ocp, x0, u_mine) == pytest.approx(
        _final_cost(ocp, x0, u_ref), rel=1e-8
    )
    assert _reference_stationarity(ocp, x0, u_mine) < 1e-4
    np.testing.assert_allclose(np.asarray(u_mine), np.asarray(u_ref),
                               atol=5e-2)


@pytest.mark.parametrize("name,model", MODELS)
def test_barrier_cost_semantics_match_reference_examples(name, model):
    """ipoc_tpu's solver-synthesized log barrier (problem.py barrier_ocp)
    produces the exact cost the reference examples hand-embed
    (pendulum_runtime.py:44-57): c(x,u) - bp * sum(log(-constraints))."""
    ocp, x0, u0 = _setup(model)
    x = jnp.stack([x0, x0 * 1.01, x0 * 0.99])
    u = u0[:2]
    bp = 0.02
    got = ocp.total_cost(x, u, bp)

    def hand_stage(xk, uk):
        raw = model.stage_cost(xk, uk)
        return raw - bp * jnp.sum(jnp.log(-model.constraints(xk, uk)))

    want = (
        hand_stage(x[0], u[0]) + hand_stage(x[1], u[1])
        + model.final_cost(x[2])
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-12)
