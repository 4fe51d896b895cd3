"""Golden-trajectory regression tests against REFERENCE-GENERATED oracles.

``tests/golden/*.npz`` are produced by the actual reference implementation
(noc seq IP Newton + IP-DDP, CPU float64 — see
tests/golden/generate_from_reference.py), so these tests pin ipoc_tpu to the
reference's solutions, not to its own past output.  They run without
``/root/reference`` present (unlike tests/test_reference_parity.py, which
cross-validates live).

Tolerances (measured; rationale in test_reference_parity.py's docstring):

* seq: atol 1e-6 — the iterate path is identical to the reference's
  (measured agreement ~1e-15); the slack absorbs cross-version JAX
  summation-order drift without hiding real semantic changes.
* par / ddp / stream: converged COST pinned at rtol 1e-8 plus controls at
  the curvature-slack bound (atol 5e-2).  Different-but-equally-optimal
  points in the flat valley pass; a wrong optimum fails on cost.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ipoc_tpu
from ipoc_tpu.models import cartpole, pendulum
from ipoc_tpu.utils.integrators import rollout

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
HORIZON = 100
PARITY_CFG = ipoc_tpu.DEFAULT_CONFIG.replace(stall_exit=False)

MODELS = [("pendulum", pendulum), ("cartpole", cartpole)]


def _setup(name, model):
    data = np.load(os.path.join(GOLDEN_DIR, f"{name}_h100.npz"))
    ocp = model.make_ocp(1.0 / HORIZON)
    x0 = model.initial_state(jnp.float64)
    u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (HORIZON, 1))
    return data, ocp, x0, u0


def _barrier_cost(ocp, x0, u, bp):
    x = rollout(ocp.dynamics, u, x0)
    return float(ocp.total_cost(x, u, bp))


def _check_solution(data, ocp, x0, u, golden_u_key, golden_cost_key):
    bp = float(data["final_bp"])
    assert _barrier_cost(ocp, x0, u, bp) == pytest.approx(
        float(data[golden_cost_key]), rel=1e-8
    )
    np.testing.assert_allclose(np.asarray(u), data[golden_u_key], atol=5e-2)


@pytest.mark.parametrize("name,model", MODELS)
def test_golden_seq(name, model):
    data, ocp, x0, u0 = _setup(name, model)
    u, iters = jax.jit(
        lambda u, x: ipoc_tpu.seq_interior_point_optimal_control(
            ocp, u, x, PARITY_CFG
        )
    )(u0, x0)
    np.testing.assert_allclose(np.asarray(u), data["u_seq"], atol=1e-6)
    # The reference path converges in ~80-141 iterations; a blowup here
    # means the iterate path changed even if the endpoint survived.
    assert int(iters) <= int(data["iters_seq"]) + 20


@pytest.mark.parametrize("name,model", MODELS)
def test_golden_par(name, model):
    data, ocp, x0, u0 = _setup(name, model)
    u, _ = jax.jit(
        lambda u, x: ipoc_tpu.par_interior_point_optimal_control(
            ocp, u, x, PARITY_CFG
        )
    )(u0, x0)
    _check_solution(data, ocp, x0, u, "u_seq", "cost_seq")


@pytest.mark.parametrize("name,model", MODELS)
def test_golden_ddp(name, model):
    data, ocp, x0, u0 = _setup(name, model)
    u, _ = jax.jit(
        lambda u, x: ipoc_tpu.interior_point_ddp(ocp, u, x, PARITY_CFG)
    )(u0, x0)
    _check_solution(data, ocp, x0, u, "u_ddp", "cost_ddp")


@pytest.mark.parametrize("name,model", MODELS)
def test_golden_stream_production_path(name, model):
    """The production throughput path (flat-mode stream with the BATCH
    config: single-trial globalization, fused/seq Newton step, predictor)
    must land on the reference solution too — cost within rtol 1e-6 of the
    reference-generated golden on the benchmark scenario."""
    from ipoc_tpu.solvers.stream import solve_stream

    data, ocp, x0, u0 = _setup(name, model)
    sol = jax.jit(
        lambda u, x: solve_stream(
            ocp, u[None], x[None], ipoc_tpu.BATCH_CONFIG, lanes=1,
            refill_every=4,
        )
    )(u0, x0)
    u = np.asarray(sol.controls)[0]
    c = jax.vmap(ocp.constraints)(
        rollout(ocp.dynamics, jnp.asarray(u), x0)[:-1], jnp.asarray(u)
    )
    assert bool(jnp.all(c <= 0))
    bp = float(data["final_bp"])
    assert _barrier_cost(ocp, x0, u, bp) == pytest.approx(
        float(data["cost_seq"]), rel=1e-6
    )
    # BATCH_CONFIG stops at numerical stationarity (pred_floor) rather than
    # grinding the gradient norm, so its valley slack is wider (measured:
    # ~2% of the actuation range on 2% of stages, invisible in cost at
    # R = 1e-3); the cost pin above is the sharp check.
    np.testing.assert_allclose(
        u, data["u_seq"], atol=0.02 * model.CONTROL_BOUND
    )
