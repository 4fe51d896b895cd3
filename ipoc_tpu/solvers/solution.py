"""Rich solve API with structured per-solve metrics.

The reference returns only ``(u, iterations)`` (par_interior_point_newton.py:254)
and its sole observability is commented-out ``jax.debug.print`` lines
(SURVEY §5.5).  ``solve()`` returns an :class:`IPSolution` carrying the
converged trajectory plus the metrics a production deployment needs —
iterations, final stationarity, cost, feasibility — all computed inside the
jitted program (no extra host round-trips).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ipoc_tpu.config import DEFAULT_CONFIG, SolverConfig
from ipoc_tpu.ops.derivatives import (
    check_feasibility,
    compute_first_order,
)
from ipoc_tpu.parallel.costates import par_costates
from ipoc_tpu.problem import OCP
from ipoc_tpu.solvers.barrier import n_barrier_stages
from ipoc_tpu.solvers.ip_ddp import interior_point_ddp
from ipoc_tpu.solvers.ip_newton import (
    par_interior_point_optimal_control,
    seq_interior_point_optimal_control,
)
from ipoc_tpu.utils.integrators import rollout

_SOLVERS = {
    "par": par_interior_point_optimal_control,
    "seq": seq_interior_point_optimal_control,
    "ddp": interior_point_ddp,
}


class IPSolution(NamedTuple):
    """Solution + health metrics of one interior-point solve."""

    controls: jax.Array      # (T, nu)
    states: jax.Array        # (T+1, nx)
    iterations: jax.Array    # () int32 — total Newton iterations
    grad_norm: jax.Array     # () — ||grad_u H||_inf at the final barrier
    cost: jax.Array          # () — barrier-free total cost
    feasible: jax.Array      # () bool — all constraints satisfied
    converged: jax.Array     # () bool — grad_norm < tol

    def metrics(self) -> dict:
        """Host-side dict of scalar metrics (for logging)."""
        return {
            "iterations": int(self.iterations),
            "grad_norm": float(self.grad_norm),
            "cost": float(self.cost),
            "feasible": bool(self.feasible),
            "converged": bool(self.converged),
        }


def solve(
    ocp: OCP,
    controls,
    initial_state,
    cfg: SolverConfig = DEFAULT_CONFIG,
    method: str = "par",
) -> IPSolution:
    """Full interior-point solve with structured metrics.  Jit-compatible."""
    solver = _SOLVERS[method]
    u, iters = solver(ocp, controls, initial_state, cfg)
    x = rollout(ocp.dynamics, u, initial_state)

    # Stationarity of the final barrier stage actually solved.
    # ||grad_u H||_inf = max |cu + fu^T lam| is a FIRST-order quantity:
    # only cx/cu/fx/fu feed the costate scan and the contraction, so skip
    # the full second-order sweep (the (T,nx,nx,nx) curvature tensors)
    # that compute_derivatives would materialize just to be discarded.
    n_stages = n_barrier_stages(cfg)
    bp_final = cfg.bp_init / cfg.bp_decay ** (n_stages - 1)
    d = compute_first_order(ocp, x, u, bp_final)
    lam = par_costates(ocp, x[-1], d)
    ru = d.cu + jnp.einsum("tiu,ti->tu", d.fu, lam[1:])
    grad_norm = jnp.max(jnp.abs(ru))

    cost = ocp.total_cost(x, u, jnp.zeros((), x.dtype))
    feasible = check_feasibility(ocp, x, u)
    return IPSolution(
        controls=u,
        states=x,
        iterations=iters,
        grad_norm=grad_norm,
        cost=cost,
        feasible=feasible,
        converged=grad_norm < cfg.tol,
    )

