"""Regenerate golden files FROM THE REFERENCE IMPLEMENTATION.

Runs the reference's own solvers (noc/seq_interior_point_newton.py:180-202
and noc/differential_dynamic_programming.py:189-208 — both paroc-free, pure
jax) on CPU float64 for the benchmark problems, and stores their converged
controls, iteration counts, and barrier costs as the parity oracle for
``tests/test_reference_parity.py`` and ``tests/test_golden.py``.

The reference's parallel solver cannot be run here (its external ``paroc``
dependency is not installed — reference README.md:3-16); per the reference's
own validation strategy (SURVEY §4: three-solver agreement), the sequential
solver is the ground truth the parallel path is compared against.

Usage (from the repo root):

    python tests/golden/generate_from_reference.py

Requires ``/root/reference`` to be present (it is read, never modified).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REFERENCE = os.environ.get("IPOC_REFERENCE_PATH", "/root/reference")
sys.path.insert(0, REFERENCE)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from noc.differential_dynamic_programming import (  # noqa: E402
    interior_point_ddp as ref_ddp,
)
from noc.seq_interior_point_newton import (  # noqa: E402
    seq_interior_point_optimal_control as ref_seq,
)

from ipoc_tpu.models import cartpole, pendulum  # noqa: E402

HORIZON = 100
# Final barrier stage the solvers converge at: bp = 0.1 / 5^4
# (par_interior_point_newton.py:233-248).
FINAL_BP = 0.1 / 5.0**4


def main():
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name, model in [("pendulum", pendulum), ("cartpole", cartpole)]:
        ocp = model.make_ocp(1.0 / HORIZON)
        x0 = model.initial_state(jnp.float64)
        # Reference warm start: u0 = 0.1 * N(0, 1), PRNGKey(1)
        # (pendulum_runtime.py:90-92).
        u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (HORIZON, 1))

        u_seq, it_seq = jax.jit(lambda u, x: ref_seq(ocp, u, x))(u0, x0)
        u_ddp, it_ddp = jax.jit(lambda u, x: ref_ddp(ocp, u, x))(u0, x0)

        from noc.utils import rollout

        def costs(u):
            x = rollout(ocp.dynamics, u, x0)
            return (
                float(ocp.total_cost(x, u, FINAL_BP)),
                float(ocp.total_cost(x, u, 0.0)),
            )

        cost_seq, raw_cost_seq = costs(u_seq)
        cost_ddp, raw_cost_ddp = costs(u_ddp)

        path = os.path.join(out_dir, f"{name}_h100.npz")
        np.savez(
            path,
            u_seq=np.asarray(u_seq),
            iters_seq=int(it_seq),
            u_ddp=np.asarray(u_ddp),
            iters_ddp=int(it_ddp),
            cost_seq=cost_seq,
            raw_cost_seq=raw_cost_seq,
            cost_ddp=cost_ddp,
            raw_cost_ddp=raw_cost_ddp,
            final_bp=FINAL_BP,
        )
        print(
            f"{name}: seq iters={int(it_seq)} cost={cost_seq:.10f} | "
            f"ddp iters={int(it_ddp)} cost={cost_ddp:.10f} -> {path}"
        )


if __name__ == "__main__":
    main()
