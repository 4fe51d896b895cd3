"""Warm-started nonlinear MPC: amortized interior-point resolves.

The throughput story for deployment: a receding-horizon controller re-solves
the IP problem from the previous plan every step, so per-step Newton
iteration counts collapse versus cold starts.  The whole closed loop is one
``lax.scan``.

Usage: python examples/nonlinear_mpc.py [--steps 50] [--platform cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

p = argparse.ArgumentParser()
p.add_argument("--steps", type=int, default=50)
p.add_argument("--horizon", type=int, default=40)
p.add_argument("--platform", default=None)
args = p.parse_args()
if args.platform:
    jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp
import numpy as np

import ipoc_tpu
from ipoc_tpu.models import pendulum
from ipoc_tpu.mpc import nmpc_loop
from ipoc_tpu.utils.timing import sync


def main():
    dt = 0.02
    ocp = pendulum.make_ocp(dt)
    # Warm-started resolves converge in a handful of iterations; cap tightly.
    cfg = ipoc_tpu.BATCH_CONFIG.replace(max_newton_iters=25)

    def solve(u_warm, x):
        u, _ = ipoc_tpu.par_interior_point_optimal_control(ocp, u_warm, x, cfg)
        return u

    x0 = pendulum.initial_state(jnp.float32)
    u_init = jnp.zeros((args.horizon, 1), jnp.float32)

    loop = jax.jit(
        lambda x, u: nmpc_loop(solve, ocp.dynamics, x, u, args.steps)
    )
    xs, us = loop(x0, u_init)
    sync(xs)
    t0 = time.perf_counter()
    xs, us = loop(x0, u_init)
    sync(xs)
    wall = time.perf_counter() - t0
    print(
        f"{args.steps} MPC steps in {wall:.3f}s "
        f"({args.steps / wall:.1f} resolves/s); "
        f"real-time budget per step: {dt * 1e3:.0f} ms, "
        f"actual: {wall / args.steps * 1e3:.2f} ms"
    )
    print("max |u|:", float(jnp.abs(us).max()), "(bound 5)")
    print("final state:", np.asarray(xs[-1]))


if __name__ == "__main__":
    main()
