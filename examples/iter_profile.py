"""Per-iteration profile of the fused stream hot path on hardware.

Times, at the bench configuration (cartpole H=100, B lanes):

* the fused Newton-iteration kernel alone — merged one-launch vs
  two-launch (``fused_newton_iter_batched(merged=...)``),
* the transition kernel alone (``make_fused_transition``),
* one full ``flat_lane_iter`` step (kernels + XLA glue + scalar logic),
* one inner stream step including the lane-select masking.

The difference full-step minus kernels is the per-iteration XLA glue the
roofline classifies as overhead (docs/PERFORMANCE.md "Speed-of-light
accounting").  Amortizes the per-dispatch tunnel overhead by running each
probe under ``lax.fori_loop`` REPS times inside one jit (utils/timing.sync
fetches to host — block_until_ready returns early through the axon tunnel).

Usage: python examples/iter_profile.py [--lanes 2048] [--horizon 100]
"""

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_default_matmul_precision", "highest")

from ipoc_tpu.config import DEFAULT_CONFIG
from ipoc_tpu.models import cartpole
from ipoc_tpu.solvers.batched import make_batch
from ipoc_tpu.solvers.ip_newton import flat_lane_init, flat_lane_iter
from ipoc_tpu.utils.timing import sync


def timed(fn, *args, reps=50, warmup=1):
    """Wall time per call of jit(fn) amortized over an in-program loop."""

    @jax.jit
    def looped(*a):
        def body(_, carry):
            return fn(*carry)

        return lax.fori_loop(0, reps, body, a)

    for _ in range(warmup):
        sync(looped(*args))
    t0 = time.perf_counter()
    sync(looped(*args))
    dt = time.perf_counter() - t0
    return dt / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=2048)
    ap.add_argument("--horizon", type=int, default=100)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    B, T = args.lanes, args.horizon
    ocp = cartpole.make_ocp(1.0 / T)
    x0 = cartpole.initial_state(jnp.float32)
    u0, x0b = make_batch(
        jax.random.PRNGKey(0), x0, B, T, 1,
        state_scale=0.02, control_scale=0.1, dtype=jnp.float32,
    )
    cfg = DEFAULT_CONFIG.replace(
        globalization="single", barrier_mode="flat", newton_impl="fused",
        terminal_hessian="exact",
    )
    lanes = jax.vmap(
        lambda u, x: flat_lane_init(ocp, u, x, cfg))(u0, x0b)
    bp = jnp.full((B,), 0.1, jnp.float32)
    reg = jnp.full((B,), 3.0, jnp.float32)

    from ipoc_tpu.ops.pallas.fused_iter_kernel import (
        fused_newton_iter_batched,
        make_fused_transition,
    )

    results = {}

    for tag, merged in (("kernel_two_launch", False), ("kernel_merged", True)):
        def probe(x, u, b, r, _merged=merged):
            out = fused_newton_iter_batched(ocp, x, u, b, r, merged=_merged)
            # Feed the trial back in so the loop has a data dependence.
            return out[0], out[1], b, r

        dt = timed(probe, lanes.x, lanes.u, bp, reg, reps=args.reps)
        results[tag] = dt

    trans = make_fused_transition(ocp)

    def probe_trans(u, up, x0_, b):
        xa, xb, ca, cb = jax.vmap(trans)(u, up, x0_, b)
        return jnp.where((ca < cb)[:, None, None], u, up), up, x0_, b

    results["kernel_transition"] = timed(
        probe_trans, lanes.u, lanes.u * 0.99, x0b, bp, reps=args.reps)

    step = jax.vmap(functools.partial(flat_lane_iter, ocp, cfg=cfg))
    results["full_lane_iter"] = timed(
        lambda ln: (step(ln),), lanes, reps=args.reps)

    print(f"config: B={B} T={T} reps={args.reps}")
    for k, v in results.items():
        print(f"{k:24s} {v * 1e6:9.1f} us/step")
    glue = results["full_lane_iter"] - results["kernel_merged"] - results[
        "kernel_transition"]
    print(f"{'=> xla glue + scalars':24s} {glue * 1e6:9.1f} us/step")


if __name__ == "__main__":
    main()
