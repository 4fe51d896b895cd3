"""Benchmark driver: batched constrained-cartpole H=100 IP solves/s.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol follows the reference harness (1 untimed warmup to exclude compile,
then timed reps with ``block_until_ready``, median reported — reference
examples/cartpole_runtime.py:115-174), adapted to the TPU throughput story:
a vmapped batch of full interior-point solves per timed rep.

Baseline: the reference repo publishes no numbers (BASELINE.md). The
denominator used for ``vs_baseline`` is the BASELINE.json north-star target
pro-rated to one chip: 1e4 solves/s on a v5p-16 (8 chips) => 1250 solves/s
per chip.  vs_baseline > 1 beats the per-chip north star.

The headline configuration is the multigrid-in-time stream
(solvers/stream.py solve_stream_multigrid): the scenario pool is solved on
a 4x-coarser time grid first (cold-start stage-1 work, ~66% of iterations,
runs at 1/4 cost per iteration), interpolated, and re-entered into the
barrier schedule on the fine grid; both levels stream the pool through
IPOC_BENCH_BATCH resident lanes with converged lanes refilled every
IPOC_BENCH_REFILL steps.  Solutions satisfy the same final-stage
convergence criteria as the single-grid stream (docs/PERFORMANCE.md
documents the local-basin caveat on nonconvex scenarios).  Set
IPOC_BENCH_MODE=stream for the single-grid stream or =batch for the plain
vmapped solver.

Env knobs: IPOC_BENCH_BATCH (default 2048 lanes), IPOC_BENCH_POOL (default
32x lanes), IPOC_BENCH_REPS (default 5), IPOC_BENCH_HORIZON (default 100),
IPOC_BENCH_MODE (mg|stream|batch), IPOC_BENCH_REFILL (default 16),
IPOC_BENCH_COARSEN (default 4).
"""

import json
import os
import statistics
import sys
import time

# The fused Newton-trial kernel is validated but its on-hardware compile
# time is not yet characterized; default it off here so the benchmark always
# runs the known-good configuration.  Set IPOC_FUSED_NEWTON=1 to measure it.
os.environ.setdefault("IPOC_FUSED_NEWTON", "0")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    """Force completion: on the remote-attached TPU platform used here,
    ``block_until_ready`` returns before execution finishes; a host fetch is
    the only reliable barrier."""
    jax.block_until_ready(x)
    return np.asarray(x)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ipoc_tpu
from ipoc_tpu.models import cartpole, pendulum, quadrotor, unicycle
from ipoc_tpu.solvers.batched import make_batch, solve_batch
from ipoc_tpu.solvers.stream import solve_stream, solve_stream_multigrid

MODELS = {"cartpole": cartpole, "pendulum": pendulum,
          "quadrotor": quadrotor, "unicycle": unicycle}
MODEL = os.environ.get("IPOC_BENCH_MODEL", "cartpole")

BATCH = int(os.environ.get("IPOC_BENCH_BATCH", "2048"))
# Deep pools amortize the stream's drain tail: steps/scenario falls toward
# mean_iterations/lanes as generations grow (docs/PERFORMANCE.md).
POOL = int(os.environ.get("IPOC_BENCH_POOL", str(32 * BATCH)))
REPS = int(os.environ.get("IPOC_BENCH_REPS", "5"))
HORIZON = int(os.environ.get("IPOC_BENCH_HORIZON", "100"))
MODE = os.environ.get("IPOC_BENCH_MODE", "mg")
COARSEN = int(os.environ.get("IPOC_BENCH_COARSEN", "4"))
REFILL = int(os.environ.get("IPOC_BENCH_REFILL", "16"))
DT = 1.0 / HORIZON  # reference sweep keeps H * dt = 1 s
NORTH_STAR_PER_CHIP = 1e4 / 8.0


def main():
    model = MODELS[MODEL]
    ocp = model.make_ocp(DT)
    x0 = model.initial_state(jnp.float32)
    n_scen = POOL if MODE in ("stream", "mg") else BATCH
    nu = 2 if MODEL in ("quadrotor", "unicycle") else 1
    u0, x0b = make_batch(
        jax.random.PRNGKey(1), x0, n_scen, HORIZON, nu,
        state_scale=0.01, control_scale=0.1, dtype=jnp.float32,
    )
    if MODEL == "quadrotor":
        # shift the random warm start around hover thrust (feasible box)
        u0 = u0 + quadrotor.hover_controls(HORIZON, jnp.float32)[None]
    cfg = ipoc_tpu.BATCH_CONFIG
    if os.environ.get("IPOC_BENCH_BARRIER"):
        cfg = cfg.replace(barrier_mode=os.environ["IPOC_BENCH_BARRIER"])

    mode = MODE
    if mode == "mg" and HORIZON % COARSEN != 0:
        print(f"# horizon {HORIZON} not divisible by coarsen {COARSEN}; "
              "falling back to single-grid stream", file=sys.stderr)
        mode = "stream"
    if mode == "mg":
        ocp_c = model.make_ocp(DT * COARSEN)
        step = jax.jit(lambda u, x: solve_stream_multigrid(
            ocp, ocp_c, COARSEN, u, x, cfg, lanes=BATCH,
            refill_every=REFILL))
    elif mode == "stream":
        step = jax.jit(lambda u, x: solve_stream(
            ocp, u, x, cfg, lanes=BATCH, refill_every=REFILL))
    else:
        step = jax.jit(lambda u, x: solve_batch(ocp, u, x, cfg))

    # Warmup (compile) — excluded from timing, reference protocol.
    sol = step(u0, x0b)
    _sync(sol.iterations)

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        sol = step(u0, x0b)
        _sync(sol.iterations)
        times.append(time.perf_counter() - t0)
    if os.environ.get("IPOC_BENCH_DEBUG"):
        print("times:", times, file=sys.stderr)
        print("iters:", sol.iterations.min(), sol.iterations.max(),
              file=sys.stderr)

    med = statistics.median(times)
    solves_per_sec = n_scen / med
    print(
        json.dumps(
            {
                "metric": f"{MODEL}_h{HORIZON}_ip_solves_per_sec",
                "value": round(solves_per_sec, 3),
                "unit": "solves/s/chip",
                "vs_baseline": round(solves_per_sec / NORTH_STAR_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
