"""Cascadic 3-level multigrid probe: coarsest solves the cold barrier
stages, the middle level advances the barrier one more decade at 1/c cost,
the fine level finishes — vs the shipped 2-level scheme.

Levels for cartpole T=100: T=4 (bp 0.1 -> fine1), T=20 (fine1 -> fine2),
T=100 (fine2 -> bp_min).  Quality gate vs the single-grid stream.

Usage: python scripts/mg3_probe.py [B] [POOLX] [fine1] [fine2]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import ipoc_tpu  # noqa: E402
from ipoc_tpu.models import cartpole  # noqa: E402
from ipoc_tpu.solvers.batched import make_batch  # noqa: E402
from ipoc_tpu.solvers.stream import (  # noqa: E402
    solve_stream,
    solve_stream_multigrid,
)
from ipoc_tpu.utils.integrators import rollout  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
POOLX = int(sys.argv[2]) if len(sys.argv) > 2 else 16
FINE1 = float(sys.argv[3]) if len(sys.argv) > 3 else 0.02
FINE2 = float(sys.argv[4]) if len(sys.argv) > 4 else 0.004
T = 100

cfg = ipoc_tpu.BATCH_CONFIG
ocp = cartpole.make_ocp(1.0 / T)
ocp_m = cartpole.make_ocp(5.0 / T)     # T=20
ocp_c = cartpole.make_ocp(25.0 / T)    # T=4
ocp_c4 = cartpole.make_ocp(4.0 / T)    # T=25 (2-level reference)
x0 = cartpole.initial_state(jnp.float32)
N = B * POOLX
u0, x0b = make_batch(jax.random.PRNGKey(1), x0, N, T, 1,
                     state_scale=0.01, control_scale=0.1,
                     dtype=jnp.float32)


def sync(x):
    jax.block_until_ready(x)
    return np.asarray(x)


def raw_cost(u, x0s):
    x = rollout(ocp.dynamics, u, x0s)
    return ocp.total_cost(x, u, jnp.asarray(1e-9, u.dtype))


costs = jax.jit(jax.vmap(raw_cost))
print(f"B={B} N={N} platform={jax.devices()[0].platform}", flush=True)

ref = jax.jit(lambda u, x: solve_stream(ocp, u, x, cfg, lanes=B,
                                        refill_every=32))(u0, x0b)
c_sg = sync(costs(ref.controls, x0b)).astype(np.float64)
print("single-grid reference ready", flush=True)


def gate(name, fn):
    sol = fn(u0, x0b)
    sync(sol.iterations)
    t0 = time.perf_counter()
    sol = fn(u0, x0b)
    sync(sol.iterations)
    dt = time.perf_counter() - t0
    c = sync(costs(sol.controls, x0b)).astype(np.float64)
    rel = np.abs(c - c_sg) / np.maximum(np.abs(c_sg), 1e-12)
    sw = rel > 1e-3
    signed = (c - c_sg) / np.maximum(np.abs(c_sg), 1e-12)
    msd = float(signed[sw].mean()) if sw.any() else 0.0
    print(f"{name}: {N/dt:9.0f} solves/s  switch {sw.mean()*100:.2f}%  "
          f"signed_sw {msd:+.5f}  matched {float(rel[~sw].mean()):.2e}",
          flush=True)


# 2-level shipped scheme (ddp coarse)
gate("mg2[T25 ddp]", jax.jit(lambda u, x: solve_stream_multigrid(
    ocp, ocp_c4, 4, u, x, cfg, lanes=B, refill_every=32,
    coarse_impl="ddp")))


# 3-level cascadic: coarsest (T=4, ddp, cold 0.1 -> FINE1), middle
# (T=20, FINE1 -> FINE2), fine (T=100, FINE2 -> bp_min).  Composed from
# the 2-level driver: the middle+coarsest pair IS a 2-level multigrid
# stopping at FINE2, used as the coarse solver of the outer pair.
def mg3(u, x):
    def coarse_solver(ocp_mid, u_c, x_c, cfg_c, lanes, refill_every,
                      inner_unroll):
        return solve_stream_multigrid(
            ocp_mid, ocp_c, 5, u_c, x_c, cfg_c, lanes=lanes,
            refill_every=refill_every, fine_bp_init=FINE1,
            coarse_impl="ddp", inner_unroll=inner_unroll)

    return solve_stream_multigrid(
        ocp, ocp_m, 5, u, x, cfg, lanes=B, refill_every=32,
        fine_bp_init=FINE2, coarse_solver=coarse_solver)


gate(f"mg3[f1={FINE1} f2={FINE2}]", jax.jit(mg3))
