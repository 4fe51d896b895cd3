"""Packed vs unpacked stream on the TPU chip: the decisive measurement.

1. fori-loop of the packed fused-iteration core (no pack/unpack) vs the
   unpacked wrapper — isolates the relayout cost.
2. Real pool-drain throughput: solve_stream with IPOC_PACKED_STREAM on/off
   (per-step via the stream step counter — the trusted methodology).

Usage: python scripts/packed_bench.py [B] [T] [POOLX]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import ipoc_tpu  # noqa: E402
from ipoc_tpu.models import cartpole  # noqa: E402
from ipoc_tpu.ops.pallas.fused_iter_kernel import (  # noqa: E402
    _pack_vec,
    fused_newton_iter_packed,
    make_fused_iter,
)
from ipoc_tpu.ops.pallas.seq_newton_kernel import (  # noqa: E402
    LANES,
    _ceil_to,
    _pack_s,
    _stream_sublanes,
)
from ipoc_tpu.solvers.batched import make_batch  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
T = int(sys.argv[2]) if len(sys.argv) > 2 else 100
POOLX = int(sys.argv[3]) if len(sys.argv) > 3 else 8
M = 300

cfg = ipoc_tpu.BATCH_CONFIG
ocp = cartpole.make_ocp(1.0 / T)
x0 = cartpole.initial_state(jnp.float32)
u0, x0b = make_batch(jax.random.PRNGKey(1), x0, B, T, 1,
                     state_scale=0.01, control_scale=0.1, dtype=jnp.float32)


def sync(x):
    jax.block_until_ready(x)
    return np.asarray(x)


def timeit(name, fn, *args, m=M):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1]
    print(f"{name:46s} {med / m * 1e6:9.1f} us/step  ({med:.3f} s / {m})",
          flush=True)
    return med


S = _stream_sublanes(B)
print(f"B={B} T={T} S={S} platform={jax.devices()[0].platform}", flush=True)
chunk = S * LANES
Bp = _ceil_to(B, chunk)

xfull = jnp.concatenate(
    [x0b[:, None], jnp.zeros((B, T, 4), jnp.float32)], axis=1)
from ipoc_tpu.utils.integrators import rollout  # noqa: E402

xfull = jax.vmap(lambda u, x: rollout(ocp.dynamics, u, x))(u0, x0b)
xs_p = _pack_s(xfull[:, :-1], Bp, S)
xT_p = _pack_vec(xfull[:, -1], Bp, S)
u_p = _pack_s(u0, Bp, S)
bp_p = _pack_vec(jnp.full((B, 1), 0.1, jnp.float32), Bp, S)
reg_p = _pack_vec(jnp.full((B, 1), 1.0, jnp.float32), Bp, S)


# P1: packed core, no cu
@jax.jit
def run_packed_core(xs, xT, u):
    def body(_, c):
        xs, xT, u = c
        out = fused_newton_iter_packed(ocp, xs, xT, u, bp_p, reg_p,
                                       merged=False)
        return out[1], out[2], out[0]

    xs, xT, u = jax.lax.fori_loop(0, M, body, (xs, xT, u))
    return u[0, 0, 0, 0, 0], xs


# P2: packed core with cu
@jax.jit
def run_packed_core_cu(xs, xT, u):
    def body(_, c):
        xs, xT, u = c
        out = fused_newton_iter_packed(ocp, xs, xT, u, bp_p, reg_p,
                                       with_cu=True, merged=False)
        return out[1], out[2], out[0]

    xs, xT, u = jax.lax.fori_loop(0, M, body, (xs, xT, u))
    return u[0, 0, 0, 0, 0], xs


# P3: unpacked wrapper (same as step_decomposition variant C)
fused = make_fused_iter(ocp)
vfused = jax.vmap(fused)
bp_b = jnp.full((B,), 0.1, jnp.float32)
reg_b = jnp.full((B,), 1.0, jnp.float32)


@jax.jit
def run_unpacked(x, u):
    def body(_, c):
        x, u = c
        tx, tu, *_ = vfused(x, u, bp_b, reg_b)
        return tx, tu

    x, u = jax.lax.fori_loop(0, M, body, (x, u))
    return x[0, 0, 0], u


# P4: full packed lane iter (production step)
from ipoc_tpu.solvers.packed_stream import (  # noqa: E402
    _pack_scal,
    packed_lane_init,
    packed_lane_iter,
)

C = Bp // chunk
bp0 = _pack_scal(jnp.full((B,), cfg.bp_init, jnp.float32), Bp, C, S, LANES)
rp0 = _pack_scal(jnp.full((B,), cfg.reg_init, jnp.float32), Bp, C, S, LANES)
x0_p = _pack_vec(x0b, Bp, S)


@jax.jit
def run_packed_full(u_p):
    lane = packed_lane_init(ocp, u_p, x0_p, bp0, rp0, cfg)

    def body(_, ln):
        adv = jnp.logical_not(ln.done)
        return packed_lane_iter(ocp, ln, cfg, adv)

    lane = jax.lax.fori_loop(0, M, body, lane)
    return lane.u[0, 0, 0, 0, 0], lane.it


timeit("P1 packed core (no cu)", run_packed_core, xs_p, xT_p, u_p)
timeit("P2 packed core (with cu)", run_packed_core_cu, xs_p, xT_p, u_p)
timeit("P3 unpacked wrapper", run_unpacked, xfull, u0)
timeit("P4 full packed lane iter", run_packed_full, u_p)

# Ground truth: stream drains, packed vs unpacked
from ipoc_tpu.solvers.stream import solve_stream  # noqa: E402

uN = jnp.tile(u0, (POOLX, 1, 1))
xN = jnp.tile(x0b, (POOLX, 1))

for packed in (True, False):
    os.environ["IPOC_PACKED_STREAM"] = "1" if packed else "0"
    stream = jax.jit(lambda u, x: solve_stream(ocp, u, x, cfg, lanes=B,
                                               refill_every=16))
    sol = stream(uN, xN)
    sync(sol.iterations)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sol = stream(uN, xN)
        steps = int(sync(sol.steps))
        ts.append(time.perf_counter() - t0)
    dtm = sorted(ts)[1]
    name = "packed" if packed else "unpacked"
    print(f"stream[{name}]: {dtm / steps * 1e6:9.1f} us/step  "
          f"({steps} steps, {dtm:.3f} s, {B * POOLX / dtm:.0f} solves/s, "
          f"mean_it={float(np.mean(sync(sol.iterations))):.1f})", flush=True)
