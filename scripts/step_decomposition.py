"""Per-step decomposition of the fused stream iteration on the TPU chip.

Ground truth for VERDICT r2 #1 (the overhead-bound gap): times the full
flat-mode lane iteration and stripped variants in a data-dependent
``fori_loop`` (M steps, carry threaded so nothing hoists), syncing on a
small host fetch.  The full-variant number is cross-calibrated against the
stream step-counter methodology (docs/PERFORMANCE.md) by also draining a
real pool.

Usage:  python scripts/step_decomposition.py [B] [T] [M]
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
from ipoc_tpu.solvers.ip_newton import (  # noqa: E402
    flat_lane_init,
    flat_lane_iter,
)
from ipoc_tpu.solvers.stream import solve_stream  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
T = int(sys.argv[2]) if len(sys.argv) > 2 else 100
M = int(sys.argv[3]) if len(sys.argv) > 3 else 300

cfg = ipoc_tpu.BATCH_CONFIG
ocp = cartpole.make_ocp(1.0 / T)
x0 = cartpole.initial_state(jnp.float32)
u0, x0b = make_batch(jax.random.PRNGKey(1), x0, B, T, 1,
                     state_scale=0.01, control_scale=0.1, dtype=jnp.float32)


def sync(x):
    jax.block_until_ready(x)
    return np.asarray(x)


def timeit(name, fn, *args):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1]
    print(f"{name:42s} {med / M * 1e6:9.1f} us/step   ({med:.3f} s / {M})")
    return med


init = jax.vmap(lambda u, x: flat_lane_init(ocp, u, x, cfg))
lanes0 = init(u0, x0b)

# --- A: full lane iteration (predictor on; the production step) ---------
step_full = jax.vmap(lambda ln: flat_lane_iter(ocp, ln, cfg))


@jax.jit
def run_full(lanes):
    def body(_, ln):
        return step_full(ln)

    out = jax.lax.fori_loop(0, M, body, lanes)
    return out.u[0, 0, 0], out.it


# --- B: predictor off ----------------------------------------------------
cfg_np = cfg.replace(stage_predictor=False)
step_np = jax.vmap(lambda ln: flat_lane_iter(ocp, ln, cfg_np))


@jax.jit
def run_nopred(lanes):
    def body(_, ln):
        return step_np(ln)

    out = jax.lax.fori_loop(0, M, body, lanes)
    return out.u[0, 0, 0], out.it


# --- C: kernels only (unconditional adopt, fixed reg) -------------------
from ipoc_tpu.ops.pallas.fused_iter_kernel import (  # noqa: E402
    make_fused_iter,
    make_fused_transition,
)

fused = make_fused_iter(ocp)
vfused = jax.vmap(fused)
trans = make_fused_transition(ocp)
vtrans = jax.vmap(trans)
bp_b = jnp.full((B,), 0.1, jnp.float32)
reg_b = jnp.full((B,), 1.0, jnp.float32)


@jax.jit
def run_kernels(x, u):
    def body(_, c):
        x, u = c
        tx, tu, cost, nc, mc, pred, ok, hu = vfused(x, u, bp_b, reg_b)
        return tx, tu

    x, u = jax.lax.fori_loop(0, M, body, (x, u))
    return x[0, 0, 0], u


# --- D: kernels + cu/reg XLA pass ---------------------------------------
def cu_reg(x, u, bp, rp):
    cu = jax.vmap(
        jax.vmap(lambda xx, uu, b: jax.grad(ocp.stage_cost, 1)(xx, uu, b),
                 in_axes=(0, 0, None)),
        in_axes=(0, 0, 0),
    )(x[:, :-1], u, bp)
    nrm = jnp.sqrt(jnp.sum(cu * cu, axis=(1, 2)))
    return rp * jnp.maximum(nrm, 1e-6)


@jax.jit
def run_kernels_cu(x, u):
    def body(_, c):
        x, u = c
        reg = cu_reg(x, u, bp_b, reg_b)
        tx, tu, cost, nc, mc, pred, ok, hu = vfused(x, u, bp_b, reg)
        return tx, tu

    x, u = jax.lax.fori_loop(0, M, body, (x, u))
    return x[0, 0, 0], u


# --- E: kernels + cu + accept glue (no transition machinery) ------------
@jax.jit
def run_accept(x, u):
    def body(_, c):
        x, u, rp, ri = c
        reg = cu_reg(x, u, bp_b, rp)
        tx, tu, cost, nc, mc, pred, ok, hu = vfused(x, u, bp_b, reg)
        new_cost = jnp.where(mc <= 0.0, nc, jnp.inf)
        from ipoc_tpu.solvers.globalization import gain_ratio, lm_update
        rho = gain_ratio(new_cost, cost, pred)
        accept = jnp.logical_and(rho > 0.0, ok)
        rp, ri = jax.vmap(lambda a, b, c_, d: lm_update(a, b, c_, d, cfg))(
            rp, ri, rho, accept)
        am = accept[:, None, None]
        x = jnp.where(am, tx, x)
        u = jnp.where(am, tu, u)
        return x, u, rp, ri

    x, u, _, _ = jax.lax.fori_loop(
        0, M, body, (x, u, reg_b, jnp.full((B,), 2.0, jnp.float32)))
    return x[0, 0, 0], u


# --- F: transition kernel only ------------------------------------------
@jax.jit
def run_trans(u):
    def body(_, c):
        u, up = c
        xa, xb, ca, cb = vtrans(u, up, x0b, bp_b)
        # thread a data dependence through both carries
        eps = (ca[0] * jnp.float32(1e-30))
        return u * jnp.float32(0.9999) + eps, up + eps

    u, up = jax.lax.fori_loop(0, M, body, (u, u * jnp.float32(0.99)))
    return u[0, 0, 0], up


print(f"B={B} T={T} M={M}  platform={jax.devices()[0].platform}")
timeit("A full lane iter (predictor on)", run_full, lanes0)
timeit("B full lane iter (predictor off)", run_nopred, lanes0)
timeit("C fused kernels only", run_kernels, lanes0.x, lanes0.u)
timeit("D kernels + cu/reg pass", run_kernels_cu, lanes0.x, lanes0.u)
timeit("E kernels + cu + accept glue", run_accept, lanes0.x, lanes0.u)
timeit("F transition kernel only", run_trans, lanes0.u)

# Ground truth: stream drain / step counter
pool = 8
uN = jnp.tile(u0, (pool, 1, 1))
xN = jnp.tile(x0b, (pool, 1))
stream = jax.jit(lambda u, x: solve_stream(ocp, u, x, cfg, lanes=B,
                                           refill_every=16))
sol = stream(uN, xN)
sync(sol.iterations)
t0 = time.perf_counter()
sol = stream(uN, xN)
steps = int(sync(sol.steps))
dt = time.perf_counter() - t0
print(f"stream ground truth: {dt / steps * 1e6:9.1f} us/step "
      f"({steps} steps, {dt:.3f} s, {B * pool / dt:.0f} solves/s)")
