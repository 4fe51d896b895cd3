"""Streaming batched interior-point solves: refill converged lanes.

The vmapped batch solvers (solvers/batched.py) pay the LOCKSTEP MAXIMUM of
per-scenario iteration counts: every lane idles until the slowest lane of the
batch finishes (and, in staged barrier mode, at every stage boundary).  On
cold-started cartpole batches the lockstep max is ~2.6x the median
(docs/PERFORMANCE.md) — that factor is pure idle work.

``solve_stream`` processes a POOL of N scenarios with B resident lanes inside
one ``lax.while_loop``: each loop step advances every lane by one flat-mode
Newton iteration (solvers/ip_newton.py flat_lane_iter — per-scenario
semantics identical to ``barrier_mode="flat"``), and lanes whose scenario
converged immediately scatter their solution to the output buffer and gather
a fresh scenario from the pool.  The batch therefore pays ~mean(iterations)
per scenario plus one drain tail for the whole stream, instead of
max(iterations) per batch — the "batched re-fill of fresh scenarios into
converged lanes" throughput strategy (SURVEY §7 "Hard parts": amortizing
whole IP solves without idling early-converged lanes).

The reference has no batching of any kind (SURVEY §2: one solve per call,
single GPU); this module is new TPU-native surface.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ipoc_tpu.config import DEFAULT_CONFIG, SolverConfig
from ipoc_tpu.problem import OCP
from ipoc_tpu.solvers.ip_newton import (
    FlatLane,
    flat_lane_init,
    flat_lane_iter,
    flat_total_cap,
)


class StreamSolution(NamedTuple):
    controls: jax.Array    # (N, T, nu) per-scenario solutions
    iterations: jax.Array  # (N,) Newton iterations per scenario
    steps: jax.Array       # () i32 lockstep loop steps taken


def _select(mask, new, old):
    """Per-lane pytree select; mask is (B,), leaves are (B, ...)."""
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(mask.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
        new, old,
    )


def solve_stream(
    ocp: OCP,
    controls,        # (N, T, nu) per-scenario warm starts
    initial_states,  # (N, nx)
    cfg: SolverConfig = DEFAULT_CONFIG,
    lanes: int = 2048,
) -> StreamSolution:
    """Solve N scenarios with B = min(lanes, N) resident lanes, refilling.

    Per-scenario results (controls, iterations) are exactly those of the
    flat-mode solver (``cfg.barrier_mode`` is ignored; the stream is
    inherently flat): the same trial sequence, the same stage transitions
    — only the lane scheduling differs.  Requires
    ``cfg.globalization == "single"`` (the retry loop is itself a lockstep
    barrier; see SolverConfig.barrier_mode).
    """
    if cfg.globalization != "single":
        raise ValueError(
            "solve_stream requires globalization='single' "
            "(the retry loop is a lockstep barrier across lanes)"
        )
    N, T, nu = controls.shape
    B = min(lanes, N)
    dtype = controls.dtype

    init = jax.vmap(partial(flat_lane_init, ocp, cfg=cfg))
    step = jax.vmap(partial(flat_lane_iter, ocp, cfg=cfg))

    lanes0 = init(controls[:B], initial_states[:B])
    sid0 = jnp.arange(B, dtype=jnp.int32)
    # Output buffers have one dummy row (index N) absorbing masked scatters.
    out_u0 = jnp.zeros((N + 1, T, nu), dtype)
    out_it0 = jnp.zeros((N + 1,), jnp.int32)
    # Worst case: every scenario runs to the flat-mode cap, fully serialized
    # across ceil(N/B) generations, plus one capture step per generation.
    max_steps = flat_total_cap(cfg) * ((N + B - 1) // B) + (N + B - 1) // B + 1

    def body(carry):
        lanes, sid, active, pool_next, out_u, out_it, t = carry

        # 1. Capture finished scenarios (dummy row N absorbs the rest; all
        #    unfinished lanes collide there harmlessly).
        fin = jnp.logical_and(lanes.done, active)
        wsid = jnp.where(fin, sid, N)
        out_u = out_u.at[wsid].set(lanes.u)
        out_it = out_it.at[wsid].set(lanes.it)

        # 2. Refill from the pool: the k-th finished lane (in lane order)
        #    takes scenario pool_next + k, while the pool lasts.
        rank = jnp.cumsum(fin, dtype=jnp.int32) - 1
        new_sid = pool_next + rank
        take = jnp.logical_and(fin, new_sid < N)
        src = jnp.where(take, new_sid, 0)
        fresh = init(controls[src], initial_states[src])
        lanes = _select(take, fresh, lanes)
        sid = jnp.where(take, new_sid, sid)
        active = jnp.logical_and(
            active, jnp.logical_or(jnp.logical_not(fin), take)
        )
        pool_next = pool_next + jnp.sum(take, dtype=jnp.int32)

        # 3. Advance every live, unfinished lane by one Newton iteration.
        #    (A freshly refilled lane with a non-finite warm start has
        #    done=True from init and is captured on the next loop step with
        #    it=0, matching the flat solver.)
        adv = jnp.logical_and(active, jnp.logical_not(lanes.done))
        lanes = _select(adv, step(lanes), lanes)
        return lanes, sid, active, pool_next, out_u, out_it, t + 1

    def cond(carry):
        _, _, active, _, _, _, t = carry
        return jnp.logical_and(jnp.any(active), t < max_steps)

    carry = (
        lanes0,
        sid0,
        jnp.ones((B,), bool),
        jnp.asarray(B, jnp.int32),
        out_u0,
        out_it0,
        jnp.asarray(0, jnp.int32),
    )
    _, _, _, _, out_u, out_it, steps = lax.while_loop(cond, body, carry)
    return StreamSolution(out_u[:N], out_it[:N], steps)
