"""Barrier-schedule driver shared by all interior-point solvers.

The reference repeats the same ``lax.while_loop`` barrier loop in each solver
(par_interior_point_newton.py:228-254, seq:180-202, ddp:189-208): start at
``bp = 0.1``, run the inner solver warm-started from the previous stage's
controls, divide by 5, stop at ``bp <= 1e-4`` (exactly five stages with the
defaults).  Here it is one driver parameterized by SolverConfig.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax import lax

from ipoc_tpu.config import SolverConfig


def n_barrier_stages(cfg: SolverConfig) -> int:
    """Number of stages the schedule runs (5 with reference defaults)."""
    n, bp = 0, cfg.bp_init
    while bp > cfg.bp_min:
        n += 1
        bp /= cfg.bp_decay
    return n


def barrier_loop(solve_stage: Callable, controls, cfg: SolverConfig):
    """Run ``solve_stage(u, bp) -> (u, newton_iters)`` over the barrier schedule.

    Returns ``(u_opt, total_newton_iterations)``, matching the reference
    entry-point signature (par:228-254).
    """
    dtype = controls.dtype
    bp0 = jnp.asarray(cfg.bp_init, dtype)

    def body(val):
        u, bp, total = val
        u, iters = solve_stage(u, bp)
        return u, bp / cfg.bp_decay, total + iters

    def cond(val):
        return val[1] > cfg.bp_min

    u_opt, _, total_iters = lax.while_loop(
        cond, body, (controls, bp0, jnp.asarray(0, jnp.int32))
    )
    return u_opt, total_iters
