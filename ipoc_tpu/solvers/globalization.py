"""Shared Levenberg-Marquardt / trust-region globalization.

The reference implements the same rho-based regularization update three times
(par_interior_point_newton.py:166-173, seq_interior_point_newton.py:139-146,
differential_dynamic_programming.py:128-135).  This is the one shared
implementation (SURVEY §7 L4).
"""

from __future__ import annotations

import jax.numpy as jnp

from ipoc_tpu.config import SolverConfig


def gain_ratio(new_cost, cost, predicted_reduction):
    """rho = (new_cost - cost) / predicted_reduction.

    Both numerator and denominator are negative for a good step, so rho > 0
    signals simultaneous actual and predicted decrease (reference par:164-165).
    """
    return (new_cost - cost) / predicted_reduction


def lm_update(rp, r_inc, rho, success, cfg: SolverConfig):
    """Marquardt-Nielsen regularization update.

    On success: ``rp *= max(1/3, 1 - (2 rho - 1)^3)`` and the growth factor
    resets to 2; on failure ``rp *= r_inc`` and the growth factor doubles.
    ``rp`` is clipped to [reg_min, reg_max].  (Reference par:166-173.)
    """
    dtype = rp.dtype
    rp = jnp.where(
        success,
        rp * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
        rp * r_inc,
    )
    r_inc = jnp.where(success, 2.0, 2.0 * r_inc)
    rp = jnp.clip(rp, cfg.reg_min, cfg.reg_max)
    # Coerce back to the carry dtype: the gain ratio may be computed at a
    # higher precision than the solver state (mixed-precision cost
    # accumulation) and must not promote the while-loop carry.
    return rp.astype(dtype), r_inc.astype(dtype)
