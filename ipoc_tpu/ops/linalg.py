"""Small dense linear-algebra helpers tuned for TPU.

The reference uses ``jnp.linalg.inv`` (seq_interior_point_newton.py:58-59)
and ``jnp.linalg.eigh`` convexity checks (seq:52-53, ddp:47-48).  On TPU
both are poor choices for tiny SPD systems: we use Cholesky factorization for
solves and the *success of the Cholesky factorization itself* as the
positive-definiteness signal (SURVEY §7 "Hard parts": eigh is expensive on
TPU; Cholesky success is the equivalent signal).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def sym(a):
    """Symmetrize (batched) square matrices; cheap drift control."""
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


def cholesky_solve(A, b):
    """Solve ``A x = b`` for symmetric positive-definite A via Cholesky.

    Works on batched operands.  ``b`` may be a vector (..., n) or matrix
    (..., n, k).  Returns NaNs if A is not PD — callers pair this with
    :func:`is_posdef` (the reference instead pairs explicit inverses with
    eigh checks).
    """
    L = jnp.linalg.cholesky(sym(A))
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )
    if vec:
        x = x[..., 0]
    return x


def is_posdef(A):
    """Positive-definiteness via Cholesky success (all-finite factor).

    Equivalent decision to the reference's ``all(eigh(A) > 0)``
    (seq_interior_point_newton.py:52-53) at a fraction of the cost.
    Reduces over all leading batch axes.
    """
    L = jnp.linalg.cholesky(sym(A))
    return jnp.all(jnp.isfinite(L))


def solve(A, b):
    """General (non-SPD) batched linear solve, LU-based."""
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    x = jnp.linalg.solve(A, b)
    if vec:
        x = x[..., 0]
    return x
