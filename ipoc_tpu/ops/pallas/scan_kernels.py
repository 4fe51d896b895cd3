"""Pallas TPU kernels: fused associative scans over small-matrix elements.

The native layer of the framework (SURVEY §7 L3').  On GPU the reference
leaned on cuBLAS-backed XLA ops; the TPU speed-of-light path for the
parallel-in-time recursions is a single fused kernel per scan:

* every element field is laid out as ``(rows, T)`` with the horizon T along
  the 128-wide lane dimension and the (tiny) matrix entries unrolled over
  sublane rows — so each matrix entry is a T-wide vector and all matrix
  algebra becomes full-width VPU ops;
* the whole inclusive scan runs inside one kernel as ceil(log2 T)
  Hillis-Steele rounds using ``pltpu.roll`` along lanes, with every round's
  intermediate living in VMEM/registers — no HBM traffic between rounds
  (the ``lax.associative_scan`` lowering round-trips the element arrays
  through HBM once per combine round);
* the n-by-n linear solves inside the LQT value-element combine are
  unrolled in-register Gaussian eliminations vectorized over lanes.

Two element algebras are provided, matching parallel/costates.py and
parallel/lqt.py:

* affine maps ``(F, c)``:  compose(earlier, later) — costate recursion and
  LQT forward pass;
* conditional-value 5-tuples ``(A, b, C, eta, J)`` — LQT backward pass.

Padding uses the algebra identity element so suffix scans remain exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Layout: (T, n, n) / (T, n) pytrees <-> (rows, Tp) row-major lane layout
# ---------------------------------------------------------------------------


def _pack_mat(M, Tp):
    """(T, n, m) -> (n*m, Tp), horizon along lanes."""
    T, n, m = M.shape
    out = jnp.transpose(M.reshape(T, n * m))  # (n*m, T)
    return jnp.pad(out, ((0, 0), (0, Tp - T)))


def _pack_vec(v, Tp):
    T, n = v.shape
    out = jnp.transpose(v)  # (n, T)
    return jnp.pad(out, ((0, 0), (0, Tp - T)))


def _unpack_mat(R, T, n, m):
    return jnp.transpose(R[:, :T]).reshape(T, n, m)


def _unpack_vec(R, T, n):
    return jnp.transpose(R[:, :T]).reshape(T, n)


def _identity_cols(n, Tp, dtype):
    """(n*n, Tp) representing the identity matrix at every t."""
    eye = jnp.eye(n, dtype=dtype).reshape(n * n, 1)
    return jnp.broadcast_to(eye, (n * n, Tp))


# ---------------------------------------------------------------------------
# In-kernel small-matrix algebra on the (rows, Tp) layout.
# Values are jnp arrays (already loaded); row index r = i*m + j.
# ---------------------------------------------------------------------------


def _mm(A, B, n, k, m):
    """(n x k) @ (k x m) per lane: A (n*k, Tp), B (k*m, Tp) -> (n*m, Tp)."""
    rows = []
    for i in range(n):
        for j in range(m):
            acc = A[i * k + 0] * B[0 * m + j]
            for l in range(1, k):
                acc = acc + A[i * k + l] * B[l * m + j]
            rows.append(acc)
    return jnp.stack(rows)


def _mv(A, x, n, m):
    """(n x m) @ (m,) per lane: A (n*m, Tp), x (m, Tp) -> (n, Tp)."""
    rows = []
    for i in range(n):
        acc = A[i * m + 0] * x[0]
        for j in range(1, m):
            acc = acc + A[i * m + j] * x[j]
        rows.append(acc)
    return jnp.stack(rows)


def _transpose(A, n, m):
    """(n x m) -> (m x n) per lane."""
    return jnp.stack([A[i * m + j] for j in range(m) for i in range(n)])


def _solve(LHS, RHS, n, m):
    """Solve per-lane n-by-n systems against m right-hand sides.

    Unrolled Gaussian elimination with implicit unit pivots (no pivoting —
    the systems here are ``I + C J`` with C, J PSD, whose leading minors are
    bounded away from zero in well-posed problems).  LHS (n*n, Tp),
    RHS (n*m, Tp) -> (n*m, Tp).
    """
    a = [LHS[r] for r in range(n * n)]
    b = [RHS[r] for r in range(n * m)]
    # Forward elimination.
    for k in range(n):
        inv_p = 1.0 / a[k * n + k]
        for j in range(k + 1, n):
            a[k * n + j] = a[k * n + j] * inv_p
        for j in range(m):
            b[k * m + j] = b[k * m + j] * inv_p
        for i in range(k + 1, n):
            f = a[i * n + k]
            for j in range(k + 1, n):
                a[i * n + j] = a[i * n + j] - f * a[k * n + j]
            for j in range(m):
                b[i * m + j] = b[i * m + j] - f * b[k * m + j]
    # Back substitution.
    for i in range(n - 2, -1, -1):
        for l in range(i + 1, n):
            f = a[i * n + l]
            for j in range(m):
                b[i * m + j] = b[i * m + j] - f * b[l * m + j]
    return jnp.stack(b)


# ---------------------------------------------------------------------------
# Combines on the lane layout
# ---------------------------------------------------------------------------


def _affine_combine_lanes(earlier, later, n):
    """compose(earlier, later): v -> F_e @ (F_l v + c_l) + c_e."""
    Fe, ce = earlier
    Fl, cl = later
    F = _mm(Fe, Fl, n, n, n)
    c = _mv(Fe, cl, n, n) + ce
    return (F, c)


def _solve_vec(LHS, rhs, n):
    """Solve against a single vector RHS: rhs (n, Tp)."""
    return _solve(LHS, rhs, n, 1)


def _value_combine_lanes(earlier, later, n):
    """The conditional-value combine of parallel/lqt.py on the lane layout."""
    Ai, bi, Ci, etai, Ji = earlier
    Aj, bj, Cj, etaj, Jj = later
    I = jnp.stack(
        [jnp.full_like(Ai[0], 1.0 if r // n == r % n else 0.0)
         for r in range(n * n)]
    )
    L1 = I + _mm(Ci, Jj, n, n, n)
    L2 = I + _mm(Jj, Ci, n, n, n)

    D_A = _solve(L1, Ai, n, n)
    D_b = _solve_vec(L1, bi + _mv(Ci, etaj, n, n), n)
    D_C = _solve(L1, Ci, n, n)
    E_eta = _solve_vec(L2, etaj - _mv(Jj, bi, n, n), n)
    E_J = _solve(L2, Jj, n, n)

    AiT = _transpose(Ai, n, n)
    AjT = _transpose(Aj, n, n)
    A = _mm(Aj, D_A, n, n, n)
    b = _mv(Aj, D_b, n, n) + bj
    C = _mm(_mm(Aj, D_C, n, n, n), AjT, n, n, n) + Cj
    eta = _mv(AiT, E_eta, n, n) + etai
    J = _mm(_mm(AiT, E_J, n, n, n), Ai, n, n, n) + Ji
    return (A, b, C, eta, J)


# ---------------------------------------------------------------------------
# Hillis-Steele scan rounds (in-kernel)
# ---------------------------------------------------------------------------


def _lane_index(Tp):
    return jax.lax.broadcasted_iota(jnp.int32, (1, Tp), 1)


def _scan_rounds(elems, combine, Tp, reverse):
    """Inclusive Hillis-Steele scan over the lane axis, unrolled rounds."""
    t = _lane_index(Tp)
    d = 1
    while d < Tp:
        if reverse:
            # r[t] <- combine(r[t], r[t + d]) for t + d < Tp
            # (left-shift by d == circular roll by Tp - d)
            shifted = tuple(pltpu.roll(e, Tp - d, 1) for e in elems)
            cand = combine(elems, shifted)
            keep = t >= Tp - d  # no partner (beyond the end)
        else:
            # r[t] <- combine(r[t - d], r[t]) for t >= d
            shifted = tuple(pltpu.roll(e, d, 1) for e in elems)
            cand = combine(shifted, elems)
            keep = t < d
        elems = tuple(
            jnp.where(keep, e, c) for e, c in zip(elems, cand)
        )
        d *= 2
    return elems


# ---------------------------------------------------------------------------
# Kernels + host wrappers
# ---------------------------------------------------------------------------


def _affine_kernel(F_ref, c_ref, Fo_ref, co_ref, *, n, Tp, reverse):
    elems = (F_ref[:], c_ref[:])
    combine = lambda a, b: (
        _affine_combine_lanes(a, b, n)
        if reverse
        else _affine_combine_lanes(b, a, n)
    )
    # Convention: for the suffix scan the combined map is
    # earlier∘later (costates); for the prefix scan later∘earlier
    # (forward rollout).  combine(x, y) receives x = "earlier in time".
    Fo, co = _scan_rounds(elems, combine, Tp, reverse)
    Fo_ref[:] = Fo
    co_ref[:] = co


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def pallas_affine_scan(F, c, reverse: bool = False, interpret: bool = False):
    """Fused inclusive scan of affine-map elements.

    Matches ``lax.associative_scan`` over parallel/costates.py's algebra:
    ``reverse=True`` gives suffix compositions earlier∘later (costate
    recursion); ``reverse=False`` gives prefix compositions later∘earlier
    (closed-loop rollout).  F: (T, n, n), c: (T, n).
    """
    T, n, _ = F.shape
    Tp = _ceil_to(max(T, LANES), LANES)
    Fp = _pack_mat(F, Tp)
    cp = _pack_vec(c, Tp)
    # Identity padding keeps suffix scans exact.
    pad_mask = jnp.arange(Tp) >= T
    Fp = jnp.where(pad_mask[None, :], _identity_cols(n, Tp, F.dtype), Fp)

    kernel = functools.partial(_affine_kernel, n=n, Tp=Tp, reverse=reverse)
    Fo, co = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n * n, Tp), F.dtype),
            jax.ShapeDtypeStruct((n, Tp), c.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(Fp, cp)
    return _unpack_mat(Fo, T, n, n), _unpack_vec(co, T, n)


def _value_kernel(A_ref, b_ref, C_ref, eta_ref, J_ref,
                  Ao, bo, Co, etao, Jo, *, n, Tp):
    elems = (A_ref[:], b_ref[:], C_ref[:], eta_ref[:], J_ref[:])
    combine = lambda a, b: _value_combine_lanes(a, b, n)
    out = _scan_rounds(elems, combine, Tp, reverse=True)
    Ao[:], bo[:], Co[:], etao[:], Jo[:] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_value_scan(A, b, C, eta, J, interpret: bool = False):
    """Fused suffix scan of LQT conditional-value elements.

    Matches the reverse ``lax.associative_scan`` of parallel/lqt.py
    (value_combine with earlier/later convention).  Shapes: A, C, J
    (T, n, n); b, eta (T, n).
    """
    T, n, _ = A.shape
    Tp = _ceil_to(max(T, LANES), LANES)
    pad = jnp.arange(Tp) >= T

    Ap = jnp.where(pad[None, :], _identity_cols(n, Tp, A.dtype), _pack_mat(A, Tp))
    bp = _pack_vec(b, Tp)
    Cp = _pack_mat(C, Tp)
    etap = _pack_vec(eta, Tp)
    Jp = _pack_mat(J, Tp)
    # identity element: A=I, b=0, C=0, eta=0, J=0 — b/C/eta/J pads are
    # already zero from _pack_*'s zero padding.

    kernel = functools.partial(_value_kernel, n=n, Tp=Tp)
    shapes = (
        jax.ShapeDtypeStruct((n * n, Tp), A.dtype),
        jax.ShapeDtypeStruct((n, Tp), A.dtype),
        jax.ShapeDtypeStruct((n * n, Tp), A.dtype),
        jax.ShapeDtypeStruct((n, Tp), A.dtype),
        jax.ShapeDtypeStruct((n * n, Tp), A.dtype),
    )
    Ao, bo, Co, etao, Jo = pl.pallas_call(
        kernel,
        out_shape=shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(5)),
        interpret=interpret,
    )(Ap, bp, Cp, etap, Jp)
    return (
        _unpack_mat(Ao, T, n, n),
        _unpack_vec(bo, T, n),
        _unpack_mat(Co, T, n, n),
        _unpack_vec(etao, T, n),
        _unpack_mat(Jo, T, n, n),
    )
