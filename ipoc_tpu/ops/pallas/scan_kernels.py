"""Pallas TPU kernels: fused associative scans over small-matrix elements.

The native layer of the framework (SURVEY §7 L3').  On GPU the reference
leaned on cuBLAS-backed XLA ops; the TPU speed-of-light path for the
parallel-in-time recursions is a single fused kernel per scan:

* every element field is laid out as ``(..., rows, T)`` with the horizon T
  along the 128-wide lane dimension and the (tiny) matrix entries unrolled
  over sublane rows — each matrix entry is a T-wide vector and all matrix
  algebra becomes full-width VPU ops;
* the whole inclusive scan runs inside one kernel as ceil(log2 T)
  Hillis-Steele rounds using ``pltpu.roll`` along lanes, with every round's
  intermediate living in VMEM/registers — no HBM traffic between rounds;
* the n-by-n linear solves inside the LQT value-element combine are
  unrolled in-register Gaussian eliminations vectorized over lanes;
* **batching is native**: a scenario batch B is carried as a leading block
  dimension with the kernel grid chunking over it, so one launch covers the
  whole batch.  The public wrappers are ``jax.custom_batching.custom_vmap``
  functions — a ``vmap``-ped solver call routes to the batched kernel
  instead of serializing one kernel per lane.

Two element algebras are provided, matching parallel/costates.py and
parallel/lqt.py: affine maps ``(F, c)`` (costate recursion, LQT forward
pass) and conditional-value 5-tuples ``(A, b, C, eta, J)`` (LQT backward
pass).  Padding uses the algebra identity element so suffix scans remain
exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MAX_BLOCK_LANES = 8  # batch lanes per grid step (VMEM budget)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Layout: (B, T, n, m) <-> (B, n*m, Tp), horizon along lanes
# ---------------------------------------------------------------------------


def _pack_mat(M, Tp):
    B, T, n, m = M.shape
    out = jnp.swapaxes(M.reshape(B, T, n * m), -1, -2)  # (B, n*m, T)
    return jnp.pad(out, ((0, 0), (0, 0), (0, Tp - T)))


def _pack_vec(v, Tp):
    B, T, n = v.shape
    out = jnp.swapaxes(v, -1, -2)
    return jnp.pad(out, ((0, 0), (0, 0), (0, Tp - T)))


def _unpack_mat(R, T, n, m):
    return jnp.swapaxes(R[..., :T], -1, -2).reshape(R.shape[0], T, n, m)


def _unpack_vec(R, T, n):
    return jnp.swapaxes(R[..., :T], -1, -2)


def _identity_cols(B, n, Tp, dtype):
    eye = jnp.eye(n, dtype=dtype).reshape(1, n * n, 1)
    return jnp.broadcast_to(eye, (B, n * n, Tp))


# ---------------------------------------------------------------------------
# In-kernel small-matrix algebra on the (..., rows, Tp) layout.
# Row r = i*m + j indexes matrix entry (i, j); axis -2 is the row axis.
# ---------------------------------------------------------------------------


def _mm(A, B_, n, k, m):
    """(n x k) @ (k x m) per lane."""
    rows = []
    for i in range(n):
        for j in range(m):
            acc = A[..., i * k + 0, :] * B_[..., 0 * m + j, :]
            for l in range(1, k):
                acc = acc + A[..., i * k + l, :] * B_[..., l * m + j, :]
            rows.append(acc)
    return jnp.stack(rows, axis=-2)


def _mv(A, x, n, m):
    """(n x m) @ (m,) per lane: x carried as (..., m, Tp)."""
    rows = []
    for i in range(n):
        acc = A[..., i * m + 0, :] * x[..., 0, :]
        for j in range(1, m):
            acc = acc + A[..., i * m + j, :] * x[..., j, :]
        rows.append(acc)
    return jnp.stack(rows, axis=-2)


def _transpose(A, n, m):
    return jnp.stack(
        [A[..., i * m + j, :] for j in range(m) for i in range(n)], axis=-2
    )


def _solve(LHS, RHS, n, m):
    """Per-lane n-by-n solves against m RHS columns.

    Unrolled Gaussian elimination without pivoting — the systems here are
    ``I + C J`` with C, J PSD, whose leading minors stay positive in
    well-posed problems.
    """
    a = [LHS[..., r, :] for r in range(n * n)]
    b = [RHS[..., r, :] for r in range(n * m)]
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
    for i in range(n - 2, -1, -1):
        for l in range(i + 1, n):
            f = a[i * n + l]
            for j in range(m):
                b[i * m + j] = b[i * m + j] - f * b[l * m + j]
    return jnp.stack(b, axis=-2)


def _solve_vec(LHS, rhs, n):
    return _solve(LHS, rhs, n, 1)


# ---------------------------------------------------------------------------
# Combines on the lane layout
# ---------------------------------------------------------------------------


def _affine_combine_lanes(earlier, later, n):
    """compose(earlier, later): v -> F_e @ (F_l v + c_l) + c_e."""
    Fe, ce = earlier
    Fl, cl = later
    return (_mm(Fe, Fl, n, n, n), _mv(Fe, cl, n, n) + ce)


def _value_combine_lanes(earlier, later, n):
    """The conditional-value combine of parallel/lqt.py on the lane layout."""
    Ai, bi, Ci, etai, Ji = earlier
    Aj, bj, Cj, etaj, Jj = later
    I = jnp.stack(
        [jnp.full_like(Ai[..., 0, :], 1.0 if r // n == r % n else 0.0)
         for r in range(n * n)],
        axis=-2,
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
    """Inclusive Hillis-Steele scan over the lane axis, unrolled rounds.

    ``combine(a, b)`` receives a = earlier-in-time, b = later-in-time.
    """
    t = _lane_index(Tp)
    d = 1
    while d < Tp:
        if reverse:
            # r[t] <- combine(r[t], r[t + d]); left-shift == roll by Tp - d.
            shifted = tuple(
                pltpu.roll(e, jnp.int32(Tp - d), len(e.shape) - 1)
                for e in elems
            )
            cand = combine(elems, shifted)
            keep = t >= Tp - d
        else:
            # r[t] <- combine(r[t - d], r[t]).
            shifted = tuple(
                pltpu.roll(e, jnp.int32(d), len(e.shape) - 1) for e in elems
            )
            cand = combine(shifted, elems)
            keep = t < d
        elems = tuple(jnp.where(keep, e, c) for e, c in zip(elems, cand))
        d *= 2
    return elems


# ---------------------------------------------------------------------------
# Kernels + host wrappers (batch-native, custom_vmap)
# ---------------------------------------------------------------------------


def _grid_call(kernel, ins, out_rows, Tp, dtype, interpret):
    """Launch ``kernel`` over a grid chunking the leading batch axis."""
    B = ins[0].shape[0]
    bb = min(B, MAX_BLOCK_LANES)
    Bp = _ceil_to(B, bb)
    if Bp != B:
        ins = tuple(
            jnp.pad(a, ((0, Bp - B),) + ((0, 0),) * (a.ndim - 1)) for a in ins
        )
    grid = (Bp // bb,)
    in_specs = [
        pl.BlockSpec((bb,) + a.shape[1:], lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM)
        for a in ins
    ]
    out_shape = tuple(
        jax.ShapeDtypeStruct((Bp, r, Tp), dtype) for r in out_rows
    )
    out_specs = tuple(
        pl.BlockSpec((bb, r, Tp), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM)
        for r in out_rows
    )
    # Trace in x32 mode regardless of ambient jax_enable_x64: Mosaic's
    # index/loop/roll machinery requires i32 and all kernel math is f32.
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
        )(*ins)
    if Bp != B:
        outs = tuple(o[:B] for o in outs)
    return outs


def _affine_kernel(F_ref, c_ref, Fo_ref, co_ref, *, n, Tp, reverse):
    elems = (F_ref[:], c_ref[:])
    if reverse:
        combine = lambda a, b: _affine_combine_lanes(a, b, n)
    else:
        combine = lambda a, b: _affine_combine_lanes(b, a, n)
    Fo, co = _scan_rounds(elems, combine, Tp, reverse)
    Fo_ref[:] = Fo
    co_ref[:] = co


def _affine_scan_batched(F, c, reverse, interpret):
    """F (B, T, n, n), c (B, T, n) -> same-shaped inclusive scans."""
    B, T, n, _ = F.shape
    Tp = _ceil_to(max(T, LANES), LANES)
    Fp = _pack_mat(F, Tp)
    cp = _pack_vec(c, Tp)
    pad = jnp.arange(Tp) >= T
    Fp = jnp.where(pad[None, None, :], _identity_cols(B, n, Tp, F.dtype), Fp)

    kernel = functools.partial(_affine_kernel, n=n, Tp=Tp, reverse=reverse)
    Fo, co = _grid_call(
        kernel, (Fp, cp), (n * n, n), Tp, F.dtype, interpret
    )
    return _unpack_mat(Fo, T, n, n), _unpack_vec(co, T, n)


@functools.partial(jax.custom_batching.custom_vmap)
def _affine_scan_suffix(F, c):
    out = _affine_scan_batched(F[None], c[None], True, False)
    return out[0][0], out[1][0]


@functools.partial(jax.custom_batching.custom_vmap)
def _affine_scan_prefix(F, c):
    out = _affine_scan_batched(F[None], c[None], False, False)
    return out[0][0], out[1][0]


def _broadcast_unbatched(axis_size, in_batched, args):
    """Give unbatched args a broadcast batch axis (custom_vmap rule helper)."""
    return tuple(
        a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        for a, b in zip(args, in_batched)
    )


def _make_affine_rule(reverse):
    def rule(axis_size, in_batched, F, c):
        F, c = _broadcast_unbatched(axis_size, in_batched, (F, c))
        out = _affine_scan_batched(F, c, reverse, False)
        return out, (True, True)

    return rule


_affine_scan_suffix.def_vmap(_make_affine_rule(True))
_affine_scan_prefix.def_vmap(_make_affine_rule(False))


def pallas_affine_scan(F, c, reverse: bool = False, interpret: bool = False):
    """Fused inclusive scan of affine-map elements.

    Matches ``lax.associative_scan`` over parallel/costates.py's algebra:
    ``reverse=True`` gives suffix compositions earlier∘later (costate
    recursion); ``reverse=False`` gives prefix compositions later∘earlier
    (closed-loop rollout).  F: (T, n, n), c: (T, n).  ``vmap``-ping this
    function dispatches one batched kernel (no per-lane serialization).
    """
    if interpret:
        out = _affine_scan_batched(F[None], c[None], reverse, True)
        return out[0][0], out[1][0]
    fn = _affine_scan_suffix if reverse else _affine_scan_prefix
    return fn(F, c)


def _value_kernel(A_ref, b_ref, C_ref, eta_ref, J_ref,
                  Ao, bo, Co, etao, Jo, *, n, Tp):
    elems = (A_ref[:], b_ref[:], C_ref[:], eta_ref[:], J_ref[:])
    combine = lambda a, b: _value_combine_lanes(a, b, n)
    out = _scan_rounds(elems, combine, Tp, reverse=True)
    Ao[:], bo[:], Co[:], etao[:], Jo[:] = out


def _value_scan_batched(A, b, C, eta, J, interpret):
    B, T, n, _ = A.shape
    Tp = _ceil_to(max(T, LANES), LANES)
    pad = jnp.arange(Tp) >= T
    Ap = jnp.where(
        pad[None, None, :], _identity_cols(B, n, Tp, A.dtype), _pack_mat(A, Tp)
    )
    ins = (Ap, _pack_vec(b, Tp), _pack_mat(C, Tp), _pack_vec(eta, Tp),
           _pack_mat(J, Tp))
    kernel = functools.partial(_value_kernel, n=n, Tp=Tp)
    rows = (n * n, n, n * n, n, n * n)
    Ao, bo, Co, etao, Jo = _grid_call(kernel, ins, rows, Tp, A.dtype, interpret)
    return (
        _unpack_mat(Ao, T, n, n),
        _unpack_vec(bo, T, n),
        _unpack_mat(Co, T, n, n),
        _unpack_vec(etao, T, n),
        _unpack_mat(Jo, T, n, n),
    )


@jax.custom_batching.custom_vmap
def _value_scan(A, b, C, eta, J):
    out = _value_scan_batched(A[None], b[None], C[None], eta[None], J[None],
                              False)
    return tuple(o[0] for o in out)


@_value_scan.def_vmap
def _value_scan_vmap_rule(axis_size, in_batched, A, b, C, eta, J):
    A, b, C, eta, J = _broadcast_unbatched(axis_size, in_batched,
                                           (A, b, C, eta, J))
    out = _value_scan_batched(A, b, C, eta, J, False)
    return out, (True,) * 5


def pallas_value_scan(A, b, C, eta, J, interpret: bool = False):
    """Fused suffix scan of LQT conditional-value elements.

    Matches the reverse ``lax.associative_scan`` of parallel/lqt.py
    (value_combine with earlier/later convention).  Shapes: A, C, J
    (T, n, n); b, eta (T, n).  ``vmap`` dispatches one batched kernel.
    """
    if interpret:
        out = _value_scan_batched(
            A[None], b[None], C[None], eta[None], J[None], True
        )
        return tuple(o[0] for o in out)
    return _value_scan(A, b, C, eta, J)
