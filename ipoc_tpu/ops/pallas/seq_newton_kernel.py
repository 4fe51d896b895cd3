"""Fused batched sequential Newton-trial kernel: batch in lanes, time in a loop.

Throughput-path counterpart of ``newton_kernel.py``.  The parallel-in-time
kernels put the *horizon* on the 128-wide lane axis and pay O(T log T)
combine work per solve — the right trade when one solve must finish fast
(the reference's headline algorithm, par_interior_point_newton.py:107-124).
When thousands of scenarios are solved together (SURVEY §7 L5, the
BASELINE.json throughput north star), the batch itself saturates the VPU and
the O(T) *sequential* Riccati recursion (reference
seq_interior_point_newton.py:42-90) is strictly less work per solve:

* layout ``(T, rows, S, 128)``: batch along lanes (and S sublane groups),
  every matrix entry a full ``(S, 128)`` VPU tile;
* one launch runs the entire trial — backward Riccati recursion with
  gain/pivot tracking, then the closed-loop forward deviation rollout — as
  two ``fori_loop``s over T with carries in registers and gains staged in
  VMEM scratch; no HBM traffic between stages;
* per-lane positive-definiteness of every ``Quu`` (and of the regularized
  control weight R) via elimination pivots (Sylvester: all leading pivots
  positive <=> PD), the same feasibility signal as the parallel backward
  pass (parallel/lqt.py par_bwd_pass).

Inputs are the costate-contracted Newton stage data (reference
compute_lqr_params, par_interior_point_newton.py:31-42) with R already
regularized, plus the terminal Hessian XT.  Outputs ``(du, dx, pred, ok)``
are drop-in for the newton_lqt -> par_bwd_pass -> par_fwd_pass pipeline:
identical stationary points, identical predicted-reduction formula
(seq:63), identical feasibility semantics.
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
# Small-matrix algebra on the (rows, LANES) layout: row r of an (n x m)
# matrix holds entry (r // m, r % m) as a LANES-wide batch vector.
# ---------------------------------------------------------------------------


def _mm(A, B, n, k, m):
    """(n x k) @ (k x m) per lane."""
    rows = []
    for i in range(n):
        for j in range(m):
            acc = A[i * k] * B[j]
            for l in range(1, k):
                acc = acc + A[i * k + l] * B[l * m + j]
            rows.append(acc)
    return jnp.stack(rows, axis=0)


def _add_mm_sym(C, A, B, n, k):
    """``C + A @ B`` for a symmetric (n x n) result, per lane.

    Computes only the upper triangle and mirrors the lower by REFERENCE —
    ``Qxx = Q + fx'Vfx``, ``Quu = R + fu'Vfu`` and ``Vxx = Qxx + Qxu K``
    are symmetric in exact arithmetic, so the lower-triangle dot products
    are redundant VPU work (and the mirror keeps the value-function carry
    exactly symmetric, like the XLA fallback's ``linalg.sym``)."""
    out = [None] * (n * n)
    for i in range(n):
        for j in range(i, n):
            acc = C[i * n + j] + A[i * k] * B[j]
            for l in range(1, k):
                acc = acc + A[i * k + l] * B[l * n + j]
            out[i * n + j] = acc
            out[j * n + i] = acc
    return jnp.stack(out, axis=0)


def _mv(A, x, n, m):
    """(n x m) @ (m,) per lane."""
    rows = []
    for i in range(n):
        acc = A[i * m] * x[0]
        for j in range(1, m):
            acc = acc + A[i * m + j] * x[j]
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def _transpose(A, n, m):
    return jnp.stack([A[i * m + j] for j in range(m) for i in range(n)], axis=0)


def _dot(a, b, n):
    acc = a[0] * b[0]
    for i in range(1, n):
        acc = acc + a[i] * b[i]
    return acc


def _solve_track(LHS, RHS, n, m):
    """Unpivoted per-lane elimination; also returns the minimum pivot."""
    a = [LHS[r] for r in range(n * n)]
    b = [RHS[r] for r in range(n * m)]
    minpiv = None
    for k in range(n):
        piv = a[k * n + k]
        minpiv = piv if minpiv is None else jnp.minimum(minpiv, piv)
        inv_p = 1.0 / piv
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
    return jnp.stack(b, axis=0), minpiv


def _gain_rhs(Qu, QxuT, nx, nu):
    """Row-major (nu, 1+nx) RHS [Qu | Qxu^T] for the gain solve.

    Row r of the row-layout encodes entry (r // (1+nx), r % (1+nx)); a
    plain concatenation of Qu's nu rows before Qxu^T's nu*nx rows only
    coincides with that layout for nu == 1.
    """
    rows = []
    for i in range(nu):
        rows.append(Qu[i])
        for j in range(nx):
            rows.append(QxuT[i * nx + j])
    return jnp.stack(rows, axis=0)


def _pivots_only(A, n):
    """Minimum leading pivot of an unpivoted elimination (PD test)."""
    if n == 1:
        return A[0]
    a = [A[r] for r in range(n * n)]
    minpiv = None
    for k in range(n):
        piv = a[k * n + k]
        minpiv = piv if minpiv is None else jnp.minimum(minpiv, piv)
        inv_p = 1.0 / piv
        for j in range(k + 1, n):
            a[k * n + j] = a[k * n + j] * inv_p
        for i in range(k + 1, n):
            f = a[i * n + k]
            for j in range(k + 1, n):
                a[i * n + j] = a[i * n + j] - f * a[k * n + j]
    return minpiv


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _seq_trial_kernel(ru_ref, Q_ref, R_ref, M_ref, fx_ref, fu_ref, XT_ref,
                      du_o, dx_o, dv_o, piv_o, Kk_ref, *, nx, nu, T):
    """Backward Riccati + forward deviation rollout, all lanes at once.

    Recursion (reference seq_interior_point_newton.py:42-90):
      Qxx = Q + fx'V fx;  Quu = R + fu'V fu;  Qxu = M + fx'V fu
      Qu  = ru + fu'v;    Qx = fx'v
      [k | K] = -Quu^{-1} [Qu | Qxu'];  v <- Qx + Qxu k;  V <- Qxx + Qxu K
      dV += k'Qu + 1/2 k'Quu k
    then dx0 = 0, du = k + K dx, dx+ = fx dx + fu du.

    Refs are (1, T, rows, LANES) blocks (one 128-lane batch chunk per grid
    step); XT is (1, rows, LANES).
    """
    lanes = (XT_ref.shape[-1],)

    def bwd_step(i, carry):
        Vxx, Vx, dv, minpiv = carry
        # int32 arithmetic: under jax_enable_x64 a bare Python `T - 1` traces
        # as i64, which Mosaic's index ops reject.
        t = jnp.int32(T - 1) - i
        ru = ru_ref[0, t]
        Q = Q_ref[0, t]
        R = R_ref[0, t]
        M = M_ref[0, t]
        fx = fx_ref[0, t]
        fu = fu_ref[0, t]
        fxT = _transpose(fx, nx, nx)
        fuT = _transpose(fu, nx, nu)

        Vfx = _mm(Vxx, fx, nx, nx, nx)
        Vfu = _mm(Vxx, fu, nx, nx, nu)
        Qxx = _add_mm_sym(Q, fxT, Vfx, nx, nx)
        Quu = _add_mm_sym(R, fuT, Vfu, nu, nx)
        Qxu = M + _mm(fxT, Vfu, nx, nx, nu)
        Qu = ru + _mv(fuT, Vx, nu, nx)
        Qx = _mv(fxT, Vx, nx, nx)

        # Quu [k | K] = -[Qu | Qxu'] in one elimination, pivots tracked.
        rhs = _gain_rhs(Qu, _transpose(Qxu, nx, nu), nx, nu)
        sol, piv = _solve_track(Quu, rhs, nu, 1 + nx)
        k = -jnp.stack([sol[i_ * (1 + nx)] for i_ in range(nu)], axis=0)
        K = -jnp.stack(
            [sol[i_ * (1 + nx) + 1 + j] for i_ in range(nu) for j in range(nx)],
            axis=0,
        )
        # Also require the regularized control weight itself PD — parity
        # with par_bwd_pass's `U_ok` check (parallel/lqt.py).
        piv = jnp.minimum(piv, _pivots_only(R, nu))

        Kk_ref[t] = jnp.concatenate([k, K], axis=0)
        Vx_new = Qx + _mv(Qxu, k, nx, nu)
        Vxx_new = _add_mm_sym(Qxx, Qxu, K, nx, nu)
        dv = dv + _dot(k, Qu, nu) + 0.5 * _dot(k, _mv(Quu, k, nu, nu), nu)
        return Vxx_new, Vx_new, dv, jnp.minimum(minpiv, piv)

    Vxx0 = XT_ref[0]
    zeros_v = jnp.zeros((nx,) + lanes, Vxx0.dtype)
    dv0 = jnp.zeros((1,) + lanes, Vxx0.dtype)
    big = jnp.full((1,) + lanes, jnp.inf, Vxx0.dtype)
    _, _, dv, minpiv = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), bwd_step, (Vxx0, zeros_v, dv0, big)
    )
    dv_o[0, 0] = dv
    piv_o[0, 0] = minpiv

    dx_o[0, 0] = zeros_v

    def fwd_step(t, dx):
        Kk = Kk_ref[t]
        k = Kk[0:nu]
        K = Kk[nu:]
        fx = fx_ref[0, t]
        fu = fu_ref[0, t]
        du = k + _mv(K, dx, nu, nx)
        dx_next = _mv(fx, dx, nx, nx) + _mv(fu, du, nx, nu)
        du_o[0, t] = du
        dx_o[0, t + 1] = dx_next
        return dx_next

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), fwd_step, zeros_v)


# ---------------------------------------------------------------------------
# Streamed, sublane-packed variant: batch fills full (S=8, 128) vregs, the
# horizon streams through the grid.
#
# The kernel above keeps the whole horizon's stage data resident in VMEM and
# puts ONE batch row in each 128-lane vector — every VPU op uses 1 of 8
# sublanes.  Here each matrix entry is a full (8, 128) tile (1024 scenarios
# per grid column) and the time axis is a grid dimension: stage t's blocks
# are DMA-pipelined while stage t+1 computes, and the Riccati carry
# (Vxx, Vx, dV, minpiv) lives in VMEM scratch that persists across grid
# steps (TPU grids run sequentially).  Per-step state is tiny, so there is
# no horizon cap.  Backward and forward passes are two launches (the
# forward needs the gains in ascending order; they are staged through HBM).
# ---------------------------------------------------------------------------

SUBLANES = 8


def _seq_bwd_stream_kernel(ru_ref, Q_ref, R_ref, M_ref, fx_ref, fu_ref,
                           XT_ref, Kk_o, dv_o, piv_o,
                           Vxx_s, Vx_s, dv_s, piv_s, *, nx, nu, T):
    """One Riccati stage per grid step, t streamed newest-to-oldest.

    Refs: stage inputs (1, 1, rows, S, LANES) at reversed time index;
    XT (1, rows, S, LANES); Kk_o (1, 1, (1+nx)*nu, S, LANES); dv/piv
    (1, 1, S, LANES).  Scratch carries the value function between steps.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        Vxx_s[:] = XT_ref[0]
        Vx_s[:] = jnp.zeros_like(Vx_s)
        dv_s[:] = jnp.zeros_like(dv_s)
        piv_s[:] = jnp.full_like(piv_s, jnp.inf)

    Vxx = Vxx_s[:]
    Vx = Vx_s[:]
    ru = ru_ref[0, 0]
    Q = Q_ref[0, 0]
    R = R_ref[0, 0]
    M = M_ref[0, 0]
    fx = fx_ref[0, 0]
    fu = fu_ref[0, 0]
    fxT = _transpose(fx, nx, nx)
    fuT = _transpose(fu, nx, nu)

    Vfx = _mm(Vxx, fx, nx, nx, nx)
    Vfu = _mm(Vxx, fu, nx, nx, nu)
    Qxx = _add_mm_sym(Q, fxT, Vfx, nx, nx)
    Quu = _add_mm_sym(R, fuT, Vfu, nu, nx)
    Qxu = M + _mm(fxT, Vfu, nx, nx, nu)
    Qu = ru + _mv(fuT, Vx, nu, nx)
    Qx = _mv(fxT, Vx, nx, nx)

    rhs = _gain_rhs(Qu, _transpose(Qxu, nx, nu), nx, nu)
    sol, piv = _solve_track(Quu, rhs, nu, 1 + nx)
    k = -jnp.stack([sol[i_ * (1 + nx)] for i_ in range(nu)], axis=0)
    K = -jnp.stack(
        [sol[i_ * (1 + nx) + 1 + j] for i_ in range(nu) for j in range(nx)],
        axis=0,
    )
    piv = jnp.minimum(piv, _pivots_only(R, nu))

    Kk_o[0, 0] = jnp.concatenate([k, K], axis=0)
    Vx_s[:] = Qx + _mv(Qxu, k, nx, nu)
    Vxx_s[:] = _add_mm_sym(Qxx, Qxu, K, nx, nu)
    dv_s[:] = dv_s[:] + (
        _dot(k, Qu, nu) + 0.5 * _dot(k, _mv(Quu, k, nu, nu), nu)
    )[None]
    piv_s[:] = jnp.minimum(piv_s[:], piv[None])

    @pl.when(t == T - 1)
    def _():
        dv_o[0, 0] = dv_s[0]
        piv_o[0, 0] = piv_s[0]


def _seq_fwd_stream_kernel(Kk_ref, fx_ref, fu_ref, du_o, dx_o, dx_s,
                           *, nx, nu, T):
    """Closed-loop deviation rollout, t streamed oldest-to-newest.

    dx_o holds dx_1..dx_T (the caller prepends dx_0 = 0).
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dx_s[:] = jnp.zeros_like(dx_s)

    dx = dx_s[:]
    Kk = Kk_ref[0, 0]
    k = Kk[0:nu]
    K = Kk[nu:]
    fx = fx_ref[0, 0]
    fu = fu_ref[0, 0]
    du = k + _mv(K, dx, nu, nx)
    dx_next = _mv(fx, dx, nx, nx) + _mv(fu, du, nx, nu)
    du_o[0, 0] = du
    dx_o[0, 0] = dx_next
    dx_s[:] = dx_next


def _pack_s(M, Bp, S):
    """(B, T, ...) -> (Bp//(S*LANES), T, prod(...), S, LANES)."""
    B, T = M.shape[:2]
    rows = 1
    for d in M.shape[2:]:
        rows *= d
    out = jnp.moveaxis(M.reshape(B, T, rows), 0, -1)  # (T, rows, B)
    out = jnp.pad(out, ((0, 0), (0, 0), (0, Bp - B)))
    return jnp.moveaxis(
        out.reshape(T, rows, Bp // (S * LANES), S, LANES), 2, 0
    )


def _unpack_s(R, B, shape):
    """(C, T, rows, S, LANES) -> (B, T, *shape)."""
    C, T, rows, S, _ = R.shape
    out = jnp.moveaxis(R, 0, 2).reshape(T, rows, C * S * LANES)[..., :B]
    return jnp.moveaxis(out, -1, 0).reshape((B, T) + shape)


def seq_newton_trial_streamed(ru, Q, R, M, fx, fu, XT, sublanes: int = SUBLANES,
                              interpret: bool = False):
    """Batched fused sequential Newton trial, sublane-packed + T-streamed.

    Same contract as :func:`seq_newton_trial_batched`; preferred when the
    batch fills at least one (sublanes x 128) tile.
    """
    B, T, nx, nu = fu.shape
    dtype = fu.dtype
    S = sublanes
    chunk = S * LANES
    Bp = _ceil_to(B, chunk)
    C = Bp // chunk

    XT_p = jnp.moveaxis(
        jnp.pad(
            jnp.moveaxis(XT.reshape(B, nx * nx), 0, -1), ((0, 0), (0, Bp - B))
        ).reshape(nx * nx, C, S, LANES),
        1, 0,
    )
    ins = (
        _pack_s(ru, Bp, S), _pack_s(Q, Bp, S), _pack_s(R, Bp, S),
        _pack_s(M, Bp, S), _pack_s(fx, Bp, S), _pack_s(fu, Bp, S), XT_p,
    )

    def rev_spec(rows):
        return pl.BlockSpec(
            (1, 1, rows, S, LANES),
            lambda b, t: (b, T - 1 - t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def fwd_spec(rows):
        return pl.BlockSpec(
            (1, 1, rows, S, LANES),
            lambda b, t: (b, t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def bcast_spec(rows):
        return pl.BlockSpec((1, rows, S, LANES), lambda b, t: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    bwd_kernel = functools.partial(_seq_bwd_stream_kernel, nx=nx, nu=nu, T=T)
    ng = (1 + nx) * nu
    with jax.enable_x64(False):
        Kk, dv_p, piv_p = pl.pallas_call(
            bwd_kernel,
            grid=(C, T),
            out_shape=(
                jax.ShapeDtypeStruct((C, T, ng, S, LANES), dtype),
                jax.ShapeDtypeStruct((C, 1, S, LANES), dtype),
                jax.ShapeDtypeStruct((C, 1, S, LANES), dtype),
            ),
            in_specs=[
                rev_spec(nu), rev_spec(nx * nx), rev_spec(nu * nu),
                rev_spec(nx * nu), rev_spec(nx * nx), rev_spec(nx * nu),
                bcast_spec(nx * nx),
            ],
            out_specs=(
                rev_spec(ng),
                pl.BlockSpec((1, 1, S, LANES), lambda b, t: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, S, LANES), lambda b, t: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((nx * nx, S, LANES), dtype),
                pltpu.VMEM((nx, S, LANES), dtype),
                pltpu.VMEM((1, S, LANES), dtype),
                pltpu.VMEM((1, S, LANES), dtype),
            ],
            interpret=interpret,
        )(*ins)

        fwd_kernel = functools.partial(
            _seq_fwd_stream_kernel, nx=nx, nu=nu, T=T
        )
        du_p, dx_p = pl.pallas_call(
            fwd_kernel,
            grid=(C, T),
            out_shape=(
                jax.ShapeDtypeStruct((C, T, nu, S, LANES), dtype),
                jax.ShapeDtypeStruct((C, T, nx, S, LANES), dtype),
            ),
            in_specs=[fwd_spec(ng), fwd_spec(nx * nx), fwd_spec(nx * nu)],
            out_specs=(fwd_spec(nu), fwd_spec(nx)),
            scratch_shapes=[pltpu.VMEM((nx, S, LANES), dtype)],
            interpret=interpret,
        )(Kk, ins[4], ins[5])

    du = _unpack_s(du_p, B, (nu,))
    dx_tail = _unpack_s(dx_p, B, (nx,))
    dx = jnp.concatenate(
        [jnp.zeros((B, 1, nx), dtype), dx_tail], axis=1
    )
    pred = _unpack_s(dv_p[:, None], B, (1,))[:, 0, 0]
    piv = _unpack_s(piv_p[:, None], B, (1,))[:, 0, 0]
    ok = jnp.isfinite(piv) & (piv > 0) & jnp.isfinite(pred)
    return du, dx, pred, ok


# ---------------------------------------------------------------------------
# Host wrappers: pack (B, T, n, m) -> (B/128, T, n*m, 128), grid over batch
# chunks of 128 lanes; blocks cover the full (rows, 128) tile.
# ---------------------------------------------------------------------------


def _pack(M, Bp):
    """(B, T, ...) -> (Bp//LANES, T, prod(...), LANES)."""
    B, T = M.shape[:2]
    rows = 1
    for d in M.shape[2:]:
        rows *= d
    out = jnp.moveaxis(M.reshape(B, T, rows), 0, -1)  # (T, rows, B)
    out = jnp.pad(out, ((0, 0), (0, 0), (0, Bp - B)))
    return jnp.moveaxis(out.reshape(T, rows, Bp // LANES, LANES), 2, 0)


def _unpack(R, B, shape):
    """(Bp//LANES, T, rows, LANES) -> (B, T, *shape)."""
    C, T, rows, _ = R.shape
    out = jnp.moveaxis(R, 0, 2).reshape(T, rows, C * LANES)[..., :B]
    return jnp.moveaxis(out, -1, 0).reshape((B, T) + shape)


def seq_newton_trial_batched(ru, Q, R, M, fx, fu, XT,
                             interpret: bool = False):
    """Batched fused sequential Newton trial.

    Shapes: ru (B,T,nu), Q (B,T,nx,nx), R (B,T,nu,nu), M (B,T,nx,nu),
    fx (B,T,nx,nx), fu (B,T,nx,nu), XT (B,nx,nx).
    Returns du (B,T,nu), dx (B,T+1,nx), pred (B,), ok (B,).
    """
    B, T, nx, nu = fu.shape
    dtype = fu.dtype
    Bp = _ceil_to(B, LANES)
    C = Bp // LANES

    XT_p = jnp.moveaxis(
        jnp.pad(
            jnp.moveaxis(XT.reshape(B, nx * nx), 0, -1), ((0, 0), (0, Bp - B))
        ).reshape(nx * nx, C, LANES),
        1, 0,
    )
    ins = (
        _pack(ru, Bp), _pack(Q, Bp), _pack(R, Bp), _pack(M, Bp),
        _pack(fx, Bp), _pack(fu, Bp), XT_p,
    )
    grid = (C,)

    def stage_spec(rows, t_dim):
        return pl.BlockSpec(
            (1, t_dim, rows, LANES),
            lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        stage_spec(nu, T), stage_spec(nx * nx, T), stage_spec(nu * nu, T),
        stage_spec(nx * nu, T), stage_spec(nx * nx, T), stage_spec(nx * nu, T),
        pl.BlockSpec((1, nx * nx, LANES), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = (
        jax.ShapeDtypeStruct((C, T, nu, LANES), dtype),
        jax.ShapeDtypeStruct((C, T + 1, nx, LANES), dtype),
        jax.ShapeDtypeStruct((C, 1, 1, LANES), dtype),
        jax.ShapeDtypeStruct((C, 1, 1, LANES), dtype),
    )
    out_specs = (
        stage_spec(nu, T), stage_spec(nx, T + 1), stage_spec(1, 1),
        stage_spec(1, 1),
    )
    kernel = functools.partial(_seq_trial_kernel, nx=nx, nu=nu, T=T)
    # Trace the kernel in x32 mode regardless of the ambient jax_enable_x64
    # setting: Mosaic's index/loop machinery requires i32 and the kernel's
    # arithmetic is all f32 (inputs are f32 by gate).
    with jax.enable_x64(False):
        du_p, dx_p, dv_p, piv_p = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((T, (1 + nx) * nu, LANES), dtype),
            ],
            interpret=interpret,
        )(*ins)

    du = _unpack(du_p, B, (nu,))
    dx = _unpack(dx_p, B, (nx,))
    pred = _unpack(dv_p, B, (1,))[:, 0, 0]
    piv = _unpack(piv_p, B, (1,))[:, 0, 0]
    ok = jnp.isfinite(piv) & (piv > 0) & jnp.isfinite(pred)
    return du, dx, pred, ok


# ---------------------------------------------------------------------------
# Sequential costate recursion, batch in lanes (reference costates.py:43-54)
# ---------------------------------------------------------------------------


def _costate_kernel(cx_ref, fx_ref, lamT_ref, lam_o, *, nx, T):
    """lam_k = cx_k + fx_k^T lam_{k+1}; lam_o holds (T+1, nx, LANES)."""
    lam_T = lamT_ref[0]
    lam_o[0, T] = lam_T

    def step(i, lam):
        t = jnp.int32(T - 1) - i
        fxT = _transpose(fx_ref[0, t], nx, nx)
        lam_new = cx_ref[0, t] + _mv(fxT, lam, nx, nx)
        lam_o[0, t] = lam_new
        return lam_new

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), step, lam_T)


def seq_costates_batched(cx, fx, lam_T, interpret: bool = False):
    """Batched sequential costate recursion: batch in lanes, one launch.

    Shapes: cx (B,T,nx), fx (B,T,nx,nx), lam_T (B,nx) -> lams (B,T+1,nx).
    Same output as parallel/costates.py seq_costates / par_costates.
    """
    B, T, nx = cx.shape
    dtype = cx.dtype
    Bp = _ceil_to(B, LANES)
    C = Bp // LANES

    lamT_p = jnp.moveaxis(
        jnp.pad(jnp.moveaxis(lam_T, 0, -1), ((0, 0), (0, Bp - B))).reshape(
            nx, C, LANES
        ),
        1, 0,
    )
    ins = (_pack(cx, Bp), _pack(fx, Bp), lamT_p)

    def spec(rows, t_dim):
        return pl.BlockSpec((1, t_dim, rows, LANES), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_costate_kernel, nx=nx, T=T)
    with jax.enable_x64(False):
        lam_p = pl.pallas_call(
            kernel,
            grid=(C,),
            out_shape=jax.ShapeDtypeStruct((C, T + 1, nx, LANES), dtype),
            in_specs=[
                spec(nx, T), spec(nx * nx, T),
                pl.BlockSpec((1, nx, LANES), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=spec(nx, T + 1),
            interpret=interpret,
        )(*ins)
    return _unpack(lam_p, B, (nx,))


def _costate_stream_kernel(cx_ref, fx_ref, lamT_ref, lam_o, lam_s, *, nx, T):
    """Streamed costate recursion: one stage per grid step, t reversed."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        lam_s[:] = lamT_ref[0]

    fxT = _transpose(fx_ref[0, 0], nx, nx)
    lam_new = cx_ref[0, 0] + _mv(fxT, lam_s[:], nx, nx)
    lam_o[0, 0] = lam_new
    lam_s[:] = lam_new


def seq_costates_streamed(cx, fx, lam_T, sublanes: int = SUBLANES,
                          interpret: bool = False):
    """Sublane-packed, T-streamed costate recursion (contract of
    :func:`seq_costates_batched`)."""
    B, T, nx = cx.shape
    dtype = cx.dtype
    S = sublanes
    chunk = S * LANES
    Bp = _ceil_to(B, chunk)
    C = Bp // chunk

    lamT_p = jnp.moveaxis(
        jnp.pad(jnp.moveaxis(lam_T, 0, -1), ((0, 0), (0, Bp - B))).reshape(
            nx, C, S, LANES
        ),
        1, 0,
    )
    ins = (_pack_s(cx, Bp, S), _pack_s(fx, Bp, S), lamT_p)

    def rev_spec(rows):
        return pl.BlockSpec(
            (1, 1, rows, S, LANES),
            lambda b, t: (b, T - 1 - t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(_costate_stream_kernel, nx=nx, T=T)
    with jax.enable_x64(False):
        lam_p = pl.pallas_call(
            kernel,
            grid=(C, T),
            out_shape=jax.ShapeDtypeStruct((C, T, nx, S, LANES), dtype),
            in_specs=[
                rev_spec(nx), rev_spec(nx * nx),
                pl.BlockSpec((1, nx, S, LANES), lambda b, t: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=rev_spec(nx),
            scratch_shapes=[pltpu.VMEM((nx, S, LANES), dtype)],
            interpret=interpret,
        )(*ins)
    lam_head = _unpack_s(lam_p, B, (nx,))
    return jnp.concatenate([lam_head, lam_T[:, None]], axis=1)


def _stream_sublanes(axis_size: int):
    """Pick the streamed kernels' sublane packing for a batch size.

    Returns 0 when the batch is too small to fill multi-sublane tiles (the
    whole-horizon-in-VMEM kernel with batch-in-lanes wins there).

    Deep packings (16/32 sublanes = 2/4 f32 vregs per row op) amortize the
    fixed per-grid-step cost (index maps, window bookkeeping) over fewer,
    fatter steps.  Measured on v5e in the single-grid stream
    (docs/PERFORMANCE.md): at B=2048, S=16 beats S=8 by ~11% per step
    (140.2 vs 157.7 us); at B=4096, S=32 beats S=16 by ~6% (115.7k vs
    109.2k solves/s) — the rule takes the deepest packing the batch fills.
    ``IPOC_KERNEL_SUBLANES`` forces a specific packing for measurement.
    """
    import os

    s = axis_size // LANES
    cands = (32, 16, 8, 4, 2)
    env = os.environ.get("IPOC_KERNEL_SUBLANES", "")
    if env:
        cands = (int(env),) + cands
    for cand in cands:
        if s >= cand:
            return cand
    return 0


def resident_kernel_vmem_ok(horizon: int, nx: int, nu: int) -> bool:
    """Whether the whole-horizon-in-VMEM kernel's stage data fits VMEM.

    Each input row is sublane-padded to 8; budget leaves room for outputs,
    scratch, and the pipeline's double buffering.  Past this the streamed
    kernel (no horizon cap) takes over.
    """
    pad8 = lambda r: -(-r // 8) * 8
    rows = (
        pad8(nu) + pad8(nx * nx) + pad8(nu * nu) + 2 * pad8(nx * nu)
        + pad8(nx * nx)
    )
    return rows * horizon * LANES * 4 <= 10 * 1024 * 1024


def _pick_kernel(axis_size: int, horizon: int, nx: int, nu: int) -> int:
    """Sublane count for the streamed kernels, or 0 for the resident one."""
    S = _stream_sublanes(axis_size)
    if S == 0 and not resident_kernel_vmem_ok(horizon, nx, nu):
        S = 1  # long horizon: stream T through the grid, single-sublane rows
    return S


@jax.custom_batching.custom_vmap
def _seq_costates(cx, fx, lam_T):
    T, nx = cx.shape
    if resident_kernel_vmem_ok(T, nx, 1):
        return seq_costates_batched(cx[None], fx[None], lam_T[None])[0]
    return seq_costates_streamed(cx[None], fx[None], lam_T[None],
                                 sublanes=1)[0]


def _broadcast_unbatched(axis_size, in_batched, args):
    """Give unbatched args (e.g. a constant terminal Hessian) a batch axis."""
    return tuple(
        a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        for a, b in zip(args, in_batched)
    )


@_seq_costates.def_vmap
def _seq_costates_vmap(axis_size, in_batched, cx, fx, lam_T):
    cx, fx, lam_T = _broadcast_unbatched(axis_size, in_batched,
                                         (cx, fx, lam_T))
    T, nx = cx.shape[1:]
    S = _pick_kernel(axis_size, T, nx, 1)
    if S:
        return seq_costates_streamed(cx, fx, lam_T, sublanes=S), True
    return seq_costates_batched(cx, fx, lam_T), True


def seq_costates_fused(cx, fx, lam_T):
    """Fused sequential costate recursion (vmap -> one batched kernel)."""
    return _seq_costates(cx, fx, lam_T)


@jax.custom_batching.custom_vmap
def _seq_newton(ru, Q, R, M, fx, fu, XT):
    T, nx, nu = fu.shape
    fn = (
        seq_newton_trial_batched
        if resident_kernel_vmem_ok(T, nx, nu)
        else functools.partial(seq_newton_trial_streamed, sublanes=1)
    )
    out = fn(ru[None], Q[None], R[None], M[None], fx[None], fu[None],
             XT[None])
    return tuple(o[0] for o in out)


@_seq_newton.def_vmap
def _seq_newton_vmap(axis_size, in_batched, ru, Q, R, M, fx, fu, XT):
    args = _broadcast_unbatched(axis_size, in_batched,
                                (ru, Q, R, M, fx, fu, XT))
    T, nx, nu = args[5].shape[1:]
    S = _pick_kernel(axis_size, T, nx, nu)
    if S:
        return seq_newton_trial_streamed(*args, sublanes=S), (True,) * 4
    return seq_newton_trial_batched(*args), (True,) * 4


def seq_newton_trial(ru, Q, R, M, fx, fu, XT):
    """One fused sequential Newton trial (vmap dispatches one batched kernel).

    Same contract as newton_kernel.fused_newton_step: inputs are the Newton
    stage data with R already regularized plus the terminal Hessian; returns
    ``(du, dx, pred_reduction, feasible)`` for the step from zero deviation.
    """
    return _seq_newton(ru, Q, R, M, fx, fu, XT)
