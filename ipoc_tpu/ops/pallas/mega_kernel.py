"""Resident k-iterations-per-launch Newton mega-kernel (packed stream).

The packed stream (solvers/packed_stream.py) brought the per-iteration XLA
glue onto dense vreg tiles, but each Newton iteration still costs ~3 Pallas
launches (backward trial, forward trial, predictor transition) plus a
``lax.while_loop`` sync — the dominant fixed cost once the math is
vreg-packed (docs/PERFORMANCE.md roofline: ~16-20% of VPU peak,
overhead-bound).  This kernel keeps EVERYTHING resident for ``k`` Newton
iterations in ONE launch:

* the whole lane state — trajectory ``xs``, controls ``u``/``u_prev``, the
  accept/LM/convergence scalars — lives in VMEM scratch across iterations
  (the (T, rows) arrays are DMA'd in from HBM once per k-block and written
  back once);
* each iteration replays the backward Riccati sweep, the forward trial
  sweep, the accept/Levenberg-Marquardt glue, and the barrier
  stage-transition logic of ``packed_lane_iter`` in-kernel, so the
  per-iteration launch + sync overhead amortizes k-fold;
* the predictor's double-rollout transition — previously an unconditional
  third launch per iteration, though lanes roll stages on <5% of
  iterations — executes under a dynamic ``pl.when(any(roll))`` guard and is
  SKIPPED entirely on iterations where no lane in the chunk advances a
  barrier stage.

Per-lane semantics are those of ``packed_lane_iter``
(solvers/packed_stream.py), which are those of ``flat_lane_iter``
(solvers/ip_newton.py): same trial sequence, same accept/LM updates, same
stage transitions and predictor candidates (pinned by
tests/test_mega_kernel.py).  The reference has no batching at all (one
solve per call, /root/reference/noc/par_interior_point_newton.py:228-254);
this executor is TPU-native surface built for the streaming throughput
path, anchored to the reference benchmark protocol
(/root/reference/examples/cartpole_runtime.py:115-174).

VMEM: the resident set is ~(2*T*nx + 3*T*nu + T*nx + T*ng) rows of
(S, 128) f32 tiles (see :func:`_mega_rows`); at cartpole scale (T=100,
nx=4, nu=1) that is ~8.2 MB at S=8 — so the mega path caps the sublane
depth where the two-launch packed stream could run S=16/32 with more
chunks per launch instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ipoc_tpu.ops.pallas.fused_iter_kernel import (
    _pack_consts,
    _stage_bwd_fn,
    _stage_fwd_fn,
    _stage_transition_fn,
    _term_fn,
    _term_fwd_fn,
    _lift,
)
from ipoc_tpu.ops.pallas.seq_newton_kernel import (
    LANES,
    _add_mm_sym,
    _dot,
    _gain_rhs,
    _mm,
    _mv,
    _pivots_only,
    _solve_track,
    _transpose,
)
from ipoc_tpu.problem import OCP


_MEGA_VMEM_BUDGET = int(13.6 * 2 ** 20)


# Grid is (C,) — 1-arg index maps (the shared specs in fused_iter_kernel
# assume the (C, Tb) grids of the streaming kernels).
def _bcast1(rows, S):
    return pl.BlockSpec((1, rows, S, LANES), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _scal1(S):
    return pl.BlockSpec((1, 1, S, LANES), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _const1(rows, S):
    return pl.BlockSpec((1, rows, S, LANES), lambda b: (0, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _mega_rows(T: int, nx: int, nu: int) -> int:
    """Rows of (S, LANES) tiles resident in VMEM scratch: xs, u, u_prev,
    tx, tu, Kk plus the small carries/scalars.  The stage-transition
    phase's candidate-b trajectory and predicted controls are parked in
    the (then-dead) Kk gains ring — ``ng = (1+nx)*nu >= nx + nu`` always —
    so they cost no extra rows."""
    ng = (1 + nx) * nu
    return T * (2 * nx + 2 * nu + nu + ng) + 4 * nx + nx * nx + 16


def mega_fits(T: int, nx: int, nu: int, S: int, dtype) -> bool:
    return (_mega_rows(T, nx, nu) * S * LANES * jnp.dtype(dtype).itemsize
            <= _MEGA_VMEM_BUDGET)


def mega_supported(T: int, nx: int, nu: int, dtype) -> bool:
    """The mega executor can run this problem shape: either the RESIDENT
    kernel's full-horizon set fits VMEM at S=8, or the STREAMED kernel
    has a usable time window (kill switch IPOC_MEGA_STREAM=0 confines
    the mega path to resident-fitting horizons)."""
    import os

    if mega_fits(T, nx, nu, 8, dtype):
        return True
    if os.environ.get("IPOC_MEGA_STREAM", "1") != "1":
        return False
    return stream_window(T, nx, nu, 8, dtype) is not None


def mega_dispatch_ok(cfg, T: int, nx: int, nu: int, dtype) -> bool:
    """ONE mega-path dispatch rule shared by the executor
    (solve_stream_packed's ``use_mega``), the stream gate
    (packed_stream_eligible's DDP arm) and the batch-resolver gate
    (batch_packed_eligible), so the three cannot drift: the kill
    switches (IPOC_MEGA_KERNEL, and IPOC_MEGA_DDP for the DDP
    evaluator), a mega-capable ``newton_impl``, and
    :func:`mega_supported` at S=8 (the executor's S-cap always lands
    on S=8, so fit-at-8 decides; past the resident cap the streamed
    kernel takes over)."""
    import os

    if os.environ.get("IPOC_MEGA_KERNEL", "1") != "1":
        return False
    if cfg.newton_impl == "ddp":
        if os.environ.get("IPOC_MEGA_DDP", "1") != "1":
            return False
    elif cfg.newton_impl != "fused":
        return False
    return mega_supported(T, nx, nu, dtype)


def _mega_time_block(T: int) -> int:
    """Stages per in-kernel loop iteration.  The mega kernel's time loops
    carry a sequential Riccati/rollout dependence, so deeper unrolling
    buys ILP without any VMEM cost (unlike the grid kernels' windowed
    blocks): measured on the v5e drain at B=2048/T=100, tb 5/10/20 ->
    88.5/87.8/87.1 us/step (25/50 probed: flat/negative — see
    docs/PERFORMANCE.md lever-closure note).  Env override
    IPOC_TIME_BLOCK (validated by the shared parser)."""
    from ipoc_tpu.ops.pallas.fused_iter_kernel import forced_time_block

    tb = forced_time_block(T, "the mega kernel")
    if tb is not None:
        return tb
    for tb in (20, 16, 10, 8, 5, 4, 2):
        if T % tb == 0:
            return tb
    return 1


def _stream_rows_per_stage(nx: int, nu: int) -> int:
    """VMEM window rows per stage for the STREAMED mega kernel: 3 slots x
    (xs + u + u_prev + trial-x + trial-u + gains) buffers."""
    ng = (1 + nx) * nu
    return 3 * (2 * nx + 3 * nu + ng)


def stream_window(T: int, nx: int, nu: int, S: int, dtype) -> int | None:
    """Largest time-window size W for the streamed mega kernel: a divisor
    of ``T`` in ``[8, wmax]`` where ``wmax`` fits the 3-slot window
    buffers (plus the resident scalars) in the VMEM budget.  ``None``
    means the streamed path cannot run this problem (no usable divisor —
    e.g. a prime horizon)."""
    import os

    itemsize = jnp.dtype(dtype).itemsize
    row = S * LANES * itemsize
    scal = (4 * nx + nx * nx + 32) * row
    per_stage = _stream_rows_per_stage(nx, nu) * row
    wmax = (_MEGA_VMEM_BUDGET - scal) // per_stage
    forced = os.environ.get("IPOC_STREAM_WINDOW", "")
    if forced:
        try:
            W = int(forced)
        except ValueError:
            W = -1
        if 2 <= W <= min(T, wmax) and T % W == 0:
            return W
        import sys

        print(
            f"ipoc_tpu: IPOC_STREAM_WINDOW={forced!r} rejected (must be an "
            f"integer in [2, {min(T, wmax)}] dividing T={T}); using the "
            "default pick",
            file=sys.stderr,
        )
    best = None
    for W in range(8, min(T, wmax) + 1):
        if T % W == 0:
            best = W
    return best


def _stream_time_block(W: int) -> int:
    """Stages per unrolled block inside a streamed window (same ILP lever
    as the resident kernel's ``_mega_time_block``, applied to W)."""
    from ipoc_tpu.ops.pallas.fused_iter_kernel import forced_time_block

    tb = forced_time_block(W, "the streamed mega kernel")
    if tb is not None and W % tb == 0:
        return tb
    for tb in (20, 16, 10, 8, 5, 4, 2):
        if W % tb == 0:
            return tb
    return 1


# Semaphore rows for the streamed kernel's DMA streams (x 3 slots each).
_IN_XS, _IN_U, _IN_UP, _IN_TX, _IN_TU, _IN_KK = range(6)
_OUT_XS, _OUT_U, _OUT_UP, _OUT_TX, _OUT_TU, _OUT_KK = range(6, 12)


def _mega_streamed_kernel(*refs, nx, nu, T, W, k, cfg, stage_b, term_b,
                          stage_f, term_f, stage_tr, term_tr, n_counts,
                          tb=1, ddp=False):
    """Streamed mega kernel: k resident Newton iterations per launch with
    the (T, rows) lane state STREAMED through VMEM in W-stage windows
    (3-slot double-buffered ``make_async_copy`` DMA) instead of held
    resident — lifting the resident kernel's T-cap (VERDICT r4 #1) to the
    reference protocol's H=400-1000 sweep rows
    (/root/reference/examples/cartpole_runtime.py:85-86).

    Semantics are IDENTICAL to ``_mega_kernel`` / ``packed_lane_iter``
    (pinned by tests/test_mega_kernel.py at T past the resident cap).
    Differences are purely in data movement:

    * xs/u/u_prev persist in HBM (the pallas_call aliases them
      input->output, so in-place window writes ARE the update); the trial
      arrays (tx, tu) and the gains ring (Kk) live in HBM scratch outputs;
    * the accept merge is LAZY: the accept bit is per-lane VMEM state and
      the merge select (trial vs iterate) happens while the NEXT backward
      sweep streams the windows in anyway, which also writes the merged
      windows back — no dedicated merge pass on the hot path;
    * the barrier stage transition (<5% of iterations, dynamically
      skipped otherwise) runs three extra streamed passes: eager merge +
      candidate double-rollout, then the take/roll select;
    * a final merge pass at k-block exit flushes any pending accept so
      the HBM state is fully merged across launches.

    Per-iteration HBM traffic is ~35 rows/stage (backward: in xs,u[,tx,tu]
    out xs,u,Kk; forward: in xs,u,Kk out tx,tu) vs ~40 for the two-launch
    path's kernels + XLA accept-merge glue — so the streamed kernel wins
    on both traffic and the k-fold launch/sync amortization.
    """
    (n_cs_b, n_ct_b, n_cs_f, n_ct_f, n_cs_t, n_ct_t) = n_counts
    (act_ref, x0_ref, xT_ref, cun_ref, it_ref, sit_ref, rp_ref, ri_ref,
     bp_ref, bp0_ref, done_ref, _xs_in, _u_in, _up_in) = refs[:14]
    i = 14
    cs_b = [r[0] for r in refs[i:i + n_cs_b]]; i += n_cs_b  # noqa: E702
    ct_b = [r[0] for r in refs[i:i + n_ct_b]]; i += n_ct_b  # noqa: E702
    cs_f = [r[0] for r in refs[i:i + n_cs_f]]; i += n_cs_f  # noqa: E702
    ct_f = [r[0] for r in refs[i:i + n_ct_f]]; i += n_ct_f  # noqa: E702
    cs_t = [r[0] for r in refs[i:i + n_cs_t]]; i += n_cs_t  # noqa: E702
    ct_t = [r[0] for r in refs[i:i + n_ct_t]]; i += n_ct_t  # noqa: E702
    (xT_o, cun_o, it_o, sit_o, rp_o, ri_o, bp_o, done_o,
     xs_h, u_h, up_h, steps_o, tx_h, tu_h, Kk_h) = refs[i:i + 15]
    (xs_w, u_w, up_w, tx_w, tu_w, Kk_w, xT_v,
     cun_s, rp_s, ri_s, bp_s, done_s, it_s, sit_s, acc_s, steps_s,
     sems) = refs[i + 15:]

    c = pl.program_id(0)
    dtype = xs_w.dtype
    NW = T // W
    Wb = W // tb

    # --- load per-lane scalars --------------------------------------------
    xT_v[:] = xT_ref[0]
    cun_s[:] = cun_ref[0]
    rp_s[:] = rp_ref[0]
    ri_s[:] = ri_ref[0]
    bp_s[:] = bp_ref[0]
    done_s[:] = done_ref[0]
    it_s[:] = it_ref[0]
    sit_s[:] = sit_ref[0]
    acc_s[:] = jnp.zeros_like(acc_s)
    steps_s[0] = 0
    act = act_ref[0] > 0          # (1, S, L)
    x0 = x0_ref[0]                # (nx, S, L)
    bp0 = bp0_ref[0]              # (1, S, L)

    stage_reg = jnp.asarray(
        cfg.reg_init if cfg.reg_stage_init is None else cfg.reg_stage_init,
        dtype)
    gamma = jnp.asarray(1.0 / cfg.bp_decay, dtype)

    # --- windowed-pass machinery ------------------------------------------
    # A stream is (hbm_ref, vmem_buf, sem_row, row_slice|None, gate|None);
    # gate is a traced bool — the copy (start AND wait) only runs when it
    # holds, so e.g. the trial streams are skipped when no accept pends.
    def _cp(st, w, slot, out):
        href, vref, row, rsl, _gate = st
        if rsl is None:
            hside = href.at[c, pl.ds(w * W, W)]
            vside = vref.at[pl.ds(slot * W, W)]
        else:
            r0, rn = rsl
            hside = href.at[c, pl.ds(w * W, W), pl.ds(r0, rn)]
            vside = vref.at[pl.ds(slot * W, W), pl.ds(r0, rn)]
        src, dst = (vside, hside) if out else (hside, vside)
        return pltpu.make_async_copy(src, dst, sems.at[row, slot])

    def _gated(st, w, slot, out, wait):
        cp = _cp(st, w, slot, out)
        fn = cp.wait if wait else cp.start
        if st[4] is None:
            fn()
        else:
            pl.when(st[4])(fn)

    def run_pass(reverse, ins, outs, window_compute, carry_init):
        """Walk the NW windows (newest-to-oldest when ``reverse``) with
        3-slot double buffering: in body(w) the NEXT window's in-DMAs
        start as soon as the out-DMAs two windows back (same slot) have
        drained, so both directions overlap the current window's compute."""

        def in_start(w):
            slot = w % 3
            for st in ins:
                _gated(st, w, slot, False, False)

        def in_wait(w):
            slot = w % 3
            for st in ins:
                _gated(st, w, slot, False, True)

        def out_start(w):
            slot = w % 3
            for st in outs:
                _gated(st, w, slot, True, False)

        def out_wait(w):
            slot = w % 3
            for st in outs:
                _gated(st, w, slot, True, True)

        first = NW - 1 if reverse else 0
        in_start(first)

        def body(i2, carry):
            w = (NW - 1 - i2) if reverse else i2
            slot = w % 3
            nxt = w - 1 if reverse else w + 1
            freed = w + 2 if reverse else w - 2  # out that frees nxt's slot
            in_bounds = (nxt >= 0) if reverse else (nxt <= NW - 1)
            freed_bounds = (freed <= NW - 1) if reverse else (freed >= 0)

            @pl.when(in_bounds)
            def _():
                @pl.when(freed_bounds)
                def _():
                    out_wait(freed)

                in_start(nxt)

            in_wait(w)
            carry = window_compute(w, slot, carry)
            out_start(w)
            return carry

        carry = lax.fori_loop(0, NW, body, carry_init)
        for d in range(min(3, NW)):
            wd = d if reverse else NW - 1 - d
            out_wait(wd)
        return carry

    def merge_windows(slot, accm):
        """Apply the pending accept select to one VMEM window in place."""
        sl = pl.ds(slot * W, W)
        m4 = accm[None]  # (1, 1, S, L)
        xs_w[sl] = jnp.where(m4, tx_w[sl], xs_w[sl])
        u_w[sl] = jnp.where(m4, tu_w[sl], u_w[sl])

    def iteration(_i, _carry):
        adv = jnp.logical_and(act, done_s[:] == 0)   # (1, S, L)

        @pl.when(jnp.any(adv))
        def _():
            steps_s[0] = steps_s[0] + 1
            bp = bp_s[0]                              # (S, L)
            if ddp or cfg.scale_reg_by_grad:
                reg = rp_s[0] * jnp.maximum(
                    cun_s[0], jnp.asarray(cfg.reg_scale_floor, dtype))
            else:
                reg = rp_s[0]
            any_acc = jnp.any(acc_s[:] > 0)
            accm = acc_s[:] > 0                       # (1, S, L)

            # --- backward sweep: lazy accept merge + Riccati --------------
            lamT, VT, cT = term_b(xT_v[:], *ct_b)

            def bwd_step(off, carry):
                Vxx, Vx, lam, dv, piv, cost, hu = carry
                x = xs_w[pl.ds(off, 1)][0]
                u = u_w[pl.ds(off, 1)][0]
                contraction = Vx if ddp else lam
                ru, Q, R, M, fx, fu, lam_new, cst = stage_b(
                    x, u, bp, contraction, *cs_b)
                R = jnp.stack(
                    [R[r] + reg if r % (nu + 1) == 0 else R[r]
                     for r in range(nu * nu)],
                    axis=0,
                )
                fxT = _transpose(fx, nx, nx)
                fuT = _transpose(fu, nx, nu)
                Vfx = _mm(Vxx, fx, nx, nx, nx)
                Vfu = _mm(Vxx, fu, nx, nx, nu)
                Qxx = _add_mm_sym(Q, fxT, Vfx, nx, nx)
                Quu = _add_mm_sym(R, fuT, Vfu, nu, nx)
                Qxu = M + _mm(fxT, Vfu, nx, nx, nu)
                if ddp:
                    Qu = ru
                    Qx = lam_new
                else:
                    Qu = ru + _mv(fuT, Vx, nu, nx)
                    Qx = _mv(fxT, Vx, nx, nx)
                rhs = _gain_rhs(Qu, _transpose(Qxu, nx, nu), nx, nu)
                sol, piv_t = _solve_track(Quu, rhs, nu, 1 + nx)
                kg = -jnp.stack([sol[i_ * (1 + nx)] for i_ in range(nu)],
                                axis=0)
                Kg = -jnp.stack(
                    [sol[i_ * (1 + nx) + 1 + j]
                     for i_ in range(nu) for j in range(nx)],
                    axis=0,
                )
                if not ddp:
                    piv_t = jnp.minimum(piv_t, _pivots_only(R, nu))
                Kk_w[pl.ds(off, 1)] = jnp.concatenate([kg, Kg], axis=0)[None]
                Vx_n = Qx + _mv(Qxu, kg, nx, nu)
                Vxx_n = _add_mm_sym(Qxx, Qxu, Kg, nx, nu)
                if ddp:
                    dv_n = dv + 0.5 * _dot(kg, Qu, nu)
                else:
                    dv_n = dv + (
                        _dot(kg, Qu, nu)
                        + 0.5 * _dot(kg, _mv(Quu, kg, nu, nu), nu)
                    )
                return (Vxx_n, Vx_n, lam_new, dv_n,
                        jnp.minimum(piv, piv_t), cost + cst,
                        jnp.maximum(hu, jnp.max(jnp.abs(ru), axis=0)))

            def bwd_window(w, slot, carry):
                @pl.when(any_acc)
                def _():
                    merge_windows(slot, accm)

                def bwd_block(bi, c2):
                    base = slot * W + (Wb - 1 - bi) * tb
                    for j in reversed(range(tb)):
                        c2 = bwd_step(base + j, c2)
                    return c2

                return lax.fori_loop(0, Wb, bwd_block, carry)

            # The trial/merge streams are GATED on a pending accept:
            # measured on-chip (r5, T=400/S=16) the ungated variant is
            # ~10 us/iter SLOWER — the saved bandwidth on no-accept
            # iterations outweighs the dynamic-branch cost of pl.when
            # around the DMA start/wait pairs (DMA overlap runs
            # near-margin: ~139 us/iter of traffic under ~296 us compute).
            bwd_ins = [
                (xs_h, xs_w, _IN_XS, None, None),
                (u_h, u_w, _IN_U, None, None),
                (tx_h, tx_w, _IN_TX, None, any_acc),
                (tu_h, tu_w, _IN_TU, None, any_acc),
            ]
            bwd_outs = [
                (xs_h, xs_w, _OUT_XS, None, any_acc),
                (u_h, u_w, _OUT_U, None, any_acc),
                (Kk_h, Kk_w, _OUT_KK, None, None),
            ]
            init = (
                VT,
                lamT if ddp else jnp.zeros((nx,) + VT.shape[1:], dtype),
                lamT,
                jnp.zeros(VT.shape[1:], dtype),
                jnp.full(VT.shape[1:], jnp.inf, dtype),
                cT,
                jnp.zeros(VT.shape[1:], dtype),
            )
            (_, _, _, dv, piv, cost, hu) = run_pass(
                True, bwd_ins, bwd_outs, bwd_window, init)
            # HBM xs/u are now fully merged (or were already current).
            acc_s[:] = jnp.zeros_like(acc_s)

            # --- forward trial sweep --------------------------------------
            def fwd_step(off, carry):
                dx, nc, mc, cun_new = carry
                x = xs_w[pl.ds(off, 1)][0]
                u = u_w[pl.ds(off, 1)][0]
                Kk = Kk_w[pl.ds(off, 1)][0]
                tu, tx, dxn, cst, cmax, cusq = stage_f(
                    x, u, bp, dx, Kk, *cs_f)
                tu_w[pl.ds(off, 1)] = tu[None]
                tx_w[pl.ds(off, 1)] = tx[None]
                return dxn, nc + cst, jnp.maximum(mc, cmax), cun_new + cusq

            def fwd_window(w, slot, carry):
                def fwd_block(bi, c2):
                    base = slot * W + bi * tb
                    for j in range(tb):
                        c2 = fwd_step(base + j, c2)
                    return c2

                return lax.fori_loop(0, Wb, fwd_block, carry)

            fwd_ins = [
                (xs_h, xs_w, _IN_XS, None, None),
                (u_h, u_w, _IN_U, None, None),
                (Kk_h, Kk_w, _IN_KK, None, None),
            ]
            fwd_outs = [
                (tx_h, tx_w, _OUT_TX, None, None),
                (tu_h, tu_w, _OUT_TU, None, None),
            ]
            finit = (
                x0 if ddp else jnp.zeros((nx,) + cT.shape, dtype),
                jnp.zeros(cT.shape, dtype),
                jnp.full(cT.shape, -jnp.inf, dtype),
                jnp.zeros(cT.shape, dtype),
            )
            dxT, nc, mc, cun_new = run_pass(
                False, fwd_ins, fwd_outs, fwd_window, finit)
            txT, cTn = term_f(xT_v[:], dxT, *ct_f)
            nc = nc + cTn

            # --- accept / LM glue (== packed_lane_iter) ------------------
            ok = jnp.isfinite(piv) & (piv > 0) & jnp.isfinite(dv)
            new_cost = jnp.where(mc <= 0.0, nc, jnp.asarray(jnp.inf, dtype))
            rho = (new_cost - cost) / dv
            accept = jnp.logical_and(rho > 0.0, ok)[None]     # (1, S, L)
            stalled = jnp.logical_and(
                jnp.logical_not(accept), rp_s[:] >= cfg.reg_max
            ) & bool(cfg.stall_exit)
            rp_new = jnp.where(
                accept,
                rp_s[:] * jnp.maximum(
                    1.0 / 3.0, 1.0 - (2.0 * rho[None] - 1.0) ** 3),
                rp_s[:] * ri_s[:],
            )
            ri_new = jnp.where(accept, 2.0, 2.0 * ri_s[:]).astype(dtype)
            rp_new = jnp.clip(rp_new, cfg.reg_min, cfg.reg_max).astype(dtype)
            rp_s[:] = jnp.where(adv, rp_new, rp_s[:])
            ri_s[:] = jnp.where(adv, ri_new, ri_s[:])
            accept = jnp.logical_and(accept, adv)

            # LAZY merge: record the accept; the trajectory select happens
            # in the next backward sweep (or the epilogue/transition merge).
            acc_s[:] = accept.astype(jnp.int32)
            xT_v[:] = jnp.where(accept[0][None], txT, xT_v[:])
            cun_s[:] = jnp.where(
                accept, jnp.sqrt(cun_new)[None].astype(dtype), cun_s[:])

            # --- convergence / stage bookkeeping -------------------------
            tol_s = jnp.maximum(jnp.asarray(cfg.tol, dtype),
                                cfg.stage_tol_scale * bp_s[:])
            conv = hu[None] < tol_s
            if cfg.pred_floor > 0.0:
                conv = jnp.logical_or(
                    conv,
                    jnp.logical_and(
                        ok, jnp.abs(dv) < cfg.pred_floor * (1.0 + jnp.abs(cost))
                    )[None],
                )
            bad = jnp.logical_or(
                jnp.logical_not(jnp.isfinite(hu)),
                jnp.logical_not(jnp.isfinite(cost)),
            )[None]
            bad = jnp.logical_and(bad, adv)
            advance = jnp.logical_or(
                jnp.logical_or(conv, stalled),
                sit_s[:] + 1 > cfg.max_newton_iters,
            )
            advance = jnp.logical_and(advance, jnp.logical_not(bad))
            advance = jnp.logical_and(advance, adv)
            bp_next = bp_s[:] / cfg.bp_decay
            done_now = jnp.logical_or(
                bad, jnp.logical_and(advance, bp_next <= cfg.bp_min)
            )
            roll = jnp.logical_and(advance, jnp.logical_not(done_now))

            # --- barrier stage transition (streamed, rare) ---------------
            @pl.when(jnp.any(roll))
            def _():
                bpn = bp_next[0]                              # (S, L)
                acc2 = acc_s[:] > 0
                any_acc2 = jnp.any(acc2)

                # MT pass: eager accept merge + candidate double-rollout.
                # Candidates stash through the (dead) VMEM bufs into HBM:
                # xa -> tx, u_pred -> tu, xb -> Kk rows [0, nx).
                def mt_step(off, carry):
                    xa, xb, ca, cb, cua, cub = carry
                    u_t = u_w[pl.ds(off, 1)][0]
                    if cfg.stage_predictor:
                        up_t = u_t + gamma * (u_t - up_w[pl.ds(off, 1)][0])
                    else:
                        up_t = u_t
                    tx_w[pl.ds(off, 1)] = xa[None]
                    tu_w[pl.ds(off, 1)] = up_t[None]
                    Kk_w[pl.ds(off, 1), pl.ds(0, nx)] = xb[None]
                    xan, xbn, csta, cstb, cua_i, cub_i = stage_tr(
                        xa, xb, u_t, up_t, bpn, *cs_t)
                    return (xan, xbn, ca + csta, cb + cstb,
                            cua + cua_i, cub + cub_i)

                def mt_window(w, slot, carry):
                    @pl.when(any_acc2)
                    def _():
                        merge_windows(slot, acc2)

                    def mt_block(bi, c2):
                        base = slot * W + bi * tb
                        for j in range(tb):
                            c2 = mt_step(base + j, c2)
                        return c2

                    return lax.fori_loop(0, Wb, mt_block, carry)

                mt_ins = [
                    (xs_h, xs_w, _IN_XS, None, any_acc2),
                    (u_h, u_w, _IN_U, None, None),
                    (tx_h, tx_w, _IN_TX, None, any_acc2),
                    (tu_h, tu_w, _IN_TU, None, any_acc2),
                    (up_h, up_w, _IN_UP, None, None),
                ]
                mt_outs = [
                    (xs_h, xs_w, _OUT_XS, None, any_acc2),
                    (u_h, u_w, _OUT_U, None, None),
                    (tx_h, tx_w, _OUT_TX, None, None),
                    (tu_h, tu_w, _OUT_TU, None, None),
                    (Kk_h, Kk_w, _OUT_KK, (0, nx), None),
                ]
                tinit = (x0, x0,
                         jnp.zeros(cT.shape, dtype),
                         jnp.zeros(cT.shape, dtype),
                         jnp.zeros(cT.shape, dtype),
                         jnp.zeros(cT.shape, dtype))
                xaT, xbT, ca, cb, cua, cub = run_pass(
                    False, mt_ins, mt_outs, mt_window, tinit)
                acc_s[:] = jnp.zeros_like(acc_s)
                ca = ca + term_tr(xaT, *ct_t)
                cb = cb + term_tr(xbT, *ct_t)
                if cfg.stage_predictor:
                    on_path = bp_s[:] < bp0
                    take = jnp.logical_and(
                        roll, jnp.logical_and(on_path, (cb < ca)[None]))
                else:
                    take = jnp.zeros_like(roll)

                # S pass: per-lane select of the post-transition state.
                def s_window(w, slot, carry):
                    sl = pl.ds(slot * W, W)
                    r4 = roll[None]
                    t4 = take[None]
                    u_cur = u_w[sl]
                    xb_win = Kk_w[sl, pl.ds(0, nx)]
                    up_w[sl] = jnp.where(r4, u_cur, up_w[sl])
                    xs_w[sl] = jnp.where(
                        t4, xb_win, jnp.where(r4, tx_w[sl], xs_w[sl]))
                    u_w[sl] = jnp.where(t4, tu_w[sl], u_cur)
                    return carry

                s_ins = [
                    (xs_h, xs_w, _IN_XS, None, None),
                    (u_h, u_w, _IN_U, None, None),
                    (up_h, up_w, _IN_UP, None, None),
                    (tx_h, tx_w, _IN_TX, None, None),
                    (tu_h, tu_w, _IN_TU, None, None),
                    (Kk_h, Kk_w, _IN_KK, (0, nx), None),
                ]
                s_outs = [
                    (xs_h, xs_w, _OUT_XS, None, None),
                    (u_h, u_w, _OUT_U, None, None),
                    (up_h, up_w, _OUT_UP, None, None),
                ]
                run_pass(False, s_ins, s_outs, s_window, 0)

                xT_v[:] = jnp.where(
                    take[0][None], xbT, jnp.where(roll[0][None], xaT,
                                                  xT_v[:]))
                cun_s[:] = jnp.where(
                    take, jnp.sqrt(cub)[None].astype(dtype),
                    jnp.where(roll, jnp.sqrt(cua)[None].astype(dtype),
                              cun_s[:]))

            bp_s[:] = jnp.where(advance, bp_next, bp_s[:])
            rp_s[:] = jnp.where(advance, stage_reg, rp_s[:])
            ri_s[:] = jnp.where(
                advance, jnp.asarray(cfg.reg_inc_init, dtype), ri_s[:])
            tick = adv.astype(jnp.int32)
            sit_s[:] = jnp.where(advance, jnp.zeros_like(sit_s[:]),
                                 sit_s[:] + tick)
            it_s[:] = it_s[:] + tick
            done_s[:] = jnp.where(done_now, jnp.ones_like(done_s[:]),
                                  done_s[:])

        return _carry

    lax.fori_loop(0, k, iteration, jnp.asarray(0, jnp.int32))

    # --- epilogue: flush any pending lazy accept, write scalars -----------
    acc_fin = acc_s[:] > 0

    @pl.when(jnp.any(acc_fin))
    def _():
        def fin_window(w, slot, carry):
            merge_windows(slot, acc_fin)
            return carry

        fin_ins = [
            (xs_h, xs_w, _IN_XS, None, None),
            (u_h, u_w, _IN_U, None, None),
            (tx_h, tx_w, _IN_TX, None, None),
            (tu_h, tu_w, _IN_TU, None, None),
        ]
        fin_outs = [
            (xs_h, xs_w, _OUT_XS, None, None),
            (u_h, u_w, _OUT_U, None, None),
        ]
        run_pass(False, fin_ins, fin_outs, fin_window, 0)

    xT_o[0] = xT_v[:]
    cun_o[0] = cun_s[:]
    it_o[0] = it_s[:]
    sit_o[0] = sit_s[:]
    rp_o[0] = rp_s[:]
    ri_o[0] = ri_s[:]
    bp_o[0] = bp_s[:]
    done_o[0] = done_s[:]
    steps_o[c, 0] = steps_s[0]


def _mega_kernel(*refs, nx, nu, T, k, cfg, stage_b, term_b, stage_f,
                 term_f, stage_tr, term_tr, n_counts, tb=1, ddp=False):
    """One batch chunk: k resident Newton iterations + stage transitions.

    Ref order: inputs (act, x0, xT, cun, it, stage_it, rp, r_inc, bp, bp0,
    done, xs[ANY], u[ANY], u_prev[ANY], consts...), outputs (xT, cun, it,
    stage_it, rp, r_inc, bp, done, xs[ANY], u[ANY], u_prev[ANY],
    steps[SMEM]), scratch (xs_v, u_v, up_v, tx_s, tu_s, Kk_s, xT_v,
    7 small scalar refs, steps_s, sems).
    """
    (n_cs_b, n_ct_b, n_cs_f, n_ct_f, n_cs_t, n_ct_t) = n_counts
    (act_ref, x0_ref, xT_ref, cun_ref, it_ref, sit_ref, rp_ref, ri_ref,
     bp_ref, bp0_ref, done_ref, xs_hbm, u_hbm, up_hbm) = refs[:14]
    i = 14
    cs_b = [r[0] for r in refs[i:i + n_cs_b]]; i += n_cs_b  # noqa: E702
    ct_b = [r[0] for r in refs[i:i + n_ct_b]]; i += n_ct_b  # noqa: E702
    cs_f = [r[0] for r in refs[i:i + n_cs_f]]; i += n_cs_f  # noqa: E702
    ct_f = [r[0] for r in refs[i:i + n_ct_f]]; i += n_ct_f  # noqa: E702
    cs_t = [r[0] for r in refs[i:i + n_cs_t]]; i += n_cs_t  # noqa: E702
    ct_t = [r[0] for r in refs[i:i + n_ct_t]]; i += n_ct_t  # noqa: E702
    (xT_o, cun_o, it_o, sit_o, rp_o, ri_o, bp_o, done_o,
     xs_out, u_out, up_out, steps_o) = refs[i:i + 12]
    (xs_v, u_v, up_v, tx_s, tu_s, Kk_s, xT_v,
     cun_s, rp_s, ri_s, bp_s, done_s, it_s, sit_s, steps_s,
     sems) = refs[i + 12:]

    c = pl.program_id(0)
    dtype = xs_v.dtype
    ng = (1 + nx) * nu

    # --- stage the k-block's lane state into VMEM ---------------------------
    d0 = pltpu.make_async_copy(xs_hbm.at[c], xs_v, sems.at[0])
    d1 = pltpu.make_async_copy(u_hbm.at[c], u_v, sems.at[1])
    d2 = pltpu.make_async_copy(up_hbm.at[c], up_v, sems.at[2])
    d0.start(); d1.start(); d2.start()  # noqa: E702
    xT_v[:] = xT_ref[0]
    cun_s[:] = cun_ref[0]
    rp_s[:] = rp_ref[0]
    ri_s[:] = ri_ref[0]
    bp_s[:] = bp_ref[0]
    done_s[:] = done_ref[0]
    it_s[:] = it_ref[0]
    sit_s[:] = sit_ref[0]
    steps_s[0] = 0
    act = act_ref[0] > 0          # (1, S, L)
    x0 = x0_ref[0]                # (nx, S, L)
    bp0 = bp0_ref[0]              # (1, S, L)
    d0.wait(); d1.wait(); d2.wait()  # noqa: E702

    stage_reg = jnp.asarray(
        cfg.reg_init if cfg.reg_stage_init is None else cfg.reg_stage_init,
        dtype)
    gamma = jnp.asarray(1.0 / cfg.bp_decay, dtype)

    def iteration(_i, _carry):
        adv = jnp.logical_and(act, done_s[:] == 0)   # (1, S, L)

        @pl.when(jnp.any(adv))
        def _():
            steps_s[0] = steps_s[0] + 1
            bp = bp_s[0]                              # (S, L)
            if ddp or cfg.scale_reg_by_grad:
                reg = rp_s[0] * jnp.maximum(
                    cun_s[0], jnp.asarray(cfg.reg_scale_floor, dtype))
            else:
                reg = rp_s[0]

            # --- backward Riccati sweep (same math/order as
            # _fused_bwd_kernel, time via dynamic VMEM slices) -------------
            lamT, VT, cT = term_b(xT_v[:], *ct_b)

            Tb = T // tb

            def bwd_block(tr, carry):
                # tb stages per loop iteration (static offsets off a
                # dynamic base — the same time-blocking lever as the
                # two-launch kernels' fat grid steps).
                base = (Tb - 1 - tr) * tb
                for j in reversed(range(tb)):
                    carry = bwd_step(base + j, carry)
                return carry

            def bwd_step(t, carry):
                # ddp=True switches to IP-DDP semantics (mirrors the
                # merged kernel, fused_iter_kernel.py:915-998): the stage
                # data contracts with the VALUE GRADIENT Vx (so Qu = Hu,
                # Qx = Hx directly), dV = 1/2 k'Qu, no costate carry.
                Vxx, Vx, lam, dv, piv, cost, hu = carry
                x = xs_v[pl.ds(t, 1)][0]
                u = u_v[pl.ds(t, 1)][0]
                contraction = Vx if ddp else lam
                ru, Q, R, M, fx, fu, lam_new, cst = stage_b(
                    x, u, bp, contraction, *cs_b)
                R = jnp.stack(
                    [R[r] + reg if r % (nu + 1) == 0 else R[r]
                     for r in range(nu * nu)],
                    axis=0,
                )
                fxT = _transpose(fx, nx, nx)
                fuT = _transpose(fu, nx, nu)
                Vfx = _mm(Vxx, fx, nx, nx, nx)
                Vfu = _mm(Vxx, fu, nx, nx, nu)
                Qxx = _add_mm_sym(Q, fxT, Vfx, nx, nx)
                Quu = _add_mm_sym(R, fuT, Vfu, nu, nx)
                Qxu = M + _mm(fxT, Vfu, nx, nx, nu)
                if ddp:
                    Qu = ru
                    Qx = lam_new
                else:
                    Qu = ru + _mv(fuT, Vx, nu, nx)
                    Qx = _mv(fxT, Vx, nx, nx)
                rhs = _gain_rhs(Qu, _transpose(Qxu, nx, nu), nx, nu)
                sol, piv_t = _solve_track(Quu, rhs, nu, 1 + nx)
                kg = -jnp.stack([sol[i_ * (1 + nx)] for i_ in range(nu)],
                                axis=0)
                Kg = -jnp.stack(
                    [sol[i_ * (1 + nx) + 1 + j]
                     for i_ in range(nu) for j in range(nx)],
                    axis=0,
                )
                if not ddp:
                    piv_t = jnp.minimum(piv_t, _pivots_only(R, nu))
                Kk_s[pl.ds(t, 1)] = jnp.concatenate([kg, Kg], axis=0)[None]
                Vx_n = Qx + _mv(Qxu, kg, nx, nu)
                Vxx_n = _add_mm_sym(Qxx, Qxu, Kg, nx, nu)
                if ddp:
                    dv_n = dv + 0.5 * _dot(kg, Qu, nu)
                else:
                    dv_n = dv + (
                        _dot(kg, Qu, nu)
                        + 0.5 * _dot(kg, _mv(Quu, kg, nu, nu), nu)
                    )
                return (Vxx_n, Vx_n, lam_new, dv_n,
                        jnp.minimum(piv, piv_t), cost + cst,
                        jnp.maximum(hu, jnp.max(jnp.abs(ru), axis=0)))

            init = (
                VT,
                lamT if ddp else jnp.zeros((nx,) + VT.shape[1:], dtype),
                lamT,
                jnp.zeros(VT.shape[1:], dtype),
                jnp.full(VT.shape[1:], jnp.inf, dtype),
                cT,
                jnp.zeros(VT.shape[1:], dtype),
            )
            (_, _, _, dv, piv, cost, hu) = lax.fori_loop(
                0, Tb, bwd_block, init)

            # --- forward trial sweep (== _fused_fwd_kernel; ddp=True is
            # the NONLINEAR closed-loop re-rollout, carry = trial state
            # starting at x0, _stage_ddp_fwd_fn semantics) ----------------
            def fwd_step(t, carry):
                dx, nc, mc, cun_new = carry
                x = xs_v[pl.ds(t, 1)][0]
                u = u_v[pl.ds(t, 1)][0]
                Kk = Kk_s[pl.ds(t, 1)][0]
                tu, tx, dxn, cst, cmax, cusq = stage_f(
                    x, u, bp, dx, Kk, *cs_f)
                tu_s[pl.ds(t, 1)] = tu[None]
                tx_s[pl.ds(t, 1)] = tx[None]
                return dxn, nc + cst, jnp.maximum(mc, cmax), cun_new + cusq

            def fwd_block(tr, carry):
                base = tr * tb
                for j in range(tb):
                    carry = fwd_step(base + j, carry)
                return carry

            finit = (
                x0 if ddp else jnp.zeros((nx,) + cT.shape, dtype),
                jnp.zeros(cT.shape, dtype),
                jnp.full(cT.shape, -jnp.inf, dtype),
                jnp.zeros(cT.shape, dtype),
            )
            dxT, nc, mc, cun_new = lax.fori_loop(0, Tb, fwd_block, finit)
            txT, cTn = term_f(xT_v[:], dxT, *ct_f)
            nc = nc + cTn

            # --- accept / LM glue (== packed_lane_iter) ------------------
            ok = jnp.isfinite(piv) & (piv > 0) & jnp.isfinite(dv)
            new_cost = jnp.where(mc <= 0.0, nc, jnp.asarray(jnp.inf, dtype))
            rho = (new_cost - cost) / dv
            accept = jnp.logical_and(rho > 0.0, ok)[None]     # (1, S, L)
            stalled = jnp.logical_and(
                jnp.logical_not(accept), rp_s[:] >= cfg.reg_max
            ) & bool(cfg.stall_exit)
            # Marquardt-Nielsen update (solvers/globalization.py lm_update)
            rp_new = jnp.where(
                accept,
                rp_s[:] * jnp.maximum(
                    1.0 / 3.0, 1.0 - (2.0 * rho[None] - 1.0) ** 3),
                rp_s[:] * ri_s[:],
            )
            ri_new = jnp.where(accept, 2.0, 2.0 * ri_s[:]).astype(dtype)
            rp_new = jnp.clip(rp_new, cfg.reg_min, cfg.reg_max).astype(dtype)
            rp_s[:] = jnp.where(adv, rp_new, rp_s[:])
            ri_s[:] = jnp.where(adv, ri_new, ri_s[:])
            accept = jnp.logical_and(accept, adv)

            am = accept[0][None, None]                        # (1,1,S,L)
            xs_v[:] = jnp.where(am, tx_s[:], xs_v[:])
            u_v[:] = jnp.where(am, tu_s[:], u_v[:])
            xT_v[:] = jnp.where(accept[0][None], txT, xT_v[:])
            cun_s[:] = jnp.where(
                accept, jnp.sqrt(cun_new)[None].astype(dtype), cun_s[:])

            # --- convergence / stage bookkeeping -------------------------
            tol_s = jnp.maximum(jnp.asarray(cfg.tol, dtype),
                                cfg.stage_tol_scale * bp_s[:])
            conv = hu[None] < tol_s
            if cfg.pred_floor > 0.0:
                conv = jnp.logical_or(
                    conv,
                    jnp.logical_and(
                        ok, jnp.abs(dv) < cfg.pred_floor * (1.0 + jnp.abs(cost))
                    )[None],
                )
            bad = jnp.logical_or(
                jnp.logical_not(jnp.isfinite(hu)),
                jnp.logical_not(jnp.isfinite(cost)),
            )[None]
            bad = jnp.logical_and(bad, adv)
            advance = jnp.logical_or(
                jnp.logical_or(conv, stalled),
                sit_s[:] + 1 > cfg.max_newton_iters,
            )
            advance = jnp.logical_and(advance, jnp.logical_not(bad))
            advance = jnp.logical_and(advance, adv)
            bp_next = bp_s[:] / cfg.bp_decay
            done_now = jnp.logical_or(
                bad, jnp.logical_and(advance, bp_next <= cfg.bp_min)
            )
            roll = jnp.logical_and(advance, jnp.logical_not(done_now))

            # --- barrier stage transition: double-rollout predictor,
            # SKIPPED when no lane in the chunk rolls this iteration ------
            @pl.when(jnp.any(roll))
            def _():
                bpn = bp_next[0]                              # (S, L)
                rb = roll[0][None, None]                      # (1,1,S,L)

                def tr_step(t, carry):
                    # candidate-a states stash in tx_s; candidate-b states
                    # and the predicted controls park in the dead Kk ring
                    # (rows [0:nx] / [nx:nx+nu]) — no extra VMEM.
                    xa, xb, ca, cb, cua, cub = carry
                    u_t = u_v[pl.ds(t, 1)][0]
                    if cfg.stage_predictor:
                        up_t = u_t + gamma * (u_t - up_v[pl.ds(t, 1)][0])
                    else:
                        up_t = u_t
                    Kk_s[pl.ds(t, 1), pl.ds(nx, nu)] = up_t[None]
                    tx_s[pl.ds(t, 1)] = xa[None]
                    Kk_s[pl.ds(t, 1), pl.ds(0, nx)] = xb[None]
                    xan, xbn, csta, cstb, cua_i, cub_i = stage_tr(
                        xa, xb, u_t, up_t, bpn, *cs_t)
                    return (xan, xbn, ca + csta, cb + cstb,
                            cua + cua_i, cub + cub_i)

                def tr_block(trb, carry):
                    base = trb * tb
                    for j in range(tb):
                        carry = tr_step(base + j, carry)
                    return carry

                tinit = (x0, x0,
                         jnp.zeros(cT.shape, dtype),
                         jnp.zeros(cT.shape, dtype),
                         jnp.zeros(cT.shape, dtype),
                         jnp.zeros(cT.shape, dtype))
                xaT, xbT, ca, cb, cua, cub = lax.fori_loop(
                    0, Tb, tr_block, tinit)
                ca = ca + term_tr(xaT, *ct_t)
                cb = cb + term_tr(xbT, *ct_t)
                if cfg.stage_predictor:
                    on_path = bp_s[:] < bp0
                    take = jnp.logical_and(
                        roll, jnp.logical_and(on_path, (cb < ca)[None]))
                else:
                    take = jnp.zeros_like(roll)
                tb4 = take[0][None, None]
                up_v[:] = jnp.where(rb, u_v[:], up_v[:])
                xs_v[:] = jnp.where(
                    tb4, Kk_s[:, 0:nx], jnp.where(rb, tx_s[:], xs_v[:]))
                u_v[:] = jnp.where(tb4, Kk_s[:, nx:nx + nu], u_v[:])
                xT_v[:] = jnp.where(
                    take[0][None], xbT, jnp.where(roll[0][None], xaT,
                                                  xT_v[:]))
                cun_s[:] = jnp.where(
                    take, jnp.sqrt(cub)[None].astype(dtype),
                    jnp.where(roll, jnp.sqrt(cua)[None].astype(dtype),
                              cun_s[:]))

            bp_s[:] = jnp.where(advance, bp_next, bp_s[:])
            rp_s[:] = jnp.where(advance, stage_reg, rp_s[:])
            ri_s[:] = jnp.where(
                advance, jnp.asarray(cfg.reg_inc_init, dtype), ri_s[:])
            tick = adv.astype(jnp.int32)
            sit_s[:] = jnp.where(advance, jnp.zeros_like(sit_s[:]),
                                 sit_s[:] + tick)
            it_s[:] = it_s[:] + tick
            done_s[:] = jnp.where(done_now, jnp.ones_like(done_s[:]),
                                  done_s[:])

        return _carry

    lax.fori_loop(0, k, iteration, jnp.asarray(0, jnp.int32))

    # --- write back --------------------------------------------------------
    # steps_o is the FULL (C, 1) SMEM array (Mosaic requires scalar output
    # blocks to cover the array); each grid step stores its chunk's count.
    xT_o[0] = xT_v[:]
    cun_o[0] = cun_s[:]
    it_o[0] = it_s[:]
    sit_o[0] = sit_s[:]
    rp_o[0] = rp_s[:]
    ri_o[0] = ri_s[:]
    bp_o[0] = bp_s[:]
    done_o[0] = done_s[:]
    steps_o[c, 0] = steps_s[0]
    e0 = pltpu.make_async_copy(xs_v, xs_out.at[c], sems.at[0])
    e1 = pltpu.make_async_copy(u_v, u_out.at[c], sems.at[1])
    e2 = pltpu.make_async_copy(up_v, up_out.at[c], sems.at[2])
    e0.start(); e1.start(); e2.start()  # noqa: E702
    e0.wait(); e1.wait(); e2.wait()  # noqa: E702


def mega_k_iterations(ocp: OCP, xs_p, xT_p, u_p, up_p, cun_p, it_p, sit_p,
                      rp_p, ri_p, bp_p, bp0_p, done_p, x0_p, active_p,
                      cfg, k: int, interpret: bool = False,
                      ddp: bool = False):
    """Run ``k`` resident packed Newton iterations in ONE Pallas launch.

    All arrays are in the packed stream layout (solvers/packed_stream.py
    ``PackedLane``): stage arrays (C, T, rows, S, LANES), per-lane scalars
    (C, S, LANES) — scalars are lifted to (C, 1, S, LANES) blocks
    internally.  ``done_p``/``active_p`` are bool.  Returns the updated
    state tuple ``(xs, xT, u, u_prev, cun, it, stage_it, rp, r_inc, bp,
    done, steps)`` where ``steps`` is the number of iterations actually
    executed (max over chunks == the stream's inner while-loop count).
    """
    C, T, nx, S, L = xs_p.shape
    assert L == LANES
    nu = u_p.shape[2]
    dtype = u_p.dtype
    ng = (1 + nx) * nu

    sds = lambda shape: jax.ShapeDtypeStruct(shape, dtype)  # noqa: E731
    stage_b, cs_b = _lift(
        _stage_bwd_fn(ocp, nx, nu), sds((nx,)), sds((nu,)), sds(()),
        sds((nx,)),
    )
    term_b, ct_b = _lift(_term_fn(ocp, nx), sds((nx,)))
    if ddp:
        from ipoc_tpu.ops.pallas.fused_iter_kernel import (
            _stage_ddp_fwd_fn,
            _term_ddp_fwd_fn,
        )

        fwd_fn = _stage_ddp_fwd_fn(ocp, nx, nu, with_cu=True)
        term_fwd = _term_ddp_fwd_fn(ocp)
    else:
        fwd_fn = _stage_fwd_fn(ocp, nx, nu, with_cu=True)
        term_fwd = _term_fwd_fn(ocp)
    stage_f, cs_f = _lift(
        fwd_fn, sds((nx,)), sds((nu,)),
        sds(()), sds((nx,)), sds((ng,)),
    )
    term_f, ct_f = _lift(term_fwd, sds((nx,)), sds((nx,)))
    stage_tr, cs_t = _lift(
        _stage_transition_fn(ocp, with_cu=True), sds((nx,)), sds((nx,)),
        sds((nu,)), sds((nu,)), sds(()),
    )
    term_tr, ct_t = _lift(ocp.final_cost, sds((nx,)))

    lift = lambda s: s[:, None]      # (C,S,L) -> (C,1,S,L)  # noqa: E731
    i32 = lambda b: b.astype(jnp.int32)  # noqa: E731
    consts = (list(cs_b) + list(ct_b) + list(cs_f) + list(ct_f)
              + list(cs_t) + list(ct_t))

    scal = lambda: _scal1(S)  # noqa: E731
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    n_counts = (len(cs_b), len(ct_b), len(cs_f), len(ct_f),
                len(cs_t), len(ct_t))

    if not mega_fits(T, nx, nu, S, dtype):
        return _mega_streamed_call(
            ocp, xs_p, xT_p, u_p, up_p, cun_p, it_p, sit_p, rp_p, ri_p,
            bp_p, bp0_p, done_p, x0_p, active_p, cfg, k, interpret, ddp,
            stage_b, term_b, stage_f, term_f, stage_tr, term_tr,
            n_counts, consts)

    tb = _mega_time_block(T)
    kernel = functools.partial(
        _mega_kernel, nx=nx, nu=nu, T=T, k=k, cfg=cfg,
        stage_b=stage_b, term_b=term_b, stage_f=stage_f, term_f=term_f,
        stage_tr=stage_tr, term_tr=term_tr,
        n_counts=n_counts, tb=tb, ddp=ddp,
    )

    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(C,),
            out_shape=(
                jax.ShapeDtypeStruct((C, nx, S, LANES), dtype),   # xT
                jax.ShapeDtypeStruct((C, 1, S, LANES), dtype),    # cun
                jax.ShapeDtypeStruct((C, 1, S, LANES), jnp.int32),  # it
                jax.ShapeDtypeStruct((C, 1, S, LANES), jnp.int32),  # sit
                jax.ShapeDtypeStruct((C, 1, S, LANES), dtype),    # rp
                jax.ShapeDtypeStruct((C, 1, S, LANES), dtype),    # r_inc
                jax.ShapeDtypeStruct((C, 1, S, LANES), dtype),    # bp
                jax.ShapeDtypeStruct((C, 1, S, LANES), jnp.int32),  # done
                jax.ShapeDtypeStruct((C, T, nx, S, LANES), dtype),  # xs
                jax.ShapeDtypeStruct((C, T, nu, S, LANES), dtype),  # u
                jax.ShapeDtypeStruct((C, T, nu, S, LANES), dtype),  # u_prev
                jax.ShapeDtypeStruct((C, 1), jnp.int32),          # steps
            ),
            in_specs=[
                scal(), _bcast1(nx, S), _bcast1(nx, S), scal(),
                scal(), scal(), scal(), scal(), scal(), scal(), scal(),
                any_spec, any_spec, any_spec,
            ] + [_const1(cst.size, S) for cst in consts],
            out_specs=(
                _bcast1(nx, S), scal(), scal(), scal(), scal(),
                scal(), scal(), scal(), any_spec, any_spec, any_spec,
                pl.BlockSpec((C, 1), lambda c: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((T, nx, S, LANES), dtype),   # xs_v
                pltpu.VMEM((T, nu, S, LANES), dtype),   # u_v
                pltpu.VMEM((T, nu, S, LANES), dtype),   # up_v
                pltpu.VMEM((T, nx, S, LANES), dtype),   # tx_s
                pltpu.VMEM((T, nu, S, LANES), dtype),   # tu_s
                pltpu.VMEM((T, ng, S, LANES), dtype),   # Kk_s
                pltpu.VMEM((nx, S, LANES), dtype),      # xT_v
                pltpu.VMEM((1, S, LANES), dtype),       # cun_s
                pltpu.VMEM((1, S, LANES), dtype),       # rp_s
                pltpu.VMEM((1, S, LANES), dtype),       # ri_s
                pltpu.VMEM((1, S, LANES), dtype),       # bp_s
                pltpu.VMEM((1, S, LANES), jnp.int32),   # done_s
                pltpu.VMEM((1, S, LANES), jnp.int32),   # it_s
                pltpu.VMEM((1, S, LANES), jnp.int32),   # sit_s
                pltpu.SMEM((1,), jnp.int32),            # steps_s
                pltpu.SemaphoreType.DMA((3,)),
            ],
            interpret=interpret,
        )(lift(i32(active_p)), x0_p, xT_p, lift(cun_p), lift(it_p),
          lift(sit_p), lift(rp_p), lift(ri_p), lift(bp_p), lift(bp0_p),
          lift(i32(done_p)), xs_p, u_p, up_p, *_pack_consts(consts, S))

    (xT_n, cun_n, it_n, sit_n, rp_n, ri_n, bp_n, done_n, xs_n, u_n,
     up_n, steps) = outs
    drop = lambda s: s[:, 0]  # noqa: E731
    return (xs_n, xT_n, u_n, up_n, drop(cun_n), drop(it_n), drop(sit_n),
            drop(rp_n), drop(ri_n), drop(bp_n), drop(done_n) > 0,
            jnp.max(steps))


def _mega_streamed_call(ocp, xs_p, xT_p, u_p, up_p, cun_p, it_p, sit_p,
                        rp_p, ri_p, bp_p, bp0_p, done_p, x0_p, active_p,
                        cfg, k, interpret, ddp, stage_b, term_b, stage_f,
                        term_f, stage_tr, term_tr, n_counts, consts):
    """Streamed-mode dispatch of :func:`mega_k_iterations` (T past the
    resident VMEM cap): same packed layout, same return tuple; xs/u/u_prev
    are input->output ALIASED (in-place window DMA updates), and three HBM
    scratch outputs carry the trial arrays and the gains ring."""
    C, T, nx, S, L = xs_p.shape
    nu = u_p.shape[2]
    ng = (1 + nx) * nu
    dtype = u_p.dtype

    W = stream_window(T, nx, nu, S, dtype)
    if W is None:
        raise ValueError(
            f"mega streamed kernel: no usable time window for T={T} "
            f"(needs a divisor of T in [8, VMEM cap]); gate dispatch with "
            "mega_dispatch_ok and fall back to the two-launch path"
        )
    tb = _stream_time_block(W)
    kernel = functools.partial(
        _mega_streamed_kernel, nx=nx, nu=nu, T=T, W=W, k=k, cfg=cfg,
        stage_b=stage_b, term_b=term_b, stage_f=stage_f, term_f=term_f,
        stage_tr=stage_tr, term_tr=term_tr,
        n_counts=n_counts, tb=tb, ddp=ddp,
    )

    lift = lambda s: s[:, None]  # noqa: E731
    i32 = lambda b: b.astype(jnp.int32)  # noqa: E731
    scal = lambda: _scal1(S)  # noqa: E731
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(C,),
            out_shape=(
                jax.ShapeDtypeStruct((C, nx, S, LANES), dtype),   # xT
                jax.ShapeDtypeStruct((C, 1, S, LANES), dtype),    # cun
                jax.ShapeDtypeStruct((C, 1, S, LANES), jnp.int32),  # it
                jax.ShapeDtypeStruct((C, 1, S, LANES), jnp.int32),  # sit
                jax.ShapeDtypeStruct((C, 1, S, LANES), dtype),    # rp
                jax.ShapeDtypeStruct((C, 1, S, LANES), dtype),    # r_inc
                jax.ShapeDtypeStruct((C, 1, S, LANES), dtype),    # bp
                jax.ShapeDtypeStruct((C, 1, S, LANES), jnp.int32),  # done
                jax.ShapeDtypeStruct((C, T, nx, S, LANES), dtype),  # xs
                jax.ShapeDtypeStruct((C, T, nu, S, LANES), dtype),  # u
                jax.ShapeDtypeStruct((C, T, nu, S, LANES), dtype),  # u_prev
                jax.ShapeDtypeStruct((C, 1), jnp.int32),          # steps
                jax.ShapeDtypeStruct((C, T, nx, S, LANES), dtype),  # tx
                jax.ShapeDtypeStruct((C, T, nu, S, LANES), dtype),  # tu
                jax.ShapeDtypeStruct((C, T, ng, S, LANES), dtype),  # Kk
            ),
            in_specs=[
                scal(), _bcast1(nx, S), _bcast1(nx, S), scal(),
                scal(), scal(), scal(), scal(), scal(), scal(), scal(),
                any_spec, any_spec, any_spec,
            ] + [_const1(cst.size, S) for cst in consts],
            out_specs=(
                _bcast1(nx, S), scal(), scal(), scal(), scal(),
                scal(), scal(), scal(), any_spec, any_spec, any_spec,
                pl.BlockSpec((C, 1), lambda c: (0, 0),
                             memory_space=pltpu.SMEM),
                any_spec, any_spec, any_spec,
            ),
            input_output_aliases={11: 8, 12: 9, 13: 10},
            scratch_shapes=[
                pltpu.VMEM((3 * W, nx, S, LANES), dtype),   # xs_w
                pltpu.VMEM((3 * W, nu, S, LANES), dtype),   # u_w
                pltpu.VMEM((3 * W, nu, S, LANES), dtype),   # up_w
                pltpu.VMEM((3 * W, nx, S, LANES), dtype),   # tx_w
                pltpu.VMEM((3 * W, nu, S, LANES), dtype),   # tu_w
                pltpu.VMEM((3 * W, ng, S, LANES), dtype),   # Kk_w
                pltpu.VMEM((nx, S, LANES), dtype),          # xT_v
                pltpu.VMEM((1, S, LANES), dtype),           # cun_s
                pltpu.VMEM((1, S, LANES), dtype),           # rp_s
                pltpu.VMEM((1, S, LANES), dtype),           # ri_s
                pltpu.VMEM((1, S, LANES), dtype),           # bp_s
                pltpu.VMEM((1, S, LANES), jnp.int32),       # done_s
                pltpu.VMEM((1, S, LANES), jnp.int32),       # it_s
                pltpu.VMEM((1, S, LANES), jnp.int32),       # sit_s
                pltpu.VMEM((1, S, LANES), jnp.int32),       # acc_s
                pltpu.SMEM((1,), jnp.int32),                # steps_s
                pltpu.SemaphoreType.DMA((12, 3)),
            ],
            interpret=interpret,
        )(lift(i32(active_p)), x0_p, xT_p, lift(cun_p), lift(it_p),
          lift(sit_p), lift(rp_p), lift(ri_p), lift(bp_p), lift(bp0_p),
          lift(i32(done_p)), xs_p, u_p, up_p, *_pack_consts(consts, S))

    (xT_n, cun_n, it_n, sit_n, rp_n, ri_n, bp_n, done_n, xs_n, u_n,
     up_n, steps, _tx, _tu, _Kk) = outs
    drop = lambda s: s[:, 0]  # noqa: E731
    return (xs_n, xT_n, u_n, up_n, drop(cun_n), drop(it_n), drop(sit_n),
            drop(rp_n), drop(ri_n), drop(bp_n), drop(done_n) > 0,
            jnp.max(steps))
