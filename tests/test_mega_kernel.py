"""Resident mega-kernel parity: k in-kernel iterations == k packed steps.

The mega-kernel (ops/pallas/mega_kernel.py) replays ``packed_lane_iter``'s
per-iteration semantics — backward/forward trial, accept/LM glue, stage
transitions with the predictor — entirely in-kernel for k iterations.
These tests pin it (in Pallas interpreter mode) against the two-launch
packed composition stepping the same lanes, and the mega stream end-to-end
against the unpacked stream.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import ipoc_tpu
from ipoc_tpu.models import pendulum
from ipoc_tpu.ops.pallas import set_pallas_scans
from ipoc_tpu.ops.pallas.mega_kernel import mega_k_iterations
from ipoc_tpu.solvers.batched import make_batch
from ipoc_tpu.solvers.packed_stream import (
    _unpack_scal,
    packed_lane_iter,
)
from ipoc_tpu.ops.pallas.seq_newton_kernel import _unpack_s

from tests.test_packed_stream import _packed_init, _setup

B = 1024
T = 6
S = 8


@pytest.fixture(autouse=True)
def _restore_gate():
    yield
    set_pallas_scans("auto")


@pytest.mark.parametrize(
    "predictor", [pytest.param(True, marks=pytest.mark.smoke), False])
def test_mega_matches_packed_iters(predictor):
    """k=4 resident iterations == 4 packed_lane_iter steps (forced stage
    transitions via a tiny per-stage cap, with and without predictor)."""
    cfg = ipoc_tpu.BATCH_CONFIG.replace(
        max_newton_iters=2, stage_predictor=predictor
    )
    ocp, u0, x0b = _setup(cfg)

    set_pallas_scans("on")
    with pltpu.force_tpu_interpret_mode():
        lane0 = _packed_init(ocp, u0, x0b, cfg)
        active = jnp.ones_like(lane0.done)

        ref = lane0
        step = jax.jit(lambda ln: packed_lane_iter(
            ocp, ln, cfg, jnp.logical_and(active, jnp.logical_not(ln.done)),
            interpret=True))
        for _ in range(4):
            ref = step(ref)

        (xs, xT, u, up, cun, it, sit, rp, ri, bp, done,
         steps) = jax.jit(lambda ln: mega_k_iterations(
            ocp, ln.xs, ln.xT, ln.u, ln.u_prev, ln.cun, ln.it,
            ln.stage_it, ln.rp, ln.r_inc, ln.bp, ln.bp0, ln.done,
            ln.x0, active, cfg, 4, interpret=True))(lane0)

    assert int(steps) == 4
    np.testing.assert_allclose(np.asarray(_unpack_s(u, B, (1,))),
                               np.asarray(_unpack_s(ref.u, B, (1,))),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(_unpack_s(xs, B, (2,))),
                               np.asarray(_unpack_s(ref.xs, B, (2,))),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(_unpack_scal(it, B)),
                                  np.asarray(_unpack_scal(ref.it, B)))
    np.testing.assert_array_equal(np.asarray(_unpack_scal(sit, B)),
                                  np.asarray(_unpack_scal(ref.stage_it, B)))
    np.testing.assert_allclose(np.asarray(_unpack_scal(bp, B)),
                               np.asarray(_unpack_scal(ref.bp, B)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(_unpack_scal(rp, B)),
                               np.asarray(_unpack_scal(ref.rp, B)),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(_unpack_scal(cun, B)),
                               np.asarray(_unpack_scal(ref.cun, B)),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(_unpack_scal(done, B)),
                                  np.asarray(_unpack_scal(ref.done, B)))


def test_mega_streamed_mini_parity(monkeypatch):
    """Default-tier STREAMED mega pin: 2 streamed iterations (T=8, W=4 —
    2-window cycling, lazy accept merge, epilogue flush) == 2
    packed_lane_iter steps.  The full parity matrix (stage transitions,
    DDP, multi-k-block chaining) is the slow-tier
    test_mega_streamed_matches_packed_iters; this mini pin keeps an
    executable streamed check in the default tier at interpret-mode
    cost ~15 s."""
    from ipoc_tpu.ops.pallas import mega_kernel as mk
    from ipoc_tpu.ops.pallas.fused_iter_kernel import _pack_vec
    from ipoc_tpu.ops.pallas.seq_newton_kernel import LANES, _ceil_to, _pack_s
    from ipoc_tpu.solvers.packed_stream import _pack_scal, packed_lane_init

    monkeypatch.setenv("IPOC_STREAM_WINDOW", "4")
    monkeypatch.setenv("IPOC_TIME_BLOCK", "2")  # small unroll: trace cost
    monkeypatch.setattr(mk, "mega_fits", lambda *a, **k: False)
    Ts = 8
    cfg = ipoc_tpu.BATCH_CONFIG
    ocp = pendulum.make_ocp(1.0 / Ts)
    x0 = pendulum.initial_state(jnp.float32)
    u0, x0b = make_batch(jax.random.PRNGKey(3), x0, B, Ts, 1,
                         state_scale=0.02, control_scale=0.1,
                         dtype=jnp.float32)
    set_pallas_scans("on")
    with pltpu.force_tpu_interpret_mode():
        Bp = _ceil_to(B, S * LANES)
        C = Bp // (S * LANES)
        u_p = _pack_s(u0, Bp, S)
        x0_p = _pack_vec(x0b, Bp, S)
        bp0 = _pack_scal(jnp.full((B,), cfg.bp_init, jnp.float32),
                         Bp, C, S, LANES)
        rp0 = _pack_scal(jnp.full((B,), cfg.reg_init, jnp.float32),
                         Bp, C, S, LANES)
        lane0 = packed_lane_init(ocp, u_p, x0_p, bp0, rp0, cfg,
                                 interpret=True)
        active = jnp.ones_like(lane0.done)
        ref = lane0
        for _ in range(2):
            ref = packed_lane_iter(
                ocp, ref, cfg,
                jnp.logical_and(active, jnp.logical_not(ref.done)),
                interpret=True)
        out = mk.mega_k_iterations(
            ocp, lane0.xs, lane0.xT, lane0.u, lane0.u_prev, lane0.cun,
            lane0.it, lane0.stage_it, lane0.rp, lane0.r_inc, lane0.bp,
            lane0.bp0, lane0.done, lane0.x0, active, cfg, 2,
            interpret=True)
    (xs, xT, u, up, cun, it, sit, rp, ri, bp, done, steps) = out
    assert int(steps) == 2
    np.testing.assert_allclose(np.asarray(_unpack_s(u, B, (1,))),
                               np.asarray(_unpack_s(ref.u, B, (1,))),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(_unpack_s(xs, B, (2,))),
                               np.asarray(_unpack_s(ref.xs, B, (2,))),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(_unpack_scal(it, B)),
                                  np.asarray(_unpack_scal(ref.it, B)))
    np.testing.assert_array_equal(np.asarray(_unpack_scal(done, B)),
                                  np.asarray(_unpack_scal(ref.done, B)))


@pytest.mark.slow
def test_mega_streamed_multi_input(monkeypatch):
    """Streamed mega kernel at nu=2 (planar quadrotor, nx=6): the
    window machinery, gains-ring parking (ng=(1+nx)*nu rows) and the
    lazy merge are all shape-generic — pinned == packed_lane_iter on
    the first multi-input model (the nu>1 gain-RHS layout bug class of
    r3 motivates keeping an explicit multi-input pin per kernel
    family)."""
    from ipoc_tpu.models import quadrotor
    from ipoc_tpu.ops.pallas import mega_kernel as mk
    from ipoc_tpu.ops.pallas.fused_iter_kernel import _pack_vec
    from ipoc_tpu.ops.pallas.seq_newton_kernel import LANES, _ceil_to, _pack_s
    from ipoc_tpu.solvers.packed_stream import _pack_scal, packed_lane_init

    monkeypatch.setenv("IPOC_STREAM_WINDOW", "4")
    monkeypatch.setenv("IPOC_TIME_BLOCK", "2")
    monkeypatch.setattr(mk, "mega_fits", lambda *a, **k: False)
    Ts = 8
    cfg = ipoc_tpu.BATCH_CONFIG
    ocp = quadrotor.make_ocp(1.0 / Ts)
    x0 = quadrotor.initial_state(jnp.float32)
    u0, x0b = make_batch(jax.random.PRNGKey(3), x0, B, Ts, 2,
                         state_scale=0.02, control_scale=0.05,
                         dtype=jnp.float32)
    u0 = u0 + quadrotor.hover_controls(Ts, jnp.float32)[None]
    set_pallas_scans("on")
    with pltpu.force_tpu_interpret_mode():
        Bp = _ceil_to(B, S * LANES)
        C = Bp // (S * LANES)
        u_p = _pack_s(u0, Bp, S)
        x0_p = _pack_vec(x0b, Bp, S)
        bp0 = _pack_scal(jnp.full((B,), cfg.bp_init, jnp.float32),
                         Bp, C, S, LANES)
        rp0 = _pack_scal(jnp.full((B,), cfg.reg_init, jnp.float32),
                         Bp, C, S, LANES)
        lane0 = packed_lane_init(ocp, u_p, x0_p, bp0, rp0, cfg,
                                 interpret=True)
        active = jnp.ones_like(lane0.done)
        ref = lane0
        for _ in range(2):
            ref = packed_lane_iter(
                ocp, ref, cfg,
                jnp.logical_and(active, jnp.logical_not(ref.done)),
                interpret=True)
        out = mk.mega_k_iterations(
            ocp, lane0.xs, lane0.xT, lane0.u, lane0.u_prev, lane0.cun,
            lane0.it, lane0.stage_it, lane0.rp, lane0.r_inc, lane0.bp,
            lane0.bp0, lane0.done, lane0.x0, active, cfg, 2,
            interpret=True)
    (xs, xT, u, up, cun, it, sit, rp, ri, bp, done, steps) = out
    assert int(steps) == 2
    np.testing.assert_allclose(np.asarray(_unpack_s(u, B, (2,))),
                               np.asarray(_unpack_s(ref.u, B, (2,))),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(_unpack_s(xs, B, (6,))),
                               np.asarray(_unpack_s(ref.xs, B, (6,))),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(_unpack_scal(it, B)),
                                  np.asarray(_unpack_scal(ref.it, B)))
    np.testing.assert_array_equal(np.asarray(_unpack_scal(done, B)),
                                  np.asarray(_unpack_scal(ref.done, B)))


@pytest.mark.slow
@pytest.mark.parametrize("impl", ["fused", "ddp"])
def test_mega_streamed_matches_packed_iters(monkeypatch, impl):
    """STREAMED mega kernel (time windows double-buffered through VMEM,
    lazy accept merge, streamed transitions) == packed_lane_iter, run as
    two k-blocks so the epilogue merge + input/output aliasing across
    launches is exercised.  T=32 with a forced W=8 window gives 4-window
    cycling; mega_fits is forced False so the streamed dispatch runs at
    a test-sized horizon (production trigger is T past the resident cap,
    pinned by test_batch_packed_eligible_gates)."""
    from ipoc_tpu.ops.pallas import mega_kernel as mk
    from ipoc_tpu.solvers.packed_stream import PackedLane

    monkeypatch.setenv("IPOC_STREAM_WINDOW", "8")
    monkeypatch.setenv("IPOC_TIME_BLOCK", "2")  # small unroll: trace cost
    monkeypatch.setattr(mk, "mega_fits", lambda *a, **k: False)
    Ts = 16
    cfg = ipoc_tpu.BATCH_CONFIG.replace(
        max_newton_iters=2, stage_predictor=True, newton_impl=impl
    )
    ocp = pendulum.make_ocp(1.0 / Ts)
    x0 = pendulum.initial_state(jnp.float32)
    u0, x0b = make_batch(jax.random.PRNGKey(3), x0, B, Ts, 1,
                         state_scale=0.02, control_scale=0.1,
                         dtype=jnp.float32)
    ddp = impl == "ddp"

    set_pallas_scans("on")
    with pltpu.force_tpu_interpret_mode():
        from ipoc_tpu.ops.pallas.fused_iter_kernel import _pack_vec
        from ipoc_tpu.ops.pallas.seq_newton_kernel import _ceil_to, _pack_s
        from ipoc_tpu.solvers.packed_stream import (
            _pack_scal,
            packed_lane_init,
        )
        from ipoc_tpu.ops.pallas.seq_newton_kernel import LANES

        Bp = _ceil_to(B, S * LANES)
        C = Bp // (S * LANES)
        u_p = _pack_s(u0, Bp, S)
        x0_p = _pack_vec(x0b, Bp, S)
        bp0 = _pack_scal(jnp.full((B,), cfg.bp_init, jnp.float32),
                         Bp, C, S, LANES)
        rp0 = _pack_scal(jnp.full((B,), cfg.reg_init, jnp.float32),
                         Bp, C, S, LANES)
        lane0 = packed_lane_init(ocp, u_p, x0_p, bp0, rp0, cfg,
                                 interpret=True)
        active = jnp.ones_like(lane0.done)

        ref = lane0
        step = jax.jit(lambda ln: packed_lane_iter(
            ocp, ln, cfg, jnp.logical_and(active, jnp.logical_not(ln.done)),
            interpret=True))
        for _ in range(4):
            ref = step(ref)

        mega = jax.jit(lambda ln: mk.mega_k_iterations(
            ocp, ln.xs, ln.xT, ln.u, ln.u_prev, ln.cun, ln.it,
            ln.stage_it, ln.rp, ln.r_inc, ln.bp, ln.bp0, ln.done,
            ln.x0, active, cfg, 2, interpret=True, ddp=ddp))
        ln = lane0
        tot = 0
        for _ in range(2):
            (xs, xT, u, up, cun, it, sit, rp, ri, bp, done, steps) = mega(ln)
            ln = PackedLane(x0=ln.x0, xs=xs, xT=xT, u=u, u_prev=up,
                            cun=cun, it=it, stage_it=sit, rp=rp, r_inc=ri,
                            bp=bp, bp0=ln.bp0, done=done)
            tot += int(steps)

    assert tot == 4
    np.testing.assert_allclose(np.asarray(_unpack_s(ln.u, B, (1,))),
                               np.asarray(_unpack_s(ref.u, B, (1,))),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(_unpack_s(ln.xs, B, (2,))),
                               np.asarray(_unpack_s(ref.xs, B, (2,))),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(_unpack_s(ln.u_prev, B, (1,))),
                               np.asarray(_unpack_s(ref.u_prev, B, (1,))),
                               atol=2e-5)
    for a, b in [(ln.it, ref.it), (ln.stage_it, ref.stage_it),
                 (ln.done, ref.done)]:
        np.testing.assert_array_equal(np.asarray(_unpack_scal(a, B)),
                                      np.asarray(_unpack_scal(b, B)))
    np.testing.assert_allclose(np.asarray(_unpack_scal(ln.cun, B)),
                               np.asarray(_unpack_scal(ref.cun, B)),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_mega_stream_end_to_end():
    """solve_stream_packed with IPOC_MEGA_KERNEL=1 == the unpacked stream
    on a short barrier schedule (same controls and iteration counts)."""
    from ipoc_tpu.solvers.packed_stream import solve_stream_packed
    from ipoc_tpu.solvers.stream import solve_stream

    cfg = ipoc_tpu.BATCH_CONFIG.replace(
        max_newton_iters=8, bp_init=0.1, bp_min=0.021
    )
    ocp, u0, x0b = _setup(cfg)
    N = 2 * B
    uN = jnp.tile(u0, (2, 1, 1))
    xN = jnp.tile(x0b, (2, 1))

    ref = solve_stream(ocp, uN, xN, cfg, lanes=B, refill_every=4)

    set_pallas_scans("on")
    os.environ["IPOC_MEGA_KERNEL"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            got = solve_stream_packed(ocp, uN, xN, cfg, lanes=B,
                                      refill_every=4, interpret=True)
    finally:
        os.environ.pop("IPOC_MEGA_KERNEL", None)
    np.testing.assert_allclose(np.asarray(got.controls),
                               np.asarray(ref.controls), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(got.iterations),
                                  np.asarray(ref.iterations))


@pytest.mark.slow
def test_mega_ddp_matches_packed_iters():
    """k=4 resident DDP iterations (mega ddp=True: Vx-contracted backward
    sweep + in-kernel nonlinear closed-loop re-rollout) == 4
    packed_lane_iter steps through the merged DDP kernel."""
    cfg = ipoc_tpu.BATCH_CONFIG.replace(
        max_newton_iters=2, newton_impl="ddp"
    )
    ocp, u0, x0b = _setup(cfg)

    set_pallas_scans("on")
    with pltpu.force_tpu_interpret_mode():
        lane0 = _packed_init(ocp, u0, x0b, cfg)
        active = jnp.ones_like(lane0.done)

        ref = lane0
        step = jax.jit(lambda ln: packed_lane_iter(
            ocp, ln, cfg, jnp.logical_and(active, jnp.logical_not(ln.done)),
            interpret=True))
        for _ in range(4):
            ref = step(ref)

        (xs, xT, u, up, cun, it, sit, rp, ri, bp, done,
         steps) = jax.jit(lambda ln: mega_k_iterations(
            ocp, ln.xs, ln.xT, ln.u, ln.u_prev, ln.cun, ln.it,
            ln.stage_it, ln.rp, ln.r_inc, ln.bp, ln.bp0, ln.done,
            ln.x0, active, cfg, 4, interpret=True, ddp=True))(lane0)

    assert int(steps) == 4
    np.testing.assert_allclose(np.asarray(_unpack_s(u, B, (1,))),
                               np.asarray(_unpack_s(ref.u, B, (1,))),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(_unpack_scal(it, B)),
                                  np.asarray(_unpack_scal(ref.it, B)))
    np.testing.assert_allclose(np.asarray(_unpack_scal(bp, B)),
                               np.asarray(_unpack_scal(ref.bp, B)),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(_unpack_scal(done, B)),
                                  np.asarray(_unpack_scal(ref.done, B)))


@pytest.mark.slow
def test_solve_batch_packed_matches_flat():
    """The lockstep packed batch solver (mega k-blocks, no stream
    scheduling) == the flat-mode vmapped reference solve."""
    from ipoc_tpu.solvers.ip_newton import flat_lane_init, flat_lane_iter
    from ipoc_tpu.solvers.packed_stream import solve_batch_packed

    cfg = ipoc_tpu.BATCH_CONFIG.replace(
        max_newton_iters=8, bp_init=0.1, bp_min=0.021
    )
    ocp, u0, x0b = _setup(cfg)

    flat = jax.vmap(lambda u, x: flat_lane_init(ocp, u, x, cfg))(u0, x0b)
    step_flat = jax.jit(jax.vmap(
        lambda ln: flat_lane_iter(ocp, ln, cfg,
                                  jnp.logical_not(ln.done))))
    for _ in range(40):
        flat = step_flat(flat)
    assert bool(jnp.all(flat.done))

    set_pallas_scans("on")
    with pltpu.force_tpu_interpret_mode():
        u_pk, it_pk = jax.jit(lambda u, x: solve_batch_packed(
            ocp, u, x, cfg, k_block=8, interpret=True))(u0, x0b)
    np.testing.assert_allclose(np.asarray(u_pk), np.asarray(flat.u),
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(it_pk), np.asarray(flat.it))


@pytest.mark.slow
def test_batch_packed_bp_entry():
    """Warm barrier re-entry (r5, VERDICT r4 #4): resolving from a
    converged solution with ``bp_entry`` reaches the SAME optimum (equal
    raw cost — converged controls sit in a flat valley, so costs are
    the equality metric) in fewer iterations, and an infeasible warm
    start falls back per lane to the full cold schedule (identical to
    the plain cold call)."""
    from ipoc_tpu.solvers.packed_stream import solve_batch_packed
    from ipoc_tpu.utils.integrators import rollout

    cfg = ipoc_tpu.BATCH_CONFIG
    ocp, u0, x0b = _setup(cfg)

    set_pallas_scans("on")
    with pltpu.force_tpu_interpret_mode():
        u_cold, it_cold = solve_batch_packed(ocp, u0, x0b, cfg, k_block=8,
                                             interpret=True)
        u_warm, it_warm = solve_batch_packed(ocp, u_cold, x0b, cfg,
                                             k_block=8, interpret=True,
                                             bp_entry=0.02)
        # infeasible warm start (|u| beyond the pendulum bound 5):
        # bp_entry lanes must fall back to the cold schedule and give
        # exactly the plain cold call's results.
        u_bad = 10.0 * jnp.ones_like(u0)
        u_fb, it_fb = solve_batch_packed(ocp, u_bad, x0b, cfg, k_block=8,
                                         interpret=True, bp_entry=0.02)
        u_fb_ref, it_fb_ref = solve_batch_packed(ocp, u_bad, x0b, cfg,
                                                 k_block=8, interpret=True)

    def raw_cost(u, xx):
        xs = rollout(ocp.dynamics, u, xx)
        return ocp.total_cost(xs, u, jnp.asarray(0.0, u.dtype))

    c_c = np.asarray(jax.vmap(raw_cost)(u_cold, x0b))
    c_w = np.asarray(jax.vmap(raw_cost)(u_warm, x0b))
    rel = np.abs(c_w - c_c) / (np.abs(c_c) + 1e-9)
    assert float(rel.max()) < 2e-5, "warm re-entry drifted off the optimum"
    assert float(np.mean(np.asarray(it_warm))) < float(
        np.mean(np.asarray(it_cold)))
    np.testing.assert_array_equal(np.asarray(u_fb), np.asarray(u_fb_ref))
    np.testing.assert_array_equal(np.asarray(it_fb), np.asarray(it_fb_ref))


@pytest.mark.slow
def test_nmpc_batched_resolver_sharded(monkeypatch):
    """The packed NMPC batch resolver under shard_map (controllers
    data-parallel over the mesh) == the single-device batched loop —
    closed-loop NMPC is embarrassingly parallel across chips."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from ipoc_tpu.mpc import nmpc_loop_batched
    from ipoc_tpu.solvers.packed_stream import solve_batch_packed

    cfg = ipoc_tpu.BATCH_CONFIG.replace(
        max_newton_iters=6, bp_init=0.1, bp_min=0.021
    )
    T, steps = 6, 3
    ocp = pendulum.make_ocp(1.0 / T)
    x0 = pendulum.initial_state(jnp.float32)
    Bc = 8 * 4  # 4 controllers per shard
    key = jax.random.PRNGKey(11)
    x0b = x0[None] + 0.03 * jax.random.normal(key, (Bc, 2), jnp.float32)
    u0b = jnp.zeros((Bc, T, 1), jnp.float32)

    def solve_b(u_warm, x):
        u, _ = solve_batch_packed(ocp, u_warm, x, cfg, k_block=4,
                                  interpret=True)
        return u

    def loop(x, u):
        return nmpc_loop_batched(solve_b, ocp.dynamics, x, u, steps)

    monkeypatch.setenv("IPOC_PACKED_FORCE", "1")
    set_pallas_scans("on")
    with pltpu.force_tpu_interpret_mode():
        xs_ref, us_ref = jax.jit(loop)(x0b, u0b)
        xs_ref, us_ref = np.asarray(xs_ref), np.asarray(us_ref)

        mesh = Mesh(np.array(jax.devices()), ("batch",))
        sh = shard_map(
            loop, mesh=mesh,
            in_specs=(P("batch"), P("batch")),
            out_specs=(P(None, "batch"), P(None, "batch")),
            check_vma=False,
        )
        xs_sh, us_sh = jax.jit(sh)(x0b, u0b)
        xs_sh, us_sh = np.asarray(xs_sh), np.asarray(us_sh)

    np.testing.assert_allclose(xs_sh, xs_ref, atol=1e-4)
    np.testing.assert_allclose(us_sh, us_ref, atol=1e-4)


def test_batch_packed_eligible_gates(monkeypatch):
    """Dispatch gate for the mega-only batch resolver: VMEM fit at long
    horizons and the mega kill switches must fall back (return False)
    instead of letting dispatchers trace into solve_batch_packed's
    raise."""
    from ipoc_tpu.solvers.packed_stream import batch_packed_eligible

    cfg = ipoc_tpu.BATCH_CONFIG
    monkeypatch.setenv("IPOC_PACKED_FORCE", "1")
    set_pallas_scans("on")
    try:
        assert batch_packed_eligible(cfg, jnp.float32, 4, 1, 100, 2048)
        # Cartpole-scale mega resident set stops fitting S=8 past T~214;
        # the r5 STREAMED mega kernel covers those horizons (VERDICT r4
        # #1), so T=256 — and the reference protocol's T=1000 — are now
        # eligible unless the streamed mode is killed or no usable time
        # window divides T (prime horizons).
        assert batch_packed_eligible(cfg, jnp.float32, 4, 1, 256, 2048)
        assert batch_packed_eligible(cfg, jnp.float32, 4, 1, 1000, 2048)
        assert not batch_packed_eligible(cfg, jnp.float32, 4, 1, 509, 2048)
        monkeypatch.setenv("IPOC_MEGA_STREAM", "0")
        assert not batch_packed_eligible(cfg, jnp.float32, 4, 1, 256, 2048)
        monkeypatch.delenv("IPOC_MEGA_STREAM")
        monkeypatch.setenv("IPOC_MEGA_KERNEL", "0")
        assert not batch_packed_eligible(cfg, jnp.float32, 4, 1, 100, 2048)
        monkeypatch.setenv("IPOC_MEGA_KERNEL", "1")
        assert batch_packed_eligible(cfg, jnp.float32, 4, 1, 100, 2048)
        monkeypatch.setenv("IPOC_MEGA_DDP", "0")
        dcfg = cfg.replace(newton_impl="ddp")
        assert not batch_packed_eligible(dcfg, jnp.float32, 4, 1, 100, 2048)
    finally:
        set_pallas_scans("auto")


def test_forced_time_block_parse(monkeypatch, capsys):
    """IPOC_TIME_BLOCK parsing is shared, validated, and never raises:
    non-divisors and non-integers warn and fall back to the auto pick."""
    from ipoc_tpu.ops.pallas.fused_iter_kernel import (
        forced_time_block,
        pick_time_block,
    )
    from ipoc_tpu.ops.pallas.mega_kernel import _mega_time_block

    monkeypatch.delenv("IPOC_TIME_BLOCK", raising=False)
    assert forced_time_block(100, "t") is None
    monkeypatch.setenv("IPOC_TIME_BLOCK", "25")
    assert forced_time_block(100, "t") == 25
    assert _mega_time_block(100) == 25
    assert pick_time_block(100) == 25
    monkeypatch.setenv("IPOC_TIME_BLOCK", "7")      # does not divide T
    assert forced_time_block(100, "t") is None
    monkeypatch.setenv("IPOC_TIME_BLOCK", "auto")   # non-integer
    assert forced_time_block(100, "t") is None      # warns, no ValueError
    assert "rejected" in capsys.readouterr().err
    assert pick_time_block(100) == 5
    assert _mega_time_block(100) == 20
