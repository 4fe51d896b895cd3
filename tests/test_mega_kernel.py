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
        # Cartpole-scale mega resident set stops fitting S=8 past T~214.
        assert not batch_packed_eligible(cfg, jnp.float32, 4, 1, 256, 2048)
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
