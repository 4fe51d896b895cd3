"""Packed-stream equivalence: packed lanes == flat lanes == stream.

The packed executor (solvers/packed_stream.py) must replay the flat-mode
lane semantics (solvers/ip_newton.py flat_lane_iter) exactly, up to the
documented f32 summation-order difference in the in-kernel ``||cu||_F``
accumulation.  The packed side runs the REAL Pallas kernels in interpreter
mode; the unpacked side runs the pure-XLA reference composition — so this
also cross-checks kernels vs reference per stage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import ipoc_tpu
from ipoc_tpu.models import pendulum
from ipoc_tpu.ops.pallas import set_pallas_scans
from ipoc_tpu.ops.pallas.fused_iter_kernel import _pack_vec
from ipoc_tpu.ops.pallas.seq_newton_kernel import (
    LANES,
    _ceil_to,
    _pack_s,
    _unpack_s,
)
from ipoc_tpu.solvers.batched import make_batch
from ipoc_tpu.solvers.ip_newton import flat_lane_init, flat_lane_iter
from ipoc_tpu.solvers.packed_stream import (
    _pack_scal,
    _unpack_scal,
    packed_lane_init,
    packed_lane_iter,
)

B = 1024  # minimum packed-lane count (8 sublanes x 128 lanes)
T = 6
S = 8


@pytest.fixture(autouse=True)
def _restore_gate():
    yield
    set_pallas_scans("auto")


def _setup(cfg):
    ocp = pendulum.make_ocp(1.0 / T)
    x0 = pendulum.initial_state(jnp.float32)
    u0, x0b = make_batch(jax.random.PRNGKey(3), x0, B, T, 1,
                         state_scale=0.02, control_scale=0.1,
                         dtype=jnp.float32)
    return ocp, u0, x0b


def _packed_init(ocp, u0, x0b, cfg):
    Bp = _ceil_to(B, S * LANES)
    C = Bp // (S * LANES)
    u_p = _pack_s(u0, Bp, S)
    x0_p = _pack_vec(x0b, Bp, S)
    bp0 = _pack_scal(jnp.full((B,), cfg.bp_init, jnp.float32),
                     Bp, C, S, LANES)
    rp0 = _pack_scal(jnp.full((B,), cfg.reg_init, jnp.float32),
                     Bp, C, S, LANES)
    return packed_lane_init(ocp, u_p, x0_p, bp0, rp0, cfg, interpret=True)


@pytest.mark.parametrize("predictor,impl", [
    (True, "fused"),
    pytest.param(False, "fused", marks=pytest.mark.smoke),
    pytest.param(True, "ddp", marks=pytest.mark.slow),
])
def test_packed_lane_iter_matches_flat(predictor, impl):
    """A few packed iterations (incl. a forced stage transition via a tiny
    per-stage cap) track the flat-mode lanes — Newton (two-launch) and DDP
    (merged one-launch) evaluators."""
    cfg = ipoc_tpu.BATCH_CONFIG.replace(
        max_newton_iters=2, stage_predictor=predictor, newton_impl=impl
    )
    ocp, u0, x0b = _setup(cfg)

    flat = jax.vmap(lambda u, x: flat_lane_init(ocp, u, x, cfg))(u0, x0b)
    step_flat = jax.jit(
        jax.vmap(lambda ln: flat_lane_iter(ocp, ln, cfg))
    )

    step_packed = jax.jit(
        lambda ln: packed_lane_iter(
            ocp, ln, cfg, jnp.logical_not(ln.done), interpret=True
        )
    )
    set_pallas_scans("on")
    with pltpu.force_tpu_interpret_mode():
        packed = _packed_init(ocp, u0, x0b, cfg)
        for _ in range(4):
            flat = step_flat(flat)
            packed = step_packed(packed)

    u_pk = _unpack_s(packed.u, B, (1,))
    np.testing.assert_allclose(np.asarray(u_pk), np.asarray(flat.u),
                               atol=5e-4)
    np.testing.assert_array_equal(
        np.asarray(_unpack_scal(packed.it, B)), np.asarray(flat.it)
    )
    np.testing.assert_allclose(
        np.asarray(_unpack_scal(packed.bp, B)), np.asarray(flat.bp),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(_unpack_scal(packed.done, B)), np.asarray(flat.done)
    )
    # trajectory stages agree (stages 0..T-1 + terminal)
    xs_pk = _unpack_s(packed.xs, B, (2,))
    np.testing.assert_allclose(np.asarray(xs_pk),
                               np.asarray(flat.x[:, :-1]), atol=5e-4)


def test_merged_tb_matches_two_launch():
    """The merged one-launch Newton iteration with time-blocking (the
    r3 measurement path, IPOC_PACKED_MERGED=1) == the two-launch packed
    core, including the in-kernel sum(cu^2)."""
    from ipoc_tpu.ops.pallas.fused_iter_kernel import (
        fused_newton_iter_packed,
    )

    cfg = ipoc_tpu.BATCH_CONFIG
    ocp, u0, x0b = _setup(cfg)
    set_pallas_scans("on")
    with pltpu.force_tpu_interpret_mode():
        lane = _packed_init(ocp, u0, x0b, cfg)
        bp_p = lane.bp[:, None]
        reg_p = jnp.ones_like(bp_p)
        two = jax.jit(lambda: fused_newton_iter_packed(
            ocp, lane.xs, lane.xT, lane.u, bp_p, reg_p, with_cu=True,
            merged=False, interpret=True))()
        one = jax.jit(lambda: fused_newton_iter_packed(
            ocp, lane.xs, lane.xT, lane.u, bp_p, reg_p, with_cu=True,
            merged=True, time_block=2, interpret=True))()
    for a, b in zip(two, one):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)


@pytest.mark.slow
def test_warm_transfer_same_optima_fewer_iters():
    """Cross-scenario warm-start transfer (r5, VERDICT r4 #2): on the
    basin-stable pendulum, the transferred generations converge to the
    SAME per-scenario optima (raw cost equal to f32 rounding) with fewer
    iterations than the cold stream.  (On multi-modal problems the
    transfer changes basin selection — the documented gate; see
    docs/PERFORMANCE.md round-5 iteration-axis section.)"""
    from ipoc_tpu.solvers.packed_stream import solve_stream_packed
    from ipoc_tpu.utils.integrators import rollout

    cfg = ipoc_tpu.BATCH_CONFIG
    Ts, N = 12, 2 * B
    ocp = pendulum.make_ocp(1.0 / Ts)
    x0 = pendulum.initial_state(jnp.float32)
    u0, x0b = make_batch(jax.random.PRNGKey(5), x0, N, Ts, 1,
                         state_scale=0.02, control_scale=0.1,
                         dtype=jnp.float32)

    set_pallas_scans("on")
    with pltpu.force_tpu_interpret_mode():
        cold = solve_stream_packed(ocp, u0, x0b, cfg, lanes=B,
                                   interpret=True)
        warm = solve_stream_packed(ocp, u0, x0b, cfg, lanes=B,
                                   interpret=True, warm_transfer=True)

    def raw_cost(u, xx):
        xs = rollout(ocp.dynamics, u, xx)
        return ocp.total_cost(xs, u, jnp.asarray(0.0, u.dtype))

    c_c = np.asarray(jax.vmap(raw_cost)(cold.controls, x0b))
    c_w = np.asarray(jax.vmap(raw_cost)(warm.controls, x0b))
    rel = np.abs(c_w - c_c) / (np.abs(c_c) + 1e-9)
    assert float(rel.max()) < 1e-4, "transferred optima drifted"
    it_c = np.asarray(cold.iterations)[B:]
    it_w = np.asarray(warm.iterations)[B:]
    assert it_w.mean() < it_c.mean(), "transfer did not cut iterations"


@pytest.mark.slow
def test_packed_stream_end_to_end(monkeypatch):
    """solve_stream_packed (two-launch path) == solve_stream on a short
    barrier schedule.  IPOC_MEGA_KERNEL=0 pins the TWO-LAUNCH packed path
    now that the mega-kernel is the default (it has its own end-to-end
    pin in test_mega_kernel.py)."""
    from ipoc_tpu.solvers.packed_stream import solve_stream_packed
    from ipoc_tpu.solvers.stream import solve_stream

    monkeypatch.setenv("IPOC_MEGA_KERNEL", "0")
    cfg = ipoc_tpu.BATCH_CONFIG.replace(
        max_newton_iters=8, bp_init=0.1, bp_min=0.021
    )
    ocp, u0, x0b = _setup(cfg)
    N = 2 * B
    uN = jnp.tile(u0, (2, 1, 1))
    xN = jnp.tile(x0b, (2, 1))

    ref = solve_stream(ocp, uN, xN, cfg, lanes=B, refill_every=4)

    set_pallas_scans("on")
    with pltpu.force_tpu_interpret_mode():
        got = solve_stream_packed(ocp, uN, xN, cfg, lanes=B,
                                  refill_every=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got.controls),
                               np.asarray(ref.controls), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(got.iterations),
                                  np.asarray(ref.iterations))
