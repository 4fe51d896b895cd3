"""Fused-iteration kernel tests.

Three layers:
* the block-lifting interpreter + two-launch kernel in Pallas interpret
  mode against the unfused reference composition (exact pipeline match up
  to f32 summation order);
* solver-level equivalence: ``newton_impl="fused"`` must reproduce the
  ``"seq"`` solver's per-lane trial sequences bit-for-bit on CPU f64 (the
  off-TPU fallback composes the identical math);
* the streaming executor on the fused config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ipoc_tpu
from ipoc_tpu.models import cartpole, pendulum
from ipoc_tpu.ops.pallas.fused_iter_kernel import (
    _fused_reference,
    fused_newton_iter_batched,
)
from ipoc_tpu.solvers.batched import make_batch, solve_batch
from ipoc_tpu.solvers.stream import solve_stream
from ipoc_tpu.utils.integrators import rollout

SINGLE = ipoc_tpu.FAST_CONFIG.replace(
    globalization="single", barrier_mode="flat"
)


@pytest.mark.parametrize(
    "merged", [False, pytest.param(True, marks=pytest.mark.smoke)])
@pytest.mark.parametrize("model", [
    pytest.param(cartpole, marks=pytest.mark.slow),
    pendulum,
])
def test_kernel_matches_reference_composition(model, merged):
    """Interpret-mode kernel (merged one-launch and two-launch variants)
    == unfused composition (f32)."""
    T, B = 10, 4
    ocp = model.make_ocp(1.0 / T)
    x0 = model.initial_state(jnp.float32)
    u0, x0b = make_batch(
        jax.random.PRNGKey(0), x0, B, T, 1,
        state_scale=0.05, control_scale=0.1, dtype=jnp.float32,
    )
    X = jax.vmap(lambda u, x: rollout(ocp.dynamics, u, x))(u0, x0b)
    bp = jnp.full((B,), 0.1, jnp.float32)
    reg = jnp.full((B,), 3.0, jnp.float32)

    with jax.enable_x64(False):
        ker = fused_newton_iter_batched(ocp, X, u0, bp, reg, sublanes=1,
                                        interpret=True, merged=merged)
        ref = jax.vmap(lambda x, u, b, r: _fused_reference(ocp, x, u, b, r)
                       )(X, u0, bp, reg)
    names = ["temp_x", "temp_u", "cost", "new_cost", "max_c", "pred", "ok",
             "hu"]
    for nm, a, b in zip(names, ker, ref):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == bool:
            np.testing.assert_array_equal(a, b, err_msg=nm)
        else:
            np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5,
                                       err_msg=nm)


@pytest.mark.parametrize("model", [
    pytest.param(cartpole, marks=pytest.mark.slow),
    pendulum,
])
def test_ddp_kernel_matches_reference_composition(model):
    """Interpret-mode merged kernel in DDP mode == unfused DDP composition
    (value-gradient-contracted sweep + nonlinear re-rollout, f32)."""
    from ipoc_tpu.ops.pallas.fused_iter_kernel import _fused_ddp_reference

    T, B = 24, 4
    ocp = model.make_ocp(1.0 / T)
    x0 = model.initial_state(jnp.float32)
    u0, x0b = make_batch(
        jax.random.PRNGKey(0), x0, B, T, 1,
        state_scale=0.05, control_scale=0.1, dtype=jnp.float32,
    )
    X = jax.vmap(lambda u, x: rollout(ocp.dynamics, u, x))(u0, x0b)
    bp = jnp.full((B,), 0.1, jnp.float32)
    reg = jnp.full((B,), 3.0, jnp.float32)

    with jax.enable_x64(False):
        ker = fused_newton_iter_batched(ocp, X, u0, bp, reg, sublanes=1,
                                        interpret=True, merged=True,
                                        ddp=True)
        ref = jax.vmap(
            lambda x, u, b, r: _fused_ddp_reference(ocp, x, u, b, r)
        )(X, u0, bp, reg)
    names = ["temp_x", "temp_u", "cost", "new_cost", "max_c", "pred", "ok",
             "hu"]
    for nm, a, b in zip(names, ker, ref):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == bool:
            np.testing.assert_array_equal(a, b, err_msg=nm)
        else:
            np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5,
                                       err_msg=nm)


@pytest.mark.parametrize("barrier_mode", ["staged", "flat"])
def test_fused_solver_equals_seq_f64(barrier_mode):
    """Per-lane solves with newton_impl='fused' (off-TPU fallback) must be
    bit-identical to 'seq' — same trials, same accept/reject, same LM."""
    ocp = pendulum.make_ocp(0.02)
    x0 = pendulum.initial_state(jnp.float64)
    u0, x0b = make_batch(
        jax.random.PRNGKey(3), x0, 4, 50, 1,
        state_scale=0.05, control_scale=0.1, dtype=jnp.float64,
    )
    base = SINGLE.replace(barrier_mode=barrier_mode)
    s_seq = jax.jit(lambda u, x: solve_batch(
        ocp, u, x, base.replace(newton_impl="seq")))(u0, x0b)
    s_fus = jax.jit(lambda u, x: solve_batch(
        ocp, u, x, base.replace(newton_impl="fused")))(u0, x0b)
    np.testing.assert_array_equal(np.asarray(s_seq.iterations),
                                  np.asarray(s_fus.iterations))
    np.testing.assert_array_equal(np.asarray(s_seq.controls),
                                  np.asarray(s_fus.controls))


def test_stream_with_fused_config():
    """solve_stream drives the fused trial evaluation per lane."""
    ocp = pendulum.make_ocp(0.02)
    x0 = pendulum.initial_state(jnp.float64)
    u0, x0b = make_batch(
        jax.random.PRNGKey(5), x0, 5, 40, 1,
        state_scale=0.05, control_scale=0.1, dtype=jnp.float64,
    )
    cfg = SINGLE.replace(newton_impl="fused")
    ref = jax.jit(lambda u, x: solve_batch(ocp, u, x, cfg))(u0, x0b)
    sol = jax.jit(lambda u, x: solve_stream(ocp, u, x, cfg, lanes=2))(
        u0, x0b)
    np.testing.assert_allclose(np.asarray(sol.controls),
                               np.asarray(ref.controls),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(sol.iterations),
                                  np.asarray(ref.iterations))


@pytest.mark.parametrize("model", [cartpole, pendulum])
def test_rollout_kernel_matches_scan(model):
    """Interpret-mode one-launch rollout == vmapped lax.scan rollout."""
    from ipoc_tpu.ops.pallas.fused_iter_kernel import rollout_batched

    T, B = 17, 3
    ocp = model.make_ocp(1.0 / T)
    x0 = model.initial_state(jnp.float32)
    u0, x0b = make_batch(
        jax.random.PRNGKey(2), x0, B, T, 1,
        state_scale=0.05, control_scale=0.1, dtype=jnp.float32,
    )
    ref = jax.vmap(lambda u, x: rollout(ocp.dynamics, u, x))(u0, x0b)
    with jax.enable_x64(False):
        ker = rollout_batched(ocp.dynamics, u0, x0b, sublanes=1,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fused_requires_exact_terminal_hessian():
    ocp = pendulum.make_ocp(0.02)
    cfg = SINGLE.replace(newton_impl="fused", terminal_hessian="reference")
    with pytest.raises(ValueError, match="terminal_hessian"):
        jax.jit(lambda u, x: solve_batch(ocp, u, x, cfg))(
            jnp.zeros((2, 10, 1)), jnp.zeros((2, 2)))


def test_fused_requires_single_globalization():
    ocp = pendulum.make_ocp(0.02)
    cfg = ipoc_tpu.FAST_CONFIG.replace(newton_impl="fused")
    with pytest.raises(ValueError, match="single"):
        jax.jit(lambda u, x: solve_batch(ocp, u, x, cfg))(
            jnp.zeros((2, 10, 1)), jnp.zeros((2, 2)))


@pytest.mark.parametrize("model", [cartpole, pendulum])
def test_rollout_cost_kernel_matches_composition(model):
    """Interpret-mode rollout+cost kernel == scan rollout + total_cost."""
    from ipoc_tpu.ops.pallas.fused_iter_kernel import rollout_cost_batched

    T, B = 13, 3
    ocp = model.make_ocp(1.0 / T)
    x0 = model.initial_state(jnp.float32)
    u0, x0b = make_batch(
        jax.random.PRNGKey(4), x0, B, T, 1,
        state_scale=0.05, control_scale=0.1, dtype=jnp.float32,
    )
    bp = jnp.full((B,), 0.05, jnp.float32)
    ref_x = jax.vmap(lambda u, x: rollout(ocp.dynamics, u, x))(u0, x0b)
    ref_c = jax.vmap(ocp.total_cost)(ref_x, u0, bp)
    with jax.enable_x64(False):
        ker_x, ker_c = rollout_cost_batched(ocp, u0, x0b, bp, sublanes=1,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(ker_x), np.asarray(ref_x),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ker_c), np.asarray(ref_c),
                               rtol=2e-5, atol=2e-5)
