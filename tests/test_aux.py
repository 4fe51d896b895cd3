"""Auxiliary-subsystem tests: rich solve API, JSONL logging,
checkpoint/resume (SURVEY §5.4-5.5)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ipoc_tpu
from ipoc_tpu.models import pendulum
from ipoc_tpu.solvers.checkpoint import CheckpointedBatchRunner
from ipoc_tpu.solvers.batched import BatchSolution, make_batch
from ipoc_tpu.solvers.barrier import n_barrier_stages
from ipoc_tpu.solvers.solution import IPSolution, solve
from ipoc_tpu.utils.logging import JsonlLogger


def test_num_barrier_stages_default():
    assert n_barrier_stages(ipoc_tpu.DEFAULT_CONFIG) == 5


@pytest.mark.smoke
def test_solve_rich_api():
    ocp = pendulum.make_ocp(0.02)
    x0 = pendulum.initial_state(jnp.float64)
    u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (40, 1))
    sol = jax.jit(lambda u, x: solve(ocp, u, x))(u0, x0)
    assert isinstance(sol, IPSolution)
    assert sol.controls.shape == (40, 1)
    assert sol.states.shape == (41, 2)
    assert bool(sol.feasible)
    assert bool(sol.converged)
    assert float(sol.grad_norm) < 1e-4
    m = sol.metrics()
    assert set(m) == {"iterations", "grad_norm", "cost", "feasible", "converged"}
    assert m["iterations"] > 0


def test_jsonl_logger(tmp_path):
    path = os.path.join(tmp_path, "log.jsonl")
    with JsonlLogger(path) as lg:
        lg.log({"a": 1})
        lg.log({"b": 2.5})
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["a"] == 1 and lines[1]["b"] == 2.5
    assert all("ts" in l for l in lines)


def test_checkpoint_resume(tmp_path):
    ocp = pendulum.make_ocp(0.05)
    x0 = pendulum.initial_state(jnp.float64)
    u0, x0b = make_batch(
        jax.random.PRNGKey(0), x0, n=6, horizon=15, nu=1,
        state_scale=0.02, dtype=jnp.float64,
    )
    cfg = ipoc_tpu.FAST_CONFIG.replace(max_newton_iters=40)

    calls = []

    def counting_solve(u, x):
        calls.append(u.shape[0])
        from ipoc_tpu.solvers.batched import solve_batch

        return solve_batch(ocp, u, x, cfg)

    runner = CheckpointedBatchRunner(str(tmp_path / "ckpt"), chunk_size=2)
    sol1 = runner.run(ocp, u0, x0b, cfg, solve_fn=counting_solve)
    assert sol1.controls.shape == (6, 15, 1)
    assert len(calls) == 3  # 3 chunks solved

    # Resume: no chunk re-solved, identical results.
    calls.clear()
    runner2 = CheckpointedBatchRunner(str(tmp_path / "ckpt"), chunk_size=2)
    sol2 = runner2.run(ocp, u0, x0b, cfg, solve_fn=counting_solve)
    assert calls == []
    np.testing.assert_allclose(sol1.controls, sol2.controls)
    np.testing.assert_array_equal(sol1.iterations, sol2.iterations)


@pytest.mark.slow
def test_checkpoint_partial_resume(tmp_path):
    """Simulate a crash after one chunk: only remaining chunks are solved."""
    ocp = pendulum.make_ocp(0.05)
    x0 = pendulum.initial_state(jnp.float64)
    u0, x0b = make_batch(
        jax.random.PRNGKey(2), x0, n=4, horizon=12, nu=1,
        state_scale=0.02, dtype=jnp.float64,
    )
    cfg = ipoc_tpu.FAST_CONFIG.replace(max_newton_iters=30)
    from ipoc_tpu.solvers.batched import solve_batch

    runner = CheckpointedBatchRunner(str(tmp_path / "ck2"), chunk_size=2)
    # Solve only chunk 0 by hand, mark it done.
    sol0 = solve_batch(ocp, u0[:2], x0b[:2], cfg)
    runner._save_chunk(0, BatchSolution(sol0.controls, sol0.iterations))

    calls = []

    def counting_solve(u, x):
        calls.append(u.shape[0])
        return solve_batch(ocp, u, x, cfg)

    sol = runner.run(ocp, u0, x0b, cfg, solve_fn=counting_solve)
    assert calls == [2]  # only chunk 1
    np.testing.assert_allclose(sol.controls[:2], sol0.controls)


def test_checkpoint_identity_guard(tmp_path):
    """Resuming with a different chunk_size or campaign shape must REFUSE
    (index-keyed chunk files would splice at wrong offsets), not silently
    mix stale chunks into the result."""
    ocp = pendulum.make_ocp(0.05)
    x0 = pendulum.initial_state(jnp.float64)
    u0, x0b = make_batch(
        jax.random.PRNGKey(1), x0, n=4, horizon=12, nu=1,
        state_scale=0.02, dtype=jnp.float64,
    )
    cfg = ipoc_tpu.FAST_CONFIG.replace(max_newton_iters=30)
    runner = CheckpointedBatchRunner(str(tmp_path / "ckid"), chunk_size=2)
    runner.run(ocp, u0, x0b, cfg)

    # Different chunking over the same campaign: refuse.
    bad = CheckpointedBatchRunner(str(tmp_path / "ckid"), chunk_size=1)
    with pytest.raises(ValueError, match="chunk"):
        bad.run(ocp, u0, x0b, cfg)

    # Different scenario-set shape: refuse.
    same = CheckpointedBatchRunner(str(tmp_path / "ckid"), chunk_size=2)
    with pytest.raises(ValueError):
        same.run(ocp, u0[:2], x0b[:2], cfg)

    # Unchanged identity still resumes cleanly.
    sol = same.run(ocp, u0, x0b, cfg)
    assert sol.controls.shape == (4, 12, 1)
