"""Golden-trajectory regression tests (SURVEY §4): the H=100 benchmark
solves must keep reproducing the committed f64 solutions exactly (same
platform, same seeds — any drift means a semantic change)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ipoc_tpu
from ipoc_tpu.models import cartpole, pendulum

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("name,model", [("pendulum", pendulum),
                                        ("cartpole", cartpole)])
def test_golden_h100(name, model):
    data = np.load(os.path.join(GOLDEN_DIR, f"{name}_h100.npz"))
    H = 100
    ocp = model.make_ocp(1.0 / H)
    x0 = model.initial_state(jnp.float64)
    u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (H, 1))

    u_par, it_par = jax.jit(
        lambda u, x: ipoc_tpu.par_interior_point_optimal_control(ocp, u, x)
    )(u0, x0)
    np.testing.assert_allclose(np.asarray(u_par), data["u_par"], atol=1e-9)
    assert int(it_par) == int(data["iters_par"])

    u_seq, it_seq = jax.jit(
        lambda u, x: ipoc_tpu.seq_interior_point_optimal_control(ocp, u, x)
    )(u0, x0)
    np.testing.assert_allclose(np.asarray(u_seq), data["u_seq"], atol=1e-9)
    assert int(it_seq) == int(data["iters_seq"])
