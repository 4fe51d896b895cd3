"""Costate recursion tests: seq == par == hand-rolled Python loop."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ipoc_tpu.models import pendulum
from ipoc_tpu.ops.derivatives import compute_derivatives
from ipoc_tpu.parallel.costates import par_costates, seq_costates
from ipoc_tpu.utils.integrators import rollout


def _setup(H=17):
    ocp = pendulum.make_ocp(0.01)
    x0 = pendulum.initial_state(jnp.float64)
    u = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (H, 1))
    x = rollout(ocp.dynamics, u, x0)
    d = compute_derivatives(ocp, x, u, 0.05)
    return ocp, x, d


@pytest.mark.smoke
def test_seq_equals_par():
    ocp, x, d = _setup()
    lam_seq = seq_costates(ocp, x[-1], d)
    lam_par = par_costates(ocp, x[-1], d)
    np.testing.assert_allclose(lam_seq, lam_par, atol=1e-12)


def test_against_python_loop():
    ocp, x, d = _setup(H=9)
    lam_T = jax.grad(ocp.final_cost)(x[-1])
    lams = [np.asarray(lam_T)]
    for k in reversed(range(9)):
        lams.append(np.asarray(d.cx[k]) + np.asarray(d.fx[k]).T @ lams[-1])
    expected = np.stack(lams[::-1])
    np.testing.assert_allclose(seq_costates(ocp, x[-1], d), expected, atol=1e-12)


def test_shapes():
    _, x, d = _setup(H=17)
    ocp, x, d = _setup(H=17)
    assert par_costates(ocp, x[-1], d).shape == (18, 2)
