"""Input+state constrained cartpole (BASELINE.json config 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ipoc_tpu
from ipoc_tpu.models import cartpole
from ipoc_tpu.utils.integrators import rollout


def test_state_constraint_function():
    cons = cartpole.make_constraints(cart_limit=0.5)
    c = cons(jnp.array([0.3, 0.1, 0.0, 0.0]), jnp.array([10.0]))
    assert c.shape == (4,)
    np.testing.assert_allclose(
        c, [10.0 - 50.0, -10.0 - 50.0, 0.3 - 0.5, -0.3 - 0.5]
    )
    # violated position
    c2 = cons(jnp.array([0.7, 0.0, 0.0, 0.0]), jnp.zeros(1))
    assert float(c2[2]) > 0


def test_state_constrained_solve_respects_box():
    dt, H = 0.02, 50
    limit = 0.12
    ocp = cartpole.make_ocp(dt, cart_limit=limit)
    x0 = cartpole.initial_state(jnp.float64)
    u0 = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (H, 1))
    u, iters = jax.jit(
        lambda u, x: ipoc_tpu.par_interior_point_optimal_control(ocp, u, x)
    )(u0, x0)
    assert int(iters) > 0
    X = rollout(ocp.dynamics, u, x0)
    assert bool(jnp.all(jnp.isfinite(u)))
    # interior-point iterates stay strictly inside both boxes
    assert float(jnp.abs(u).max()) < cartpole.CONTROL_BOUND
    assert float(jnp.abs(X[:-1, 0]).max()) < limit


@pytest.mark.slow
def test_unconstrained_position_exceeds_box():
    """Sanity: without the state box the same problem crosses the limit,
    proving the constraint binds."""
    dt, H = 0.02, 50
    ocp_free = cartpole.make_ocp(dt)
    ocp_boxed = cartpole.make_ocp(dt, cart_limit=0.12)
    x0 = cartpole.initial_state(jnp.float64)
    u0 = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (H, 1))
    u_free, _ = ipoc_tpu.par_interior_point_optimal_control(ocp_free, u0, x0)
    u_box, _ = ipoc_tpu.par_interior_point_optimal_control(ocp_boxed, u0, x0)
    X_free = rollout(ocp_free.dynamics, u_free, x0)
    X_box = rollout(ocp_boxed.dynamics, u_box, x0)
    assert float(jnp.abs(X_box[:-1, 0]).max()) < 0.12
    # the boxed solution differs from the free one
    assert float(jnp.abs(u_box - u_free).max()) > 1e-3 or float(
        jnp.abs(X_free[:-1, 0]).max()
    ) <= 0.12
