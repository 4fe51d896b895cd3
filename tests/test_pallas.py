"""Pallas fused-scan kernel tests (interpreter mode on CPU; the same kernels
run compiled on TPU via the use_pallas_scans gate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from ipoc_tpu.ops.pallas import set_pallas_scans, use_pallas_scans
from ipoc_tpu.ops.pallas.scan_kernels import (
    pallas_affine_scan,
    pallas_value_scan,
)
from ipoc_tpu.parallel.costates import affine_combine
from ipoc_tpu.parallel.lqt import (
    _elements,
    par_bwd_pass,
    par_fwd_pass,
    value_combine,
)
from tests.conftest import make_random_lqt


@pytest.fixture(autouse=True)
def _restore_gate():
    yield
    set_pallas_scans("auto")


@pytest.mark.parametrize("T", [
    5,
    pytest.param(100, marks=pytest.mark.slow),
    128,
])
@pytest.mark.parametrize("n", [
    pytest.param(2, marks=pytest.mark.slow),
    4,
])
@pytest.mark.smoke
def test_affine_suffix_scan(rng, T, n):
    F = jnp.array(rng.normal(size=(T, n, n)) * 0.5, dtype=jnp.float32)
    c = jnp.array(rng.normal(size=(T, n)), dtype=jnp.float32)
    exp = lax.associative_scan(
        lambda a, b: affine_combine(b, a), (F, c), reverse=True, axis=0
    )
    got = pallas_affine_scan(F, c, reverse=True, interpret=True)
    np.testing.assert_allclose(got[0], exp[0], atol=2e-5)
    np.testing.assert_allclose(got[1], exp[1], atol=2e-4)


@pytest.mark.parametrize("T", [7, 130])
def test_affine_prefix_scan(rng, T):
    n = 3
    F = jnp.array(rng.normal(size=(T, n, n)) * 0.5, dtype=jnp.float32)
    c = jnp.array(rng.normal(size=(T, n)), dtype=jnp.float32)
    exp = lax.associative_scan(lambda a, b: affine_combine(b, a), (F, c), axis=0)
    got = pallas_affine_scan(F, c, reverse=False, interpret=True)
    np.testing.assert_allclose(got[0], exp[0], atol=2e-5)
    np.testing.assert_allclose(got[1], exp[1], atol=2e-4)


@pytest.mark.slow
def test_value_scan_matches_lax(rng):
    lqt = make_random_lqt(rng, T=16, nx=4, nu=2, dtype=jnp.float32)
    elems = _elements(lqt)
    exp = lax.associative_scan(
        lambda a, b: value_combine(b, a), elems, reverse=True, axis=0
    )
    got = pallas_value_scan(
        elems.A, elems.b, elems.C, elems.eta, elems.J, interpret=True
    )
    for g, e in zip(got, exp):
        np.testing.assert_allclose(g, e, atol=5e-4)


def test_gate_defaults():
    # CPU backend in tests: auto mode must not select pallas.
    assert not use_pallas_scans(jnp.float32, 4)
    assert not use_pallas_scans(jnp.float64, 4)
    set_pallas_scans("on")
    assert use_pallas_scans(jnp.float32, 4)
    assert not use_pallas_scans(jnp.float64, 4)  # f64 never eligible
    assert not use_pallas_scans(jnp.float32, 16)  # big n never eligible
    set_pallas_scans("off")
    assert not use_pallas_scans(jnp.float32, 4)


@pytest.mark.slow
def test_end_to_end_bwd_pass_with_pallas(rng):
    """Full par_bwd_pass/par_fwd_pass with kernels forced on (interpreter)."""
    lqt = make_random_lqt(rng, T=40, nx=3, nu=2, dtype=jnp.float32)
    x0 = jnp.array(rng.normal(size=(3,)), dtype=jnp.float32)

    K0, d0, S0, v0, p0, f0 = par_bwd_pass(lqt)
    u0, xs0 = par_fwd_pass(lqt, x0, K0, d0)

    set_pallas_scans("on")
    with pltpu.force_tpu_interpret_mode():
        K1, d1, S1, v1, p1, f1 = par_bwd_pass(lqt)
        u1, xs1 = par_fwd_pass(lqt, x0, K1, d1)

    np.testing.assert_allclose(K1, K0, atol=1e-3)
    np.testing.assert_allclose(d1, d0, atol=1e-3)
    np.testing.assert_allclose(u1, u0, atol=2e-3)
    np.testing.assert_allclose(xs1, xs0, atol=2e-3)
    assert bool(f1) == bool(f0)
