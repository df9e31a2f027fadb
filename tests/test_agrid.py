"""a-grid interpolation accuracy vs direct fills (the design that replaces
samplea.c's per-eval table rebuild, SURVEY.md §3.4)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from libstb_tpu.core import agrid, stirling


@pytest.fixture(scope="module")
def grid64():
    return agrid.make_grid(200, 60, g=100, dtype=jnp.float64)


@pytest.mark.parametrize("a", [0.1037, 0.3456, 0.5, 0.77321, 0.93])
def test_interp_matches_direct_fill(grid64, a):
    direct = stirling.make(200, 60, 400, 120, a, dtype=jnp.float64)
    ns = jnp.array([10, 50, 120, 199, 37])
    ms = jnp.array([3, 12, 40, 60, 2])
    got = np.asarray(grid64.S(ns, ms, a))
    want = np.asarray(direct.S(ns, ms))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-5)
    gotv = np.asarray(grid64.V(ns, ms, a))
    wantv = np.asarray(direct.V(ns, ms))
    np.testing.assert_allclose(gotv, wantv, rtol=2e-5)


def test_per_chain_a_vmap(grid64):
    a = jnp.array([0.11, 0.42, 0.73])
    f = jax.vmap(lambda ai: grid64.S(jnp.asarray(50), jnp.asarray(8), ai))
    got = np.asarray(f(a))
    for i, ai in enumerate(np.asarray(a)):
        direct = stirling.make(200, 60, 200, 60, float(ai), dtype=jnp.float64)
        np.testing.assert_allclose(got[i], float(direct.S(50, 8)), rtol=1e-5)


def test_data_curve_linearity(grid64):
    ns = jnp.array([20, 30, 7, 1])       # the n==1 entry must be masked
    ts = jnp.array([4, 9, 2, 1])
    curve = grid64.data_curve(ns, ts)
    assert curve.shape == (100,)
    a = 0.437
    got = float(grid64.curve_at(curve, a))
    want = float(jnp.sum(jnp.where(ns > 1, grid64.S(ns, ts, a), 0.0)))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_identities(grid64):
    assert float(grid64.S(6, 6, 0.3)) == 0.0
    assert np.isneginf(float(grid64.S(4, 9, 0.3)))
    assert float(grid64.V(10, 1, 0.3)) == 0.0
    from scipy.special import gammaln
    np.testing.assert_allclose(
        float(grid64.S(9, 1, 0.42)),
        gammaln(9 - 0.42) - gammaln(1 - 0.42), rtol=1e-7)
