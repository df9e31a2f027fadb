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


def test_out_of_bounds_asympt(grid64):
    """Queries past the grid follow stable.c:941-974 semantics (asymptote
    fallback), never a silent clamp (VERDICT r1 missing item 1)."""
    a = 0.5
    big = stirling.make(600, 80, 600, 80, a, dtype=jnp.float64,
                        use_asympt=False)
    # n beyond n_max=200: S falls back to Hutter's asymptote
    got = float(grid64.S(500, 40, a))
    want = float(big.S(500, 40))
    clamp_row = float(big.S(200, 40))    # what a silent clamp would return
    assert abs(got - want) / abs(want) < 5e-3        # asymptote accuracy
    assert abs(got - clamp_row) > 100.0              # nothing like a clamp
    # V beyond n_max: the V asymptote (stable.c:905-912)
    gv = float(grid64.V(500, 40, a))
    wv = float(big.V(500, 40))
    assert abs(gv - wv) / wv < 5e-2
    # S1 beyond the grid rows: exact lgamma formula
    from scipy.special import gammaln
    np.testing.assert_allclose(float(grid64.S1(500, 0.42)),
                               gammaln(500 - 0.42) - gammaln(1 - 0.42),
                               rtol=1e-10)
    # m beyond m_max with n in range and no valid asymptote direction:
    # still never the clamped table value
    got_m = float(grid64.S(150, 90, a))
    assert got_m != float(grid64.S(150, 60, a))


def test_out_of_bounds_no_asympt():
    g = agrid.make_grid(64, 16, g=32, dtype=jnp.float64, use_asympt=False)
    assert np.isneginf(float(g.S(200, 8, 0.3)))      # -inf convention
    assert float(g.V(200, 8, 0.3)) == 0.0            # 0 convention
    # identities still take precedence over bounds
    assert float(g.S(200, 200, 0.3)) == 0.0
    assert float(g.S(200, 1, 0.3)) != -np.inf


def test_ensure_grid_growth_and_quit():
    from libstb_tpu.utils.yaps import LibstbError
    g = agrid.make_grid(32, 16, g=32, dtype=jnp.float64, max_n=256,
                        max_m=64)
    g2 = agrid.ensure_grid(g, 100, 40)
    assert g2.n_max >= 101 and g2.m_max >= 41
    assert g2.max_n == 256 and g2.max_m == 64
    # covered -> same object
    assert agrid.ensure_grid(g2, 50, 20) is g2
    # growth honours hard bounds
    g3 = agrid.ensure_grid(g2, 10_000, 10_000)
    assert g3.n_max <= 256 and g3.m_max <= 64
    with pytest.raises(LibstbError):
        agrid.ensure_grid(g2, 10_000, 10, quit_on_bound=True)
    # grown grid agrees with a directly built one
    direct = agrid.make_grid(g2.n_max, g2.m_max, g=32, dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(g2.S(jnp.asarray(90), jnp.asarray(30), 0.4)),
        np.asarray(direct.S(jnp.asarray(90), jnp.asarray(30), 0.4)),
        rtol=1e-12)


def test_data_curve_mm_t_equals_n_beyond_m_max():
    """ADVICE r1 (medium): the MXU route must zero t==n pairs even when
    n > m_max instead of gathering Srel(n, m_max)."""
    g = agrid.make_grid(64, 12, g=32, dtype=jnp.float64)
    ns = jnp.array([20, 30])
    ts = jnp.array([[20, 5], [3, 5]])     # chain 0 has an all-singleton pair
    mm = g._data_curve_mm(ns, ts)         # (2, G)
    gather = jax.vmap(lambda t1: g.data_curve(ns, t1))(ts)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(gather),
                               rtol=1e-12, atol=1e-12)
    # and the t==n pair contributes exactly nothing
    only_other = g.data_curve(ns[1:], ts[0, 1:])
    np.testing.assert_allclose(np.asarray(mm[0]), np.asarray(only_other),
                               rtol=1e-12)


def test_data_curve_sparse_equals_dense():
    """The streaming CSR route must reproduce data_curve exactly (same
    gathers, chunked reduction), for shared and per-chain pairs, with
    and without weights, including a non-chunk-multiple pair count."""
    grid = agrid.make_grid(128, 48, g=24)
    rng = np.random.default_rng(3)
    P, C = 1000, 5
    ns = rng.integers(0, 120, P).astype(np.int32)
    ts_shared = np.minimum(rng.integers(1, 40, P), np.maximum(ns, 1))
    ts_chain = np.minimum(rng.integers(1, 40, (C, P)),
                          np.maximum(ns, 1)[None])
    w = rng.uniform(0.5, 2.0, (C, P)).astype(np.float32)
    for ts, wts in ((ts_shared, None), (ts_chain, None), (ts_chain, w)):
        dense = np.asarray(grid._data_curve_gather(
            jnp.asarray(ns), jnp.asarray(ts),
            None if wts is None else jnp.asarray(wts)))
        sparse = np.asarray(grid.data_curve_sparse(
            jnp.asarray(ns), jnp.asarray(ts),
            None if wts is None else jnp.asarray(wts), chunk=192))
        np.testing.assert_allclose(sparse, dense, rtol=1e-6, atol=1e-4)


def test_sample_a_sparse_million_pairs():
    """sample_a over > 10^6 occupied sparse pairs without densifying
    (round-3 missing #2: the getval capability at hca scale).  The
    streamed curve must match the dense gather route, and the sampler
    must run within bounded memory."""
    from libstb_tpu.samplers import hyper
    grid = agrid.make_grid(96, 32, g=16)
    rng = np.random.default_rng(4)
    C, P = 4, (1 << 20) + 17                   # non-multiple of chunk
    ns = rng.integers(2, 90, P).astype(np.int32)
    ts = np.minimum(rng.integers(1, 30, (C, P)).astype(np.int32), ns[None])
    curve_s = np.asarray(grid.data_curve_sparse(jnp.asarray(ns),
                                                jnp.asarray(ts)))
    # spot-check against the dense gather on a slice-decomposed sum
    acc = np.zeros_like(curve_s)
    for lo in range(0, P, 1 << 18):
        sl = slice(lo, min(lo + (1 << 18), P))
        acc += np.asarray(grid._data_curve_gather(
            jnp.asarray(ns[sl]), jnp.asarray(ts[:, sl])))
    np.testing.assert_allclose(curve_s, acc, rtol=1e-5, atol=1e-2)

    T = jnp.asarray(ts.sum(axis=1, dtype=np.float32).reshape(C, 1))
    a, ok = hyper.sample_a(jax.random.key(0), jnp.full((C,), 0.5),
                           grid, jnp.asarray(ns), jnp.asarray(ts),
                           T, jnp.asarray([[10.0]] * C))
    assert np.asarray(ok).all()
    assert ((np.asarray(a) > 0.0) & (np.asarray(a) < 1.0)).all()


def test_grid_tag_report_and_quit():
    """Grid-level S_tag analog (stable.h:137-138)."""
    from libstb_tpu.utils.yaps import LibstbError

    g = agrid.make_grid(48, 16, g=16, max_n=64, max_m=24, tag="word-grid")
    assert "word-grid" in g.report()
    g2 = agrid.ensure_grid(g, 60, 16)
    assert g2.tag == "word-grid"
    with pytest.raises(LibstbError, match="word-grid"):
        agrid.ensure_grid(g2, 10_000, 10, quit_on_bound=True)
