"""Pallas fill kernel vs the lax.scan fill and the f64 oracle.

Runs the kernel in interpreter mode on CPU (the real-TPU run is covered
by bench.py and the verify flow); correctness criteria mirror
test/precision_test.c's float-vs-double methodology.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libstb_tpu.core import stirling
from libstb_tpu.ops import stirling_pallas as sp


@pytest.fixture(scope="module")
def filled():
    avec = np.linspace(0.0, 0.9, 8)
    N, M = 160, 48
    vt, sr = sp.fill_grid(jnp.asarray(avec, jnp.float32), N, M,
                          row_block=32, interpret=True)
    return avec, N, M, np.asarray(vt), np.asarray(sr)


def test_v_matches_f64(filled):
    avec, N, M, vt, _ = filled
    for gi, a in enumerate(avec):
        v64, _, _ = stirling.fill_rows(float(a), N, M, dtype=jnp.float64)
        v64 = np.asarray(v64)
        live = np.isfinite(v64) & (v64 > 0)
        np.testing.assert_allclose(vt[gi][live], v64[live], rtol=2e-5,
                                   err_msg=f"a={a}")
        # above-diagonal cells carry only the ~1e-30 recip-chain sentinel
        # residue (masked to 0 by V() queries)
        assert np.abs(vt[gi][np.isfinite(v64) & (v64 == 0)]).max() < 1e-25


def test_srel_matches_f64(filled):
    avec, N, M, _, sr = filled
    for gi, a in enumerate(avec):
        _, s64, _ = stirling.fill_rows(float(a), N, M, dtype=jnp.float64)
        s64 = np.asarray(s64)
        fin = np.isfinite(s64)
        assert np.max(np.abs(sr[gi][fin] - s64[fin])) < 1e-4, f"a={a}"
        # -inf pattern (m > n) must match exactly
        np.testing.assert_array_equal(np.isneginf(sr[gi]), np.isneginf(s64))


def test_diagonal_is_minus_s1(filled):
    # srel(n, n) = -S1(n): the kernel's in-register Kahan S1 accumulator
    avec, N, M, _, sr = filled
    for gi, a in enumerate(avec):
        s1 = stirling.s1_host(float(a), M)
        diag = np.array([sr[gi][n - 1, n - 1] for n in range(2, M + 1)])
        np.testing.assert_allclose(diag, -s1[1:], atol=2e-5)


def test_row_padding_trimmed():
    vt, sr = sp.fill_grid(jnp.asarray([0.5], jnp.float32), 50, 16,
                          row_block=16, interpret=True)
    assert vt.shape == (1, 50, 16) and sr.shape == (1, 50, 16)


def test_nosrel_path():
    vt, sr = sp.fill_grid(jnp.asarray([0.3, 0.6], jnp.float32), 64, 16,
                          row_block=16, with_srel=False, interpret=True)
    assert sr is None
    v64, _, _ = stirling.fill_rows(0.3, 64, 16, dtype=jnp.float64)
    v64 = np.asarray(v64)
    live = np.isfinite(v64) & (v64 > 0)
    np.testing.assert_allclose(np.asarray(vt)[0][live], v64[live], rtol=2e-5)


@pytest.fixture(scope="module")
def filled_single():
    N, M = 200, 64
    vt, sr = sp.fill_table(0.4321, N, M, row_block=32, interpret=True)
    return N, M, np.asarray(vt), np.asarray(sr)


def test_folded_v_matches_f64(filled_single):
    N, M, vt, _ = filled_single
    v64, _, _ = stirling.fill_rows(0.4321, N, M, dtype=jnp.float64)
    v64 = np.asarray(v64)
    live = np.isfinite(v64) & (v64 > 0)
    np.testing.assert_allclose(vt[live], v64[live], rtol=2e-5)
    assert np.abs(vt[np.isfinite(v64) & (v64 == 0)]).max() < 1e-25


def test_folded_srel_matches_f64(filled_single):
    N, M, _, sr = filled_single
    _, s64, _ = stirling.fill_rows(0.4321, N, M, dtype=jnp.float64)
    s64 = np.asarray(s64)
    fin = np.isfinite(s64)
    assert np.max(np.abs(sr[fin] - s64[fin])) < 1e-4
    np.testing.assert_array_equal(np.isneginf(sr), np.isneginf(s64))


def test_folded_matches_grid_kernel():
    """The folded single-table route must agree with the grid route --
    same recurrence, different sublane layout.  The folded kernel carries
    the (n-1 - m a) coefficients incrementally and computes Srel via the
    log-ratio form (see _kernel_folded docstring), so agreement is to a
    few f32 ulps, not bit-exact."""
    vt1, sr1 = sp.fill_table(0.55, 96, 32, row_block=16, interpret=True)
    vt8, sr8 = sp.fill_grid(jnp.asarray([0.55], jnp.float32), 96, 32,
                            row_block=16, interpret=True)
    fin = np.isfinite(np.asarray(sr8[0]))
    np.testing.assert_allclose(np.asarray(vt1), np.asarray(vt8[0]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sr1)[fin], np.asarray(sr8[0])[fin],
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Column-sequential chunked-parallel-scan kernel (fill_table_cols)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("a,N,M,chunks", [
    (0.4321, 200, 64, 128),     # N not a multiple of chunks
    (0.55, 512, 48, 256),       # two sublanes of chunks
    (0.05, 384, 32, 128),       # small discount
    (0.0, 256, 24, 128),        # a == 0 (DP limit)
])
def test_cols_matches_f64(a, N, M, chunks):
    vt_p, sr_p, n_pad = sp.fill_table_cols(a, N, M, chunks=chunks,
                                           interpret=True)
    vt = np.asarray(sp.unfold_cols(vt_p, N, chunks))
    sr = np.asarray(sp.unfold_cols(sr_p, N, chunks))
    v64, s64, _ = stirling.fill_rows(a, N, M, dtype=jnp.float64)
    v64 = np.asarray(v64); s64 = np.asarray(s64)
    fin = np.isfinite(v64) & (v64 != 0)
    np.testing.assert_allclose(vt[fin], v64[fin], rtol=3e-5,
                               err_msg=f"a={a}")
    finS = np.isfinite(s64)
    # scaled tolerance: the along-m accumulation inherits XLA's f32 log
    # accuracy (~1e-4 relative; see .claude/skills/verify gotchas) -- the
    # tight absolute accuracy claim is measured on-device against the
    # long-double oracle instead (test_native / BASELINE notes)
    err = np.abs(sr[finS] - s64[finS]) / np.maximum(1.0, np.abs(s64[finS]))
    assert np.max(err) < 1e-4, f"a={a}"
    # above-diagonal cells: V == 0 exactly (the affine-map reset), srel -inf
    above = ~np.isfinite(s64)
    np.testing.assert_array_equal(vt[above], 0.0)
    assert np.all(np.isneginf(sr[above]))


def test_cols_scan_pos_layout():
    """tab_perm[j, scan_pos(i)] must equal the unfolded natural [i, j]."""
    N, M, chunks = 200, 16, 128
    vt_p, _, n_pad = sp.fill_table_cols(0.3, N, M, chunks=chunks,
                                        interpret=True)
    vt = np.asarray(sp.unfold_cols(vt_p, N, chunks))
    vt_flat = np.asarray(vt_p).reshape(vt_p.shape[0], -1)
    H = n_pad // chunks
    for i in (0, 1, 5, 127, 128, 199):
        pos = sp.scan_pos(i, n_pad, chunks)
        np.testing.assert_array_equal(vt_flat[:, pos], vt[i, :])
        # 4-D decomposition used by StirlingTable._cell
        c = i // H
        np.testing.assert_array_equal(
            np.asarray(vt_p)[:, i % H, c // 128, c % 128], vt[i, :])


def test_cols_diagonal_is_minus_s1():
    """srel(n, n) = -S1(n): the along-m accumulation of log V must hit the
    exact diagonal identity (sum_{j=2..n} log V(n,j) = -S1(n))."""
    N, M, chunks = 256, 48, 128
    _, sr_p, _ = sp.fill_table_cols(0.4321, N, M, chunks=chunks,
                                    interpret=True)
    sr = np.asarray(sp.unfold_cols(sr_p, N, chunks))
    s1 = stirling.s1_host(0.4321, M)
    diag = np.array([sr[n - 1, n - 1] for n in range(2, M + 1)])
    np.testing.assert_allclose(diag, -s1[1:], atol=5e-4)


def test_cols_nokahan_and_nosrel():
    vt_p, sr_p, _ = sp.fill_table_cols(0.5, 256, 32, chunks=128,
                                       kahan=False, interpret=True)
    _, s64, _ = stirling.fill_rows(0.5, 256, 32, dtype=jnp.float64)
    sr = np.asarray(sp.unfold_cols(sr_p, 256, 128))
    s64 = np.asarray(s64)
    fin = np.isfinite(s64)
    assert np.max(np.abs(sr[fin] - s64[fin])) < 2e-3   # plain f32 sum
    vt_only, none_sr, _ = sp.fill_table_cols(0.5, 256, 32, chunks=128,
                                             with_srel=False, interpret=True)
    assert none_sr is None
    np.testing.assert_allclose(np.asarray(vt_only), np.asarray(vt_p),
                               rtol=1e-6)
