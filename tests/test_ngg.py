"""NGG generalized-Stirling subsystem vs scipy / quadrature oracles
(the test/ngg_test.c + test/ngg_integral.cpp validation methodology)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import gammaincc, gamma as _gamma

from libstb_tpu.core import ngg, quadrature

A, M = 0.1, 10.0       # the reference's p_a, p_M (ngg_test.c:506)


def test_gamma_inc_cf_vs_scipy():
    for s, x in [(2.5, 3.0), (0.5, 10.0), (5.0, 1.0), (1.0, 0.5)]:
        got = float(ngg.log_gamma_inc_upper(s, x))
        want = np.log(gammaincc(s, x) * _gamma(s))
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_gamma_inc_negative_s_recurrence():
    # Gamma(s, x) = (Gamma(s+1, x) - x^s e^-x) / s  checks negative-s CF
    x = 10.0
    for s in [-0.5, -3.7, -20.0]:
        g1 = np.exp(float(ngg.log_gamma_inc_upper(s + 1.0, x)))
        gs = np.exp(float(ngg.log_gamma_inc_upper(s, x)))
        np.testing.assert_allclose(gs, (g1 - x ** s * np.exp(-x)) / s,
                                   rtol=1e-9, err_msg=f"s={s}")


def test_table_vs_quadrature():
    # (16,10) is excluded: at a=0.1 the alternating binomial sum loses
    # ~12 digits there and f64 (vs the reference's 64-bit-mantissa long
    # double) no longer tracks the quadrature oracle; the ratio table
    # (quadrature-seeded) is the supported large-(n,k) path.
    N, K = 16, 10
    tab = np.asarray(ngg.ngg_table(A, M, N, K))
    for (n, k) in [(10, 3), (14, 5), (15, 1), (12, 8)]:
        q = float(ngg.ngg_quadrature_log(A, M, n, k))
        np.testing.assert_allclose(tab[k - 1, n - 1], q, rtol=0, atol=2e-4,
                                   err_msg=f"n={n} k={k}")


def test_saddle_point_accuracy():
    # umax approximates the table within the Gaussian-approx error the
    # reference main() displays side by side (ngg_test.c:517-527)
    N, K = 16, 10
    tab = np.asarray(ngg.ngg_table(A, M, N, K))
    for (n, k) in [(10, 3), (14, 5), (12, 8)]:
        u = float(ngg.umax_log(A, M, n, k))
        assert abs(u - tab[k - 1, n - 1]) < 0.1, (n, k)


def test_ratio_table_matches_diffs():
    N, K = 14, 7
    tab = np.asarray(ngg.ngg_table(A, M, N, K))
    R = np.asarray(ngg.ngg_ratio_table(A, M, N, K))
    for k in range(1, K + 1):
        for n in range(k, N):
            want = np.exp(tab[k - 1, n] - tab[k - 1, n - 1])
            np.testing.assert_allclose(R[k - 1, n - 1], want, rtol=1e-7,
                                       err_msg=f"k={k} n={n}")


def test_ratio_table_large_n_stable():
    # auto switches to the quadrature method at large n, which stays
    # finite and positive far beyond where the alternating sum dies
    R = np.asarray(ngg.ngg_ratio_table(0.3, 5.0, 200, 12))
    valid = R[:, 50:]
    assert np.isfinite(valid).all()
    assert (valid[11][60:] > 0).all()
    # and agrees with the recurrence in the small-n overlap
    Rs = np.asarray(ngg.ngg_ratio_table(0.3, 5.0, 20, 6,
                                        method="recurrence"))
    Rq = np.asarray(ngg.ngg_ratio_table(0.3, 5.0, 20, 6,
                                        method="quadrature"))
    # tolerance reflects the recurrence's ~(n/a)-per-step amplification
    # of its alternating-sum base error, not quadrature error
    for k in range(1, 7):
        for n in range(k, 15):
            np.testing.assert_allclose(Rq[k - 1, n - 1], Rs[k - 1, n - 1],
                                       rtol=1e-4, err_msg=f"k={k} n={n}")


def test_tanh_sinh_known_integrals():
    # smooth: int_0^1 x^2 = 1/3; peaked: int_-1^1 exp(-50 x^2)
    v = float(quadrature.tanh_sinh(lambda x: x * x, 0.0, 1.0))
    np.testing.assert_allclose(v, 1.0 / 3.0, rtol=1e-10)
    v2 = float(quadrature.tanh_sinh(
        lambda x: jnp.exp(-50.0 * x * x), -1.0, 1.0, levels=11))
    np.testing.assert_allclose(v2, np.sqrt(np.pi / 50.0), rtol=1e-8)
    # log form on a sharp exponential
    lv = float(quadrature.tanh_sinh_log(lambda x: -100.0 * x, 0.0, 5.0))
    np.testing.assert_allclose(lv, np.log(1.0 / 100.0), rtol=1e-6)


def test_quadrature_batched():
    n = jnp.asarray([5.0, 8.0, 12.0])
    k = jnp.asarray([2.0, 3.0, 4.0])
    out = ngg.ngg_quadrature_log(jnp.full((3,), A), jnp.full((3,), M), n, k)
    for i in range(3):
        single = float(ngg.ngg_quadrature_log(A, M, float(n[i]), float(k[i])))
        np.testing.assert_allclose(float(out[i]), single, rtol=1e-10)
