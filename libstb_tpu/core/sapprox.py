"""Closed-form approximations for log S^n_{m,a}, m <= 4.

Reproduces lib/sapprox.c:28-114: exact at a==0, good estimates for small a,
via lgamma differences g_k = lgamma(n - k a) - lgamma(1 - k a), plus the
d/da derivative used for gradient-based samplers.  All functions are
vectorised over (n, m, a) and jit/vmap-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import special

__all__ = ["s_approx", "s_approx_da"]


def _g(n, k, a):
    return jax.lax.lgamma(n - k * a) - jax.lax.lgamma(1.0 - k * a)


def s_approx(n, m, a):
    """log S^n_{m,a} for m<=4 (sapprox.c:28-71).

    The a<0.001 polygamma branch (sapprox.c:37-50) and the a>0 lgamma-diff
    branch (sapprox.c:52-68) are both computed and selected per element.
    Returns 0 for n==m, -inf for n<m or m>4.
    """
    n = jnp.asarray(n, jnp.result_type(float))
    m = jnp.asarray(m)
    a = jnp.asarray(a, n.dtype)
    mf = m.astype(n.dtype)

    # lgamma(1 - k a) may see negative arguments for larger a; both C lgamma
    # and XLA lgamma compute log|Gamma| there, matching the reference.
    ga = _g(n, 1.0, a)
    g2a = _g(n, 2.0, a)
    g3a = _g(n, 3.0, a)
    g4a = _g(n, 4.0, a)

    la = jnp.log(jnp.where(a > 0, a, 1.0))
    m2 = g2a - la + special.log1mexp(-(ga - g2a)) + (ga - g2a)
    # ^ log(exp(ga-g2a)-1) = (ga-g2a) + log(1-exp(-(ga-g2a)))
    d3 = jnp.log(
        jnp.maximum(jnp.exp(ga - g3a) - 2.0 * jnp.exp(g2a - g3a) + 1.0,
                    jnp.finfo(n.dtype).tiny))
    m3 = g3a - 2.0 * la - jnp.log(2.0) + d3
    d4 = jnp.log(
        jnp.maximum(jnp.exp(ga - g4a) - 3.0 * jnp.exp(g2a - g4a)
                    + 3.0 * jnp.exp(g3a - g4a) - 1.0,
                    jnp.finfo(n.dtype).tiny))
    m4 = g4a - 3.0 * la - jnp.log(6.0) + d4

    # a ~ 0 polygamma forms (exact at a==0), sapprox.c:37-50
    dg = special.digamma(n - a) - special.digamma(1.0 - a)
    tg = special.trigamma(n - a) - special.trigamma(1.0 - a)
    qg = special.tetragamma(n - a) - special.tetragamma(1.0 - a)
    z2 = ga + jnp.log(dg)
    z3 = ga - jnp.log(2.0) + jnp.log(tg + dg * dg)
    z4 = ga - jnp.log(6.0) + jnp.log(qg + 3.0 * tg * dg + dg * dg * dg)

    small_a = a < 0.001
    v2 = jnp.where(small_a, z2, m2)
    v3 = jnp.where(small_a, z3, m3)
    v4 = jnp.where(small_a, z4, m4)

    out = jnp.where(m == 1, ga,
          jnp.where(m == 2, v2,
          jnp.where(m == 3, v3,
          jnp.where(m == 4, v4, -jnp.inf))))
    out = jnp.where(n == mf, jnp.zeros((), n.dtype), out)
    return jnp.where(n < mf, -jnp.inf, out)


def s_approx_da(n, m, a):
    """d/da log S^n_{m,a} for m<=4 (sapprox.c:76-114)."""
    n = jnp.asarray(n, jnp.result_type(float))
    m = jnp.asarray(m)
    a = jnp.asarray(a, n.dtype)
    mf = m.astype(n.dtype)

    snm = s_approx(n, m, a)
    ga = _g(n, 1.0, a)
    g2a = _g(n, 2.0, a)
    g3a = _g(n, 3.0, a)
    g4a = _g(n, 4.0, a)
    dga = -(special.digamma(n - a) - special.digamma(1.0 - a))
    dg2a = -2.0 * (special.digamma(n - 2 * a) - special.digamma(1.0 - 2 * a))
    dg3a = -3.0 * (special.digamma(n - 3 * a) - special.digamma(1.0 - 3 * a))
    dg4a = -4.0 * (special.digamma(n - 4 * a) - special.digamma(1.0 - 4 * a))

    safe_a = jnp.where(a > 0, a, 1.0)
    r1 = dga  # d/da [lgamma(n-a)-lgamma(1-a)] = -(psi(n-a)-psi(1-a)) = dga
    r2 = (jnp.exp(ga - snm) * dga - jnp.exp(g2a - snm) * dg2a - 1.0) / safe_a
    r3 = (-2.0 / safe_a
          + (jnp.exp(ga - snm) * dga - 2.0 * jnp.exp(g2a - snm) * dg2a
             + jnp.exp(g3a - snm) * dg3a) / 2.0 / safe_a / safe_a)
    # NOTE: the reference divides the m==4 bracket by 3a^3 (sapprox.c:111),
    # but S(n,4) = (e^ga - 3e^g2a + 3e^g3a - e^g4a)/(6 a^3), so the correct
    # factor is 6a^3 (finite differences confirm; the reference's m==3 case
    # correctly uses its 2a^2).  We implement the correct derivative.
    r4 = (-3.0 / safe_a
          + (jnp.exp(ga - snm) * dga - 3.0 * jnp.exp(g2a - snm) * dg2a
             + 3.0 * jnp.exp(g3a - snm) * dg3a - jnp.exp(g4a - snm) * dg4a)
          / 6.0 / safe_a / safe_a / safe_a)

    out = jnp.where(m == 1, r1,
          jnp.where(m == 2, r2,
          jnp.where(m == 3, r3,
          jnp.where(m == 4, r4, -jnp.inf))))
    out = jnp.where(n == mf, jnp.zeros((), n.dtype), out)
    return jnp.where(n < mf, -jnp.inf, out)
