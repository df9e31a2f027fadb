"""RNG facade over jax.random.

Replaces the reference's rand48 macro layer (lib/srng.h:28-34) and its
GSL-derived ziggurat/gamma/beta samplers (lib/gslrandist.c:194-282).  The
counter-based threefry keys give every chain an independent stream for
free, fixing srng.h's documented thread-unsafety (srng.h:5-6); the
distribution samplers are XLA's own (gamma via rejection, normal via
erfinv) rather than transliterations of the GPL GSL routines
(README:186-200 licensing note).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["key", "split", "unit", "gaussian", "gamma", "beta"]


def key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def split(k, n: int = 2):
    return jax.random.split(k, n)


def unit(k, shape=()):
    """Uniform(0,1) like rng_unit (srng.h:30)."""
    return jax.random.uniform(k, shape)


def gaussian(k, sigma=1.0, shape=()):
    """N(0, sigma) like gsl_rng_gaussian_ziggurat (gslrandist.c:194-234)."""
    return sigma * jax.random.normal(k, shape)


def gamma(k, a, shape=None):
    """Gamma(a, 1) like gsl_rng_gamma (gslrandist.c:236-273)."""
    a = jnp.asarray(a)
    return jax.random.gamma(k, a, shape if shape is not None else a.shape)


def beta(k, a, b, shape=None):
    """Beta(a, b) like gsl_rng_beta (gslrandist.c:275-282)."""
    a = jnp.asarray(a)
    return jax.random.beta(k, a, b, shape if shape is not None else a.shape)
