"""L2 MCMC kernel: batched shrinking-interval slice sampler.

Reproduces SliceSimple (lib/sslice.c:33-80) -- slice sampling on a
unimodal log posterior with interval shrinking toward the last accepted
point and a 200-try cap (sslice.c:24) -- as a chain-parallel
``lax.while_loop``: all chains propose in lockstep, finished chains are
masked, and the loop exits when every chain has accepted or hit the cap.
The scalar pointer-in/pointer-out protocol becomes a pure function
``(key, x0, ...) -> (x, ok)``.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["slice_sample", "TOOMANY"]

TOOMANY = 200  # sslice.c:24


def slice_sample(logpost: Callable, key, x0, lo, hi,
                 loops: int = 1, max_tries: int = TOOMANY):
    """Batched SliceSimple.

    Args:
      logpost: batched log-density, maps x of shape ``x0.shape`` to the
        same shape.  (Log scale, like post() in sslice.c:28.)
      key: PRNG key.
      x0: (C,) starting points -- should be near the mode (sslice.c:26-27).
      lo, hi: scalar or (C,) bounds.
      loops: outer burn-in loops (sslice.c:47).
      max_tries: shrink cap per loop; chains that exhaust it keep their
        current value and report ok=False (the reference exits(1),
        sslice.c:72-77 -- a host-level policy the caller can apply).

    Returns:
      (x, ok): accepted points and per-chain success flags.
    """
    x0 = jnp.asarray(x0)
    dt = x0.dtype
    lo = jnp.broadcast_to(jnp.asarray(lo, dt), x0.shape)
    hi = jnp.broadcast_to(jnp.asarray(hi, dt), x0.shape)
    ok0 = jnp.ones(x0.shape, bool)

    def one_loop(carry, _):
        x, ok, key = carry
        key, ky = jax.random.split(key)
        y = logpost(x) + jnp.log(jax.random.uniform(ky, x.shape, dt))

        def cond(state):
            _, _, _, done, tries, _ = state
            return jnp.logical_and(~jnp.all(done), tries < max_tries)

        def body(state):
            xp, rlo, rhi, done, tries, k = state
            k, ku = jax.random.split(k)
            u = jax.random.uniform(ku, xp.shape, dt)
            xprop = rlo + u * (rhi - rlo)
            fp = logpost(xprop)
            accept = fp > y
            live = ~done
            # shrink toward the last accepted point (sslice.c:62-68)
            rlo = jnp.where(live & ~accept & (xprop < xp), xprop, rlo)
            rhi = jnp.where(live & ~accept & (xprop >= xp), xprop, rhi)
            xp = jnp.where(live & accept, xprop, xp)
            done = done | accept
            return xp, rlo, rhi, done, tries + 1, k

        state = (x, lo, hi, jnp.zeros(x.shape, bool), jnp.array(0), key)
        xp, _, _, done, _, key = jax.lax.while_loop(cond, body, state)
        return (xp, ok & done, key), None

    (x, ok, _), _ = jax.lax.scan(one_loop, (x0, ok0, key), None, length=loops)
    return x, ok
