"""L2 MCMC kernel: batched derivative-free Adaptive Rejection Sampling.

Reproduces the capabilities of Gilks' ARMS as modified in lib/arms.c --
derivative-free piecewise-exponential envelope built from chords
(arms.c:268-375 ``initial``, arms.c:701-806 ``meet``), inverse-CDF
sampling of the envelope (arms.c:379-462), squeeze + rejection test with
optional Metropolis step for non-log-concave targets (arms.c:466-563),
envelope update by sorted insertion (arms.c:567-663), and the libstb
give-up-after-100-rejects guard (arms.c:221-248, error 2001).

The architecture is array-based instead of pointer-linked:

* the envelope is a fixed-capacity sorted array of (x, f) support points
  per chain (``n_max`` slots); insertion is a vectorised shift, not a
  linked-list splice;
* on interval [x_j, x_{j+1}] the upper hull is the *minimum* of the chord
  through (x_{j-1}, x_j) extended right and the chord through
  (x_{j+1}, x_{j+2}) extended left (the derivative-free construction the
  reference's ``meet`` evaluates pair-by-pair); each interval therefore
  contributes two exponential pieces split at the chords' intersection;
* all chains propose/test in lockstep inside one ``lax.while_loop`` with
  per-chain done-masks, so the whole sampler is a single fused device
  program -- no host round trips, unlike the reference's callback-per-
  density-eval design (arms.c:857-875).

The log-density callback is *batched*: it maps (C,) -> (C,) like the rest
of this package's samplers.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["ars_sample", "MAX_REJECTS"]

MAX_REJECTS = 100          # arms.c give-up counter (arms.c:221-248)
_BIG = jnp.inf


def _line(x0, y0, x1, y1, x):
    """Value at x of the line through (x0,y0),(x1,y1); safe for x1==x0."""
    dx = x1 - x0
    s = (y1 - y0) / jnp.where(dx == 0, 1.0, dx)
    return y0 + s * (x - x0), s


def _log_int_exp(y0, s, h):
    """log ∫_0^h exp(y0 + s u) du, stable for any sign/size of s*h."""
    sh = s * h
    tiny = jnp.abs(sh) < 1e-6
    safe_s = jnp.where(tiny, 1.0, s)
    # (exp(sh)-1)/s  ->  log: max(0,sh) + log1mexp-style
    pos = jnp.maximum(sh, 0.0) + jnp.log(
        jnp.abs(-jnp.expm1(-jnp.abs(sh))) / jnp.abs(safe_s))
    lin = jnp.log(jnp.maximum(h, 1e-300)) + 0.5 * sh   # sh -> 0 limit
    out = jnp.where(tiny, lin, pos)
    return y0 + jnp.where(h > 0, out, -_BIG)


def _inv_int_exp(y0, s, h, logw):
    """x in [0,h] with ∫_0^x exp(y0+su) du = exp(logw); logw <= mass."""
    sh = s * h
    tiny = jnp.abs(sh) < 1e-6
    safe_s = jnp.where(tiny, 1.0, s)
    # x = log1p(w s e^{-y0}) / s
    z = jnp.exp(jnp.minimum(logw - y0 + jnp.log(jnp.abs(safe_s)), 30.0))
    z = jnp.where(s >= 0, z, -z)
    x_gen = jnp.log1p(jnp.maximum(z, -1.0 + 1e-12)) / safe_s
    x_lin = jnp.exp(jnp.minimum(logw - y0, 30.0))
    x = jnp.where(tiny, x_lin, x_gen)
    return jnp.clip(x, 0.0, h)


def _hull_pieces(xs, fs, k, n_max: int):
    """Decompose the upper hull into 2*(n_max-1) exponential pieces.

    xs, fs: (..., P) sorted support (slots >= k hold the last point
    repeated, zero-width => zero mass).  Returns per-piece
    (start, width, y_at_start, slope, logmass), each (..., 2(P-1)).
    """
    P = n_max
    x0 = xs[..., :-1]
    x1 = xs[..., 1:]
    f0 = fs[..., :-1]
    f1 = fs[..., 1:]
    # chord through (j-1, j) extended right; first interval: none
    xl = jnp.concatenate([xs[..., :1], xs[..., :-2]], axis=-1)
    fl = jnp.concatenate([fs[..., :1], fs[..., :-2]], axis=-1)
    yl0, sl = _line(xl, fl, x0, f0, x0)        # value at x0, slope
    has_l = jnp.arange(P - 1) >= 1
    # chord through (j+1, j+2) extended left; last interval: none
    xr = jnp.concatenate([xs[..., 2:], xs[..., -1:]], axis=-1)
    fr = jnp.concatenate([fs[..., 2:], fs[..., -1:]], axis=-1)
    yr0, sr = _line(x1, f1, xr, fr, x0)        # value extrapolated to x0
    idx = jnp.arange(P - 1)
    has_r = idx < (k[..., None] - 2)
    has_l = has_l & (idx < (k[..., None] - 1))

    w = x1 - x0
    # intersection of the two lines within [0, w] (offset from x0)
    ds = sl - sr
    t = jnp.where(jnp.abs(ds) > 1e-30, (yr0 - yl0) / jnp.where(ds == 0, 1.0, ds), 0.0)
    t = jnp.clip(t, 0.0, w)
    # where only one line exists, that line covers the whole interval
    only_l = has_l & ~has_r
    only_r = has_r & ~has_l
    both = has_l & has_r
    # hull = min of lines; left piece uses the line lower at x0
    l_first = yl0 <= yr0
    yA0 = jnp.where(both, jnp.where(l_first, yl0, yr0),
                    jnp.where(only_l, yl0, yr0))
    sA = jnp.where(both, jnp.where(l_first, sl, sr),
                   jnp.where(only_l, sl, sr))
    wA = jnp.where(both, t, w)
    yB_start = yA0 + sA * wA
    sB = jnp.where(l_first, sr, sl)
    wB = jnp.where(both, w - t, 0.0)
    live = (idx < (k[..., None] - 1)) & (w > 0)
    wA = jnp.where(live, wA, 0.0)
    wB = jnp.where(live & both, wB, 0.0)

    starts = jnp.concatenate([x0, x0 + wA], axis=-1)
    widths = jnp.concatenate([wA, wB], axis=-1)
    y0s = jnp.concatenate([yA0, yB_start], axis=-1)
    slopes = jnp.concatenate([sA, sB], axis=-1)
    logm = _log_int_exp(y0s, slopes, widths)
    logm = jnp.where(widths > 0, logm, -_BIG)
    return starts, widths, y0s, slopes, logm


def _hull_at(xs, fs, k, x):
    """Upper-hull value at x (the ``eval`` side of the test step)."""
    P = xs.shape[-1]
    j = jnp.clip(jnp.searchsorted(xs, x, side="right") - 1, 0, P - 2)
    xl = xs[jnp.maximum(j - 1, 0)]
    fl = fs[jnp.maximum(j - 1, 0)]
    yl, _ = _line(xl, fl, xs[j], fs[j], x)
    xr = xs[jnp.minimum(j + 2, P - 1)]
    fr = fs[jnp.minimum(j + 2, P - 1)]
    yr, _ = _line(xs[j + 1], fs[j + 1], xr, fr, x)
    has_l = j >= 1
    has_r = j + 2 <= k - 1
    out = jnp.where(has_l & has_r, jnp.minimum(yl, yr),
                    jnp.where(has_l, yl, yr))
    return out


def _squeeze_at(xs, fs, k, x):
    """Chord (lower bound) value at x (arms.c squeeze test)."""
    P = xs.shape[-1]
    j = jnp.clip(jnp.searchsorted(xs, x, side="right") - 1, 0, P - 2)
    y, _ = _line(xs[j], fs[j], xs[j + 1], fs[j + 1], x)
    return jnp.where(j < k - 1, y, -_BIG)


def _insert(xs, fs, k, x, f, n_max: int):
    """Sorted insert of (x, f); full envelopes ignore the insert."""
    P = n_max
    j = jnp.searchsorted(xs, x, side="left").astype(jnp.int32)
    idx = jnp.arange(P)
    src = jnp.where(idx < j, idx, idx - 1)
    xs_new = jnp.where(idx < j, xs, jnp.where(idx == j, x, xs[src]))
    fs_new = jnp.where(idx < j, fs, jnp.where(idx == j, f, fs[src]))
    ok = k < P
    xs = jnp.where(ok, xs_new, xs)
    fs = jnp.where(ok, fs_new, fs)
    return xs, fs, k + ok.astype(k.dtype)


def ars_sample(logpost: Callable, key, lo, hi, x_prev=None,
               n_init: int = 5, n_max: int = 16,
               max_rejects: int = MAX_REJECTS, metropolis: bool = False,
               with_info: bool = False):
    """Batched derivative-free ARS / ARMS step.

    Args:
      logpost: batched log density, (C,) -> (C,).
      lo, hi: (C,) or scalar bounds (the reference's xl/xr).
      x_prev: (C,) previous value -- required when ``metropolis`` (the
        ARMS chain state, arms.c:129-151); also used as a mid support
        point when given.
      n_init: initial envelope points (arms_simple uses 3; ninit<=17
        allowed, arms.c:104-117).
      n_max: envelope capacity (reference: npoint, typically 100; chords
        converge fast so 16 suffices -- extra inserts are dropped).
      metropolis: apply the ARMS Metropolis correction (do_metro,
        arms.c:156-160) making the step exact for non-log-concave targets.

    Returns:
      (x, ok): accepted draws and per-chain success mask (False = hit the
      reject cap, the reference's error 2001; the returned x is then the
      last envelope draw, clamped to bounds).  With ``with_info``:
      (x, ok, neval) where neval is the per-chain density-evaluation
      count -- the reference's efficiency telemetry (arms.c:24,151,
      BASELINE.md row 8): n_init envelope evals + 1 warm-start eval +
      one per rejection round until acceptance.
    """
    lo = jnp.asarray(lo)
    hi = jnp.broadcast_to(jnp.asarray(hi, lo.dtype), lo.shape)
    lo = jnp.broadcast_to(lo, hi.shape)
    dt = lo.dtype
    C = lo.shape
    P = n_max

    # -- initial envelope: n_init points spanning [lo, hi] -----------------
    # the first/last points sit (almost) on the bounds so the hull pieces
    # cover the whole domain (the reference anchors its envelope at xl/xr,
    # arms.c:281-299)
    frac = jnp.arange(n_init, dtype=dt) / (n_init - 1.0)
    frac = 1e-6 + (1.0 - 2e-6) * frac
    xs0 = lo[..., None] + (hi - lo)[..., None] * frac          # (C, I)
    if x_prev is not None and not metropolis:
        # seed the envelope at the previous value -- a warm start like the
        # reference's xprev handling (arms.c:143-151).  NOT done in
        # Metropolis mode: the MH ratio below assumes an independence
        # proposal, so the envelope must not depend on the current state.
        xp = jnp.clip(jnp.asarray(x_prev, dt), lo + 1e-9, hi - 1e-9)
        mid = n_init // 2
        xs0 = xs0.at[..., mid].set(xp)
        xs0 = jnp.sort(xs0, axis=-1)
    fs0 = _eval_batched(logpost, xs0)
    pad = jnp.broadcast_to(xs0[..., -1:], C + (P - n_init,))
    fpad = jnp.broadcast_to(fs0[..., -1:], C + (P - n_init,))
    xs = jnp.concatenate([xs0, pad], axis=-1)
    fs = jnp.concatenate([fs0, fpad], axis=-1)
    k = jnp.full(C, n_init, jnp.int32)

    x_cur = xs0[..., n_init // 2] if x_prev is None else jnp.clip(
        jnp.asarray(x_prev, dt), lo, hi)
    f_cur = logpost(x_cur)

    def sample_env(key, xs, fs, k):
        starts, widths, y0s, slopes, logm = _hull_pieces(xs, fs, k, P)
        norm = jax.nn.logsumexp(logm, axis=-1, keepdims=True)
        key, kg, ku = jax.random.split(key, 3)
        g = jax.random.gumbel(kg, logm.shape, dt)
        piece = jnp.argmax(logm - norm + g, axis=-1)
        take = lambda a: jnp.take_along_axis(a, piece[..., None], -1)[..., 0]
        u = jax.random.uniform(ku, k.shape, dt, 1e-12, 1.0)
        logw = take(logm) + jnp.log(u)
        off = _inv_int_exp(take(y0s), take(slopes), take(widths), logw)
        x = take(starts) + off
        h = take(y0s) + take(slopes) * off
        return key, jnp.clip(x, lo, hi), h

    def cond(st):
        done, tries = st[0], st[1]
        return (~jnp.all(done)) & (tries < max_rejects)

    def body(st):
        done, tries, key, xs, fs, k, x_out, x_cur, f_cur, ok, nev = st
        key, x, h = sample_env(key, xs, fs, k)
        key, ka, km = jax.random.split(key, 3)
        u = jax.random.uniform(ka, k.shape, dt, 1e-12, 1.0)
        sq = _eval2(_squeeze_at, xs, fs, k, x)
        # squeeze accept avoids the density eval in the reference
        # (arms.c:490-500); evaluating is harmless and keeps lockstep.
        f = logpost(x)
        accept = jnp.log(u) <= (f - h)
        if metropolis:
            # ARMS correction (arms.c:509-563)
            h_cur = _eval2(_hull_at, xs, fs, k, x_cur)
            um = jax.random.uniform(km, k.shape, dt, 1e-12, 1.0)
            ratio = (f + jnp.minimum(f_cur, h_cur)
                     - f_cur - jnp.minimum(f, h))
            keep_new = jnp.log(um) <= jnp.minimum(ratio, 0.0)
            x_acc = jnp.where(keep_new, x, x_cur)
            f_acc = jnp.where(keep_new, f, f_cur)
        else:
            x_acc, f_acc = x, f
        newly = accept & ~done
        x_out = jnp.where(newly, x_acc, x_out)
        ok = ok | newly
        # rejected points refine the envelope (arms.c:567-663)
        ins = (~accept) & (~done)
        xs2, fs2, k2 = jax.vmap(_insert, in_axes=(0, 0, 0, 0, 0, None))(
            xs.reshape((-1, P)), fs.reshape((-1, P)), k.reshape(-1),
            x.reshape(-1), f.reshape(-1), P)
        xs = jnp.where(ins.reshape((-1, 1)), xs2, xs.reshape((-1, P))
                       ).reshape(xs.shape)
        fs = jnp.where(ins.reshape((-1, 1)), fs2, fs.reshape((-1, P))
                       ).reshape(fs.shape)
        k = jnp.where(ins, k2.reshape(k.shape), k)
        nev = nev + (~done).astype(nev.dtype)  # still-sampling chains
        done = done | accept
        return (done, tries + 1, key, xs, fs, k, x_out,
                jnp.where(newly, x_acc, x_cur),
                jnp.where(newly, f_acc, f_cur), ok, nev)

    nev0 = jnp.full(C, n_init + 1, jnp.int32)  # envelope + warm start
    st = (jnp.zeros(C, bool), jnp.array(0), key, xs, fs, k,
          x_cur, x_cur, f_cur, jnp.zeros(C, bool), nev0)
    st = jax.lax.while_loop(cond, body, st)
    if with_info:
        return st[6], st[9], st[10]
    return st[6], st[9]


def _eval_batched(logpost, xs0):
    """Apply a (C,)->(C,) batched logpost across the support axis."""
    return jax.vmap(logpost, in_axes=-1, out_axes=-1)(xs0)


def _eval2(fn, xs, fs, k, x):
    """vmap a per-chain scalar helper over the chain axes."""
    P = xs.shape[-1]
    flat = jax.vmap(fn)(xs.reshape((-1, P)), fs.reshape((-1, P)),
                        k.reshape(-1), x.reshape(-1))
    return flat.reshape(x.shape)
