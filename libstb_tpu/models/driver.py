"""Gibbs-run driver: the main-loop analog of test/demo.c:405-519 and
test/check.c:715-1027, batched over chains.

One jitted composite step = sweep + optional (b, a) hyper updates; the
iteration loop runs as a lax.scan with in-graph statistics accumulation
(burn-in masked), so a whole run is a single device program.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import agrid
from ..samplers import hyper
from . import pyp

__all__ = ["GibbsConfig", "run_gibbs", "run_gibbs_timed"]


@dataclasses.dataclass(frozen=True)
class GibbsConfig:
    """demo.c getopt flags as a config object (SURVEY.md §5.6 tier 3)."""
    iters: int = 200          # -C
    burnin: int = 0           # -B (0 -> iters//2, demo.c:222-226)
    bcycle: int = 0           # -H
    acycle: int = 0           # -I
    sampler: str = "TI"       # -S (TI | CT | CTW | HSA)
    window: int = 10          # -w
    maxrel: float = 0.0       # -c: CT candidate early-stop bound
                              # (check.c:289,893); 0 = off (the
                              # reference default 1e30 is equivalent)
    shape: float = 1.1        # PB_shape (demo.c:73)
    scale: float = 20.0       # PB_scale = DIM (demo.c:74)
    b_groups: int = 1         # demo.c passes I=1 to sampleb (demo.c:454)
    ti_legacy: bool = False   # reproduce demo.c:427's t/(n-t+1) odds
    ti_skip_first: bool = True  # False = demo.c resamples first indicators
    ti_blocked: bool = True   # TI as the EXACT group-major reordering
                              # (ti_sweep_blocked mode="group": one item
                              # of every group per scan step -- groups
                              # are independent restaurants, so the
                              # composed kernel is identical and the
                              # scan shrinks from L items to the max
                              # group size); False = the reference's
                              # item-sequential order
    collect_traces: bool = False  # keep (a, b) per-iter traces + R-hat/ESS
    kernel: str = "slice"     # 1-D MCMC kernel for (a, b): "slice" | "ars"
                              # (the -A / PSAMPLE_ARS switch, check.c:283)
    quit_on_bound: bool = False  # S_QUITONBOUND: raise instead of
                              # clamping when preflight growth hits the
                              # grid's hard bounds (stable.h:32-33)

    def resolved_burnin(self) -> int:
        return self.burnin if self.burnin > 0 else self.iters // 2


def run_gibbs(key, data: pyp.PYPData, grid: agrid.AGridTable,
              chains: int, a0: float, b0: float, cfg: GibbsConfig):
    """Run the full Gibbs chain ensemble; returns posterior-mean stats.

    Statistics mirror demo.c:493-519: time-averaged t, T (post burn-in)
    per chain, plus a/b averages when sampled; all additionally averaged
    over the chain ensemble in the returned "*_mean" entries.

    The whole run is one cached jit program: repeated calls with the same
    (cfg, chains, data shapes) reuse the compilation -- the warm-start
    behaviour check.c gets from being one S binary.

    The grid is grown up front to cover every query the run can make
    (S_extend-on-demand, stable.c:564-815, done preflight: t <= n per
    category and the sweeps query V(n, t+1)/Srel(n, tt<=n), so the data
    maxima bound all queries; in-graph, out-of-grid queries would fall to
    the asymptote instead of extending).
    """
    n_req, m_req = agrid.required_dims(data.n)
    grid = agrid.ensure_grid(grid, n_req, m_req,
                             quit_on_bound=cfg.quit_on_bound)
    dt = grid.srel.dtype
    t, T = pyp.init_state(data, chains)
    hsa = cfg.sampler.upper() == "HSA"
    hist0 = pyp.init_hsa(data, chains)[0] if hsa else None
    a = jnp.full((chains,), a0, dt)
    b = jnp.full((chains,), b0, dt)
    tmax = int(data.n.max()) + 1
    sched = (jnp.asarray(pyp.ti_schedule(data, "group"))
             if cfg.sampler.upper() == "TI" and cfg.ti_blocked else None)
    return _run_gibbs_jit(key, data, grid, t, T, hist0, a, b, sched,
                          chains=chains, cfg=cfg, tmax=tmax,
                          burnin=cfg.resolved_burnin())


def run_gibbs_timed(key, data: pyp.PYPData, grid: agrid.AGridTable,
                    chains: int, a0: float, b0: float, cfg: GibbsConfig,
                    iter_ms: Optional[float] = None,
                    burnin_ms: Optional[float] = None,
                    chunk: int = 16, progress=None):
    """Wall-clock-bounded Gibbs run (check.c's '-C Nms' / '-B Nms' modes,
    check.c:380-393, 1028-1054).

    Runs jitted chunks of ``chunk`` iterations, carrying state across
    calls; burn-in ends when ``burnin_ms`` elapses (or cfg's burn-in
    count), sampling stops when ``iter_ms`` elapses (or cfg.iters).
    The first chunk's compile time is excluded, like check.c's timer
    starting after S_make.  Returns run_gibbs-style statistics plus
    ``iters_done``/``burnin_done``.

    ``progress``: optional callable, called after every post-burn-in
    chunk with (iters_done, elapsed_ms, running_means dict) -- the
    '-p repcyc' running-mean reporting of check.c:996-1010 (set
    ``chunk`` to repcyc for the same cadence).
    """
    import math
    import time

    n_req, m_req = agrid.required_dims(data.n)
    grid = agrid.ensure_grid(grid, n_req, m_req,
                             quit_on_bound=cfg.quit_on_bound)
    dt = grid.srel.dtype
    # align the chunk so in-chunk cycle phases match the global schedule:
    # round up to lcm(bcycle, acycle) (check.c's ITER adjustment,
    # check.c:436-440) -- sequential per-cycle rounding could break the
    # first alignment while fixing the second
    cycles = [c for c in (cfg.bcycle, cfg.acycle) if c > 0]
    if cycles:
        period = math.lcm(*cycles)
        chunk = math.ceil(chunk / period) * period
    t, T = pyp.init_state(data, chains)
    hsa = cfg.sampler.upper() == "HSA"
    hist = pyp.init_hsa(data, chains)[0] if hsa else None
    a = jnp.full((chains,), a0, dt)
    b = jnp.full((chains,), b0, dt)
    tmax = int(data.n.max()) + 1
    sched = (jnp.asarray(pyp.ti_schedule(data, "group"))
             if cfg.sampler.upper() == "TI" and cfg.ti_blocked else None)
    ccfg = dataclasses.replace(cfg, iters=chunk, burnin=0,
                               collect_traces=False)

    def one_chunk(key, t, T, hist, a, b, iters=None):
        c = ccfg if iters is None or iters == chunk else (
            dataclasses.replace(ccfg, iters=iters))
        out = _run_gibbs_jit(key, data, grid, t, T, hist, a, b, sched,
                             chains=chains, cfg=c, tmax=tmax, burnin=0)
        st = out["hist"] if hsa else out["t"]
        return out, st, out["T"], out["a"], out["b"]

    # warm the compile cache off the clock (check.c times after S_make)
    key, kw = jax.random.split(key)
    out, *_ = one_chunk(kw, t, T, hist, a, b)
    jax.block_until_ready(out["Tave"])

    sums = None
    kept = 0
    done = 0
    step_iters = chunk          # loop may not run at all (cfg.iters == 0)
    burnin_done = None
    start = time.perf_counter()
    max_iters = cfg.iters if iter_ms is None else 10 ** 9
    burnin = cfg.resolved_burnin() if burnin_ms is None else None
    while done < max_iters:
        # count mode: clamp the last chunk so iters_done == cfg.iters
        # (one extra compile only when iters % chunk != 0)
        step_iters = chunk if iter_ms is not None else min(
            chunk, max_iters - done)
        key, kc = jax.random.split(key)
        out, st, T, a, b = one_chunk(kc, t, T, hist, a, b, step_iters)
        if hsa:
            hist, t = st, out["t"]
        else:
            t = st
        jax.block_until_ready(out["Tave"])
        done += step_iters
        el_ms = (time.perf_counter() - start) * 1e3
        in_burn = (el_ms <= burnin_ms if burnin_ms is not None
                   else done <= burnin)
        if not in_burn:
            if burnin_done is None:
                burnin_done = done - step_iters
            # out[*ave] are per-chunk means: weight by chunk size so a
            # clamped final chunk doesn't skew the global average
            vals = [np.asarray(out[k]) * step_iters for k in
                    ("tave", "Tave", "aave", "bave")]
            sums = vals if sums is None else [s + v for s, v in
                                              zip(sums, vals)]
            kept += step_iters
            if progress is not None:
                rm = [s / kept for s in sums]
                progress(done, el_ms, dict(
                    Tave_mean=float(np.mean(rm[1].sum(axis=-1))),
                    aave_mean=float(np.mean(rm[2])),
                    bave_mean=float(np.mean(rm[3]))))
        if iter_ms is not None and el_ms > iter_ms:
            break
    if sums is None:         # budget exhausted inside burn-in
        sums = [np.asarray(out[k]) for k in ("tave", "Tave", "aave",
                                             "bave")]
        kept = 1
        burnin_done = done - step_iters
    tave, Tave, aave, bave = [s / kept for s in sums]
    return dict(tave=tave, Tave=Tave, aave=aave, bave=bave,
                tave_mean=tave.mean(axis=0), Tave_mean=Tave.mean(axis=0),
                aave_mean=aave.mean(), bave_mean=bave.mean(),
                t=t, T=T, a=a, b=b,
                iters_done=done, burnin_done=burnin_done,
                elapsed_ms=(time.perf_counter() - start) * 1e3)


@functools.partial(jax.jit, static_argnames=("chains", "cfg", "tmax",
                                             "burnin"))
def _run_gibbs_jit(key, data, grid, t, T, hist0, a, b, sched=None, *,
                   chains: int, cfg: GibbsConfig, tmax: int, burnin: int):
    dt = grid.srel.dtype
    hsa = cfg.sampler.upper() == "HSA"
    ns_flat = jnp.asarray(data.n.reshape(-1))
    N_b = jnp.asarray(data.N[: cfg.b_groups], dt)
    sampler = cfg.sampler.upper()

    def sweep(key, t, T, a, b):
        if sampler == "TI":
            if sched is not None:
                # exact group-major reordering (see GibbsConfig.ti_blocked)
                return pyp.ti_sweep_blocked(key, t, T, a, b, grid, data,
                                            sched=sched, mode="group",
                                            skip_first=cfg.ti_skip_first,
                                            legacy_odds=cfg.ti_legacy)
            return pyp.ti_sweep(key, t, T, a, b, grid, data,
                                skip_first=cfg.ti_skip_first,
                                legacy_odds=cfg.ti_legacy)
        mrel = cfg.maxrel or None
        if sampler == "CT":
            return pyp.ct_sweep(key, t, T, a, b, grid, data, tmax,
                                maxrel=mrel)
        if sampler == "CTW":
            return pyp.ct_sweep(key, t, T, a, b, grid, data, tmax,
                                window=cfg.window, maxrel=mrel)
        raise ValueError(f"unknown sampler {cfg.sampler}")

    def step(carry, it):
        if hsa:
            (hist, T, a, b, key) = carry
        else:
            t, T, a, b, key = carry
        key, ks, kb, ka = jax.random.split(key, 4)
        if hsa:
            hist, T = pyp.hsa_sweep(ks, hist, T, a, b, data)
            t = jnp.sum(hist, axis=-1).astype(jnp.int32)
        else:
            t, T = sweep(ks, t, T, a, b)
        if cfg.bcycle > 0:
            def do_b(b):
                out, _ = hyper.sample_b(
                    kb, b, N_b, T[:, : cfg.b_groups].astype(dt), a,
                    cfg.shape, cfg.scale, kernel=cfg.kernel)
                return out.astype(b.dtype)
            b = jax.lax.cond(it % cfg.bcycle == 0, do_b, lambda b: b, b)
        if cfg.acycle > 0:
            def do_a(a):
                out, _ = hyper.sample_a(
                    ka, a, grid, ns_flat, t.reshape(chains, -1),
                    T.astype(dt), jnp.broadcast_to(b[:, None], T.shape),
                    kernel=cfg.kernel)
                return out.astype(a.dtype)
            a = jax.lax.cond(it % cfg.acycle == 0, do_a, lambda a: a, a)
        rec = (it >= burnin).astype(dt)
        stats = (rec * t.astype(dt), rec * T.astype(dt), rec * a, rec * b,
                 rec)
        if cfg.collect_traces:
            stats = stats + (a, b)
        if hsa:
            return (hist, T, a, b, key), stats
        return (t, T, a, b, key), stats

    carry = ((hist0, T, a, b, key) if hsa else (t, T, a, b, key))
    carry, stats = jax.lax.scan(step, carry, jnp.arange(cfg.iters))
    if cfg.collect_traces:
        t_sum, T_sum, a_sum, b_sum, recs, a_tr, b_tr = stats
    else:
        t_sum, T_sum, a_sum, b_sum, recs = stats
        a_tr = b_tr = None
    cnt = jnp.sum(recs)
    tave = jnp.sum(t_sum, axis=0) / cnt          # (C, J, D)
    Tave = jnp.sum(T_sum, axis=0) / cnt          # (C, J)
    aave = jnp.sum(a_sum, axis=0) / cnt
    bave = jnp.sum(b_sum, axis=0) / cnt
    st_f, T_f, a_f, b_f, _ = carry
    t_f = jnp.sum(st_f, axis=-1).astype(jnp.int32) if hsa else st_f
    out = dict(
        tave=tave, Tave=Tave, aave=aave, bave=bave,
        tave_mean=jnp.mean(tave, axis=0), Tave_mean=jnp.mean(Tave, axis=0),
        aave_mean=jnp.mean(aave), bave_mean=jnp.mean(bave),
        t=t_f, T=T_f, a=a_f, b=b_f,
        hist=st_f if hsa else None)
    if cfg.collect_traces:
        from ..parallel import mesh as pmesh
        kept_a = a_tr[burnin:]
        kept_b = b_tr[burnin:]
        out.update(
            a_trace=a_tr, b_trace=b_tr,
            a_rhat=pmesh.rhat(kept_a), b_rhat=pmesh.rhat(kept_b),
            a_ess=pmesh.ess(kept_a), b_ess=pmesh.ess(kept_b))
    return out
