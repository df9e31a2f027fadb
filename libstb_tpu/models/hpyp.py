"""Two-level hierarchical Pitman-Yor process (HPYP) model family.

The application pattern libstb exists to serve (hierarchical PYP topic /
n-gram models, arXiv:1007.0296): J group-level PYP(a1, b1) restaurants
whose base measure is itself a PYP(a0, b0) over the base distribution H.
The reference library provides the per-restaurant machinery (tables,
samplea/sampleb); the hierarchy is what its users build on top -- here it
is a first-class driver:

  level 1 (groups):   counts n[j, i]  -> table counts t1[j, i]
  level 0 (shared):   counts n0[i] = sum_j t1[j, i] -> table counts t0[i]
  base for level 1:   the level-0 posterior predictive
      p0[i] = (n0[i] - a0 t0[i] + (b0 + a0 T0) H[i]) / (b0 + N0)

Gibbs cycle: CT sweep at level 1 with per-chain base p0 -> recompute n0
-> CT sweep at level 0 with per-chain dynamic counts -> optional
(a, b) updates per level.  Everything is chain-batched; the whole run is
one cached jit program like models/driver.run_gibbs.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import agrid
from ..samplers import hyper
from . import pyp

__all__ = ["HPYPConfig", "run_hpyp"]


@dataclasses.dataclass(frozen=True)
class HPYPConfig:
    iters: int = 200
    burnin: int = 0
    hyper_cycle: int = 0       # 0 = fixed hyperparameters
    shape: float = 1.1         # Gamma prior on both concentrations
    scale: float = 20.0

    def resolved_burnin(self) -> int:
        return self.burnin if self.burnin > 0 else self.iters // 2


def _predictive(n0, t0, T0, a0, b0, H):
    """Level-0 PYP posterior predictive over categories, (C, D)."""
    dt = a0.dtype
    N0 = jnp.sum(n0, axis=-1).astype(dt)
    num = (n0.astype(dt) - a0[:, None] * t0.astype(dt)
           + (b0 + a0 * T0.astype(dt))[:, None] * H[None, :])
    return num / (b0.astype(dt) + N0)[:, None]


def run_hpyp(key, data: pyp.PYPData, grid: agrid.AGridTable, chains: int,
             a1: float, b1: float, a0: float, b0: float, cfg: HPYPConfig):
    """Run the 2-level HPYP Gibbs ensemble; returns posterior stats.

    Returns dict with time-averaged level-1/level-0 table counts, the
    hyperparameter averages, and final states.

    Grid growth: level-0 counts are DYNAMIC (n0[i] = sum_j t1[j, i]), so
    a grid sized from the level-1 data alone under-covers the hierarchy.
    The exact reachable bound is n0[i] <= sum_j n[j, i]; the grid is
    grown to it up front (the preflight analog of the reference's
    S_extend-on-query, stable.c:564-815).
    """
    n0_bound = int(np.asarray(data.n).sum(axis=0).max())
    n_req, m_req = agrid.required_dims(data.n)
    grid = agrid.ensure_grid(grid, max(n_req, n0_bound + 1),
                             max(m_req, n0_bound + 1))
    t1, T1 = pyp.init_state(data, chains)
    dt = grid.srel.dtype
    a1v = jnp.full((chains,), a1, dt)
    b1v = jnp.full((chains,), b1, dt)
    a0v = jnp.full((chains,), a0, dt)
    b0v = jnp.full((chains,), b0, dt)
    # level-0 init: counts = current t1 sums, one table per used category
    n0 = jnp.sum(t1, axis=1)
    t0 = (n0 > 0).astype(t1.dtype)
    T0 = jnp.sum(t0, axis=1)
    tmax = int(data.n.max()) + 1
    # level-0 skeleton data: 1 group x D categories (counts are dynamic)
    D = data.n.shape[1]
    data0 = pyp.PYPData(
        data_cat=np.arange(D, dtype=np.int32),
        data_grp=np.zeros(D, np.int32),
        first=np.ones(D, bool),
        n=np.zeros((1, D), np.int32),
        N=np.zeros(1, np.int32),
        H=np.asarray(data.H))
    tmax0 = int(data.n.sum(axis=0).max()) + 1
    return _run_hpyp_jit(key, data, data0, grid, t1, T1, t0, T0,
                         a1v, b1v, a0v, b0v, chains=chains, cfg=cfg,
                         tmax=tmax, tmax0=tmax0,
                         burnin=cfg.resolved_burnin())


@functools.partial(jax.jit, static_argnames=("chains", "cfg", "tmax",
                                             "tmax0", "burnin"))
def _run_hpyp_jit(key, data, data0, grid, t1, T1, t0, T0, a1, b1, a0, b0, *,
                  chains: int, cfg: HPYPConfig, tmax: int, tmax0: int,
                  burnin: int):
    dt = grid.srel.dtype
    H = jnp.asarray(data.H, dt)
    J, D = data.n.shape
    N1 = jnp.asarray(data.N, dt)
    ns_flat1 = jnp.asarray(data.n.reshape(-1))

    def step(carry, it):
        t1, T1, t0, T0, a1, b1, a0, b0, key = carry
        key, k1, k0, kh = jax.random.split(key, 4)
        n0 = jnp.sum(t1, axis=1)                       # (C, D)
        # level-1 sweep with the level-0 predictive as base
        p0 = _predictive(n0, t0, T0, a0, b0, H)
        t1, T1 = pyp.ct_sweep(k1, t1, T1, a1, b1, grid, data, tmax,
                              H_arr=p0)
        # level-0 sweep on the fresh t1 sums (dynamic counts, 1 group)
        n0 = jnp.sum(t1, axis=1)
        t0g = t0[:, None, :]
        T0g = T0[:, None]
        t0g, T0g = pyp.ct_sweep(k0, t0g, T0g, a0, b0, grid, data0, tmax0,
                                n_arr=n0[:, None, :],
                                H_arr=jnp.broadcast_to(H[None], n0.shape))
        t0, T0 = t0g[:, 0, :], T0g[:, 0]

        if cfg.hyper_cycle > 0:
            kb1, ka1, kb0, ka0 = jax.random.split(kh, 4)

            def update(args):
                a1, b1, a0, b0 = args
                b1n, _ = hyper.sample_b(kb1, b1, N1, T1.astype(dt), a1,
                                        cfg.shape, cfg.scale)
                a1n, _ = hyper.sample_a(
                    ka1, a1, grid, ns_flat1, t1.reshape(chains, -1),
                    T1.astype(dt),
                    jnp.broadcast_to(b1n[:, None], T1.shape))
                N0 = jnp.sum(n0, axis=1, keepdims=True).astype(dt)
                b0n, _ = hyper.sample_b(kb0, b0, N0, T0[:, None].astype(dt),
                                        a0, cfg.shape, cfg.scale)
                a0n, _ = hyper.sample_a(
                    ka0, a0, grid, n0, t0, T0[:, None].astype(dt),
                    jnp.broadcast_to(b0n[:, None], (chains, 1)))
                return (a1n.astype(dt), b1n.astype(dt),
                        a0n.astype(dt), b0n.astype(dt))

            a1, b1, a0, b0 = jax.lax.cond(
                it % cfg.hyper_cycle == 0, update,
                lambda args: args, (a1, b1, a0, b0))

        rec = (it >= burnin).astype(dt)
        stats = (rec * t1.astype(dt), rec * T1.astype(dt),
                 rec * t0.astype(dt), rec * T0.astype(dt),
                 rec * a1, rec * b1, rec * a0, rec * b0, rec)
        return (t1, T1, t0, T0, a1, b1, a0, b0, key), stats

    carry = (t1, T1, t0, T0, a1, b1, a0, b0, key)
    carry, stats = jax.lax.scan(step, carry, jnp.arange(cfg.iters))
    (t1s, T1s, t0s, T0s, a1s, b1s, a0s, b0s, recs) = stats
    cnt = jnp.sum(recs)
    out = dict(
        t1ave=jnp.sum(t1s, 0) / cnt, T1ave=jnp.sum(T1s, 0) / cnt,
        t0ave=jnp.sum(t0s, 0) / cnt, T0ave=jnp.sum(T0s, 0) / cnt,
        a1ave=jnp.sum(a1s, 0) / cnt, b1ave=jnp.sum(b1s, 0) / cnt,
        a0ave=jnp.sum(a0s, 0) / cnt, b0ave=jnp.sum(b0s, 0) / cnt,
        t1=carry[0], T1=carry[1], t0=carry[2], T0=carry[3])
    out["T1ave_mean"] = jnp.mean(out["T1ave"], axis=0)
    out["T0ave_mean"] = jnp.mean(out["T0ave"])
    return out
