#!/usr/bin/env python
"""Long-compile on-device measurements recorded in BASELINE.md/SCALING.md.

These live outside bench.py deliberately: the driver runs bench.py under
a tight wall-clock budget and each measurement here adds a fresh Pallas/
XLA compile (minutes through the remote-compile tunnel), so bench.py
keeps its ONE-json-line fast contract and this tool produces the dated
evidence rows:

  make     production stirling.make() wall-clock at (2^20, 1024) -- the
           user-visible single-table path: cols kernel + host f64 S1
           (overlapped with the fill via async dispatch) + transfers
  ensure   on-TPU N-growth ensure(2^19 -> 2^20) vs a fresh make at 2^20
           (validates the remake-beats-resume decision, stirling.py)
  sparse   sample_a over 2^20+17 occupied CSR pairs (the getval-scale
           workload, psample.h:101-115): samples/s on device
  hsa      hsa_sweep item-updates/s at a moderate scale + the scope
           note (HSA is the small-scale oracle; CTW/TI are the scale
           kernels)
  ctw      ctw_sweep_rel at check.c scale with the gather-free Srel
           path (pyp.ctw_m_sel)

Usage: python tools/extra_bench.py [--only make,ensure,...]
Run ALONE on the TPU box.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _readback(x):
    return float(jnp.asarray(x).reshape(-1)[-1])


def _rpc_overhead():
    f = jax.jit(lambda x: x * 1.000001)
    y = f(jnp.ones((8, 128), jnp.float32))
    _readback(y)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        _readback(f(y))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_make_and_ensure(oh, which):
    from libstb_tpu.core import stirling

    N, M = 1 << 20, 1024

    def one_make(a, n):
        t0 = time.perf_counter()
        tab = stirling.make(n, M, 1 << 21, 2048, a, use_asympt=True)
        _readback(tab.vtab[0, 0, 0, 0:1])        # force fill completion
        _readback(tab.s1_hi[-1:])                # and the S1 transfer
        return time.perf_counter() - t0, tab

    if "make" in which:
        one_make(0.31, N)                        # compile warmup
        ts = sorted(one_make(a, N)[0] for a in (0.45, 0.5, 0.55))
        dt = ts[1] - oh
        print(f"make(2^20,1024) production wall: {dt*1e3:.1f} ms "
              f"({N*M*8/dt/1e9:.0f} GB/s incl. host S1 + transfers)",
              flush=True)
    if "ensure" in which:
        _, warm = one_make(0.33, N)              # warm 2^20 fill jit
        del warm                                 # 8.6 GB each -- keep at
        _, small = one_make(0.52, 1 << 19)       # most one table alive
        t0 = time.perf_counter()
        grown = stirling.ensure(small, (1 << 20) - 2, M - 2)
        _readback(grown.vtab[0, 0, 0, 0:1])
        _readback(grown.s1_hi[-1:])
        dt_g = time.perf_counter() - t0 - oh
        assert grown.n_max == 1 << 20, grown.n_max
        del small, grown
        dt_f = sorted(one_make(a, N)[0] for a in (0.52, 0.521))[0] - oh
        print(f"ensure(2^19 -> 2^20) on-TPU: {dt_g*1e3:.1f} ms "
              f"(= full re-make route) vs fresh make {dt_f*1e3:.1f} ms",
              flush=True)


def bench_xfer(oh):
    """Host->device transfer rate through the axon tunnel (explains the
    production make() wall vs the 12.6 ms kernel: the f64-derived S1
    hi/lo pair is 8 MB of host data per 2^20-row table)."""
    x = np.random.default_rng(0).random((1 << 20,)).astype(np.float32)
    y = jax.device_put(x)
    _readback(y[-1:])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        y = jax.device_put(x)
        _readback(y[-1:])
        ts.append(time.perf_counter() - t0 - oh)
    ts.sort()
    print(f"device_put 4 MB: {ts[1]*1e3:.1f} ms = "
          f"{4e6/ts[1]/1e6:.0f} MB/s", flush=True)


def bench_sparse(oh):
    from libstb_tpu.core import agrid
    from libstb_tpu.samplers import hyper

    grid = agrid.make_grid(96, 32, g=16)
    rng = np.random.default_rng(4)
    C, P = 4, (1 << 20) + 17
    ns = jnp.asarray(rng.integers(2, 90, P).astype(np.int32))
    ts = jnp.asarray(np.minimum(
        rng.integers(1, 30, (C, P)).astype(np.int32), np.asarray(ns)[None]))
    T = jnp.asarray(np.asarray(ts).sum(axis=1, dtype=np.float32)
                    .reshape(C, 1))
    b = jnp.asarray([[10.0]] * C)
    iters = 8

    @jax.jit
    def run(key, a0):
        def step(carry, _):
            a, key = carry
            key, k = jax.random.split(key)
            a, ok = hyper.sample_a(k, a, grid, ns, ts, T, b)
            return (a, key), None
        (a, _), _ = jax.lax.scan(step, (a0, key), None, length=iters)
        return a

    key = jax.random.key(0)
    a0 = jnp.full((C,), 0.5)
    _readback(run(key, a0))
    ts_t = []
    for _ in range(3):
        t0 = time.perf_counter()
        _readback(run(key, a0))
        ts_t.append(time.perf_counter() - t0 - oh)
    ts_t.sort()
    sps = C * iters / ts_t[1]
    print(f"sparse sample_a (CSR, {P} pairs, C={C}): {sps:.3g} samples/s "
          f"= {C*iters*P/ts_t[1]:.3g} pair-terms/s", flush=True)


def bench_hsa(oh):
    from libstb_tpu.models import pyp

    data = pyp.crp_generate(seed=2, n_groups=6, dim=20, n_per_group=400,
                            a=0.5, b=10.0)
    L = data.data_cat.size
    C = 32
    a = jnp.full((C,), 0.5, jnp.float32)
    b = jnp.full((C,), 10.0, jnp.float32)
    hist, T = pyp.init_hsa(data, C)
    sweeps = 2

    @jax.jit
    def run(key, hist, T):
        def body(carry, _):
            hist, T, key = carry
            key, k = jax.random.split(key)
            hist, T = pyp.hsa_sweep(k, hist, T, a, b, data)
            return (hist, T, key), None
        (hist, T, _), _ = jax.lax.scan(body, (hist, T, key), None,
                                       length=sweeps)
        return hist, T

    key = jax.random.key(0)
    h, t = run(key, hist, T)
    _readback(t.astype(jnp.float32))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        h, t = run(key, hist, T)
        _readback(t.astype(jnp.float32))
        ts.append(time.perf_counter() - t0 - oh)
    ts.sort()
    ips = C * L * sweeps / ts[1]
    print(f"HSA (item-sequential oracle, N={L}, C={C}): {ips:.3g} "
          f"item-updates/s -- small-scale oracle only; TI/CTW are the "
          f"scale kernels", flush=True)


def bench_hsa_pairs(oh):
    """Staged pair-major HSA at check.c scale (N = 10^5): the histogram
    sampler's scale route (dense size-axis algebra, no gathers)."""
    from libstb_tpu import native
    from libstb_tpu.models import pyp

    data = native.crp_generate(1, 100, 20, 1000, 0.5, 10.0)
    L = data.data_cat.size
    C = 32
    a = jnp.full((C,), 0.5, jnp.float32)
    b = jnp.full((C,), 10.0, jnp.float32)
    jvec, ivec, nvec = pyp.ti_pair_layout(data)
    order, stages = pyp.ti_pair_stages(nvec, skip_first=False)
    hp0, T0 = pyp.init_hsa_pairs(data, C, order=order)
    jv = jnp.asarray(jvec[order])
    iv = jnp.asarray(ivec[order])
    nv = jnp.asarray(nvec[order])
    s_max = hp0.shape[-1] - 1
    sweeps = 2

    @jax.jit
    def run(key, hp, T):
        def body(carry, _):
            hp, T, key = carry
            key, k = jax.random.split(key)
            hp, T = pyp.hsa_sweep_pairs_staged(k, hp, T, a, b, data,
                                               jv, iv, nv, stages, s_max)
            return (hp, T, key), None
        (hp, T, _), _ = jax.lax.scan(body, (hp, T, key), None,
                                     length=sweeps)
        return hp, T

    key = jax.random.key(0)
    hp, T = run(key, hp0, T0)
    _readback(T.astype(jnp.float32))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        hp, T = run(key, hp0, T0)
        _readback(T.astype(jnp.float32))
        ts.append(time.perf_counter() - t0 - oh)
    ts.sort()
    ips = C * L * sweeps / ts[1]
    print(f"HSA pair-major staged (N={L}, C={C}, s_max={s_max}): "
          f"{ips:.3g} item-updates/s ({ts[1]/sweeps*1e3:.1f} ms/sweep)",
          flush=True)


def bench_ctw(oh):
    from libstb_tpu import native
    from libstb_tpu.core import stirling
    from libstb_tpu.models import pyp

    data = native.crp_generate(1, 100, 20, 1000, 0.5, 10.0)
    L = data.data_cat.size
    n_max = int(data.n.max()) + 2
    tab = stirling.make(n_max, min(n_max, 1024), n_max + 64,
                        min(n_max, 1024) + 64, 0.5, use_asympt=True)
    C = 32
    a = jnp.full((C,), 0.5, jnp.float32)
    b = jnp.full((C,), 10.0, jnp.float32)
    t0_, T0_ = pyp.init_state(data, C)
    sweeps = 4
    for m_sel in (0, pyp.ctw_m_sel(tab, data, window=10)):
        @jax.jit
        def run(key, t, T, m_sel=m_sel):
            def body(carry, _):
                t, T, key = carry
                key, k = jax.random.split(key)
                t, T = pyp.ctw_sweep_rel(k, t, T, a, b, tab, data,
                                         window=10, m_sel=m_sel)
                return (t, T, key), None
            (t, T, _), _ = jax.lax.scan(body, (t, T, key), None,
                                        length=sweeps)
            return t, T
        key = jax.random.key(0)
        t, T = run(key, t0_, T0_)
        _readback(T.astype(jnp.float32))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            t, T = run(key, t0_, T0_)
            _readback(T.astype(jnp.float32))
            ts.append(time.perf_counter() - t0 - oh)
        ts.sort()
        ips = C * L * sweeps / ts[1]
        print(f"CTW(rel,w=10) N={L} C={C} m_sel={m_sel}: {ips:.3g} "
              f"item-updates/s", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", type=str,
                   default="make,ensure,xfer,sparse,hsa,hsapairs,ctw")
    args = p.parse_args()
    which = set(args.only.split(","))
    oh = _rpc_overhead()
    print(f"# extra_bench backend={jax.default_backend()} "
          f"rpc_oh={oh*1e3:.1f} ms", flush=True)
    if which & {"make", "ensure"}:
        bench_make_and_ensure(oh, which)
    if "xfer" in which:
        bench_xfer(oh)
    if "sparse" in which:
        bench_sparse(oh)
    if "hsa" in which:
        bench_hsa(oh)
    if "hsapairs" in which:
        bench_hsa_pairs(oh)
    if "ctw" in which:
        bench_ctw(oh)


if __name__ == "__main__":
    main()
