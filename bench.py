"""Headline benchmark: Stirling discount-grid table fill vs HBM roofline.

Prints ONE JSON line:
  {"metric": "stirling_grid_fill", "value": <GB/s>, "unit": "GB/s",
   "vs_baseline": <achieved / (0.8 * measured copy roofline)>}

The baseline is the driver-supplied north star (BASELINE.json): fill
log S(n,m;a) tables at >80% of the HBM-bandwidth roofline.  The roofline
is *measured* on the same chip with a chained streaming copy (the
reference publishes no numbers -- BASELINE.md row 1), so vs_baseline >= 1
means the target is met on this hardware.

Secondary numbers (sampler throughput, the >=1e5 (a,b) samples/s/chip
target) go to stderr so the driver's single-line contract holds.

Timing notes: through the axon tunnel, dispatch is async and
block_until_ready returns early, so every measurement chains K iterations
inside one jit and forces completion with a scalar readback; the ~25 ms
RPC overhead is measured separately and subtracted.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _readback(x) -> float:
    return float(x.reshape(-1)[-1])


def _rpc_overhead() -> float:
    f = jax.jit(lambda x: x * 1.000001)
    y = f(jnp.ones((8, 128), jnp.float32))
    _readback(y)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        _readback(f(y))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _timed_med(run, oh: float, reps: int = 3) -> float:
    """Median of ``reps`` timed calls of an already-compiled thunk.

    One timed repetition wandered 88%..73% of roofline across rounds
    (BENCH_r01..r03); the median of >=3 with k>=8 in-jit iterations per
    call keeps the recorded number stable against tunnel-latency spikes.
    """
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0 - oh)
    ts.sort()
    return ts[len(ts) // 2]


def copy_roofline(oh: float, k: int = 64) -> float:
    """Streaming-copy bandwidth (read+write) in bytes/s."""
    x = jnp.zeros((128, 1024, 1024), jnp.float32)   # 0.5 GB

    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, k, lambda i, y: y * 1.0000001 + 1e-9, x)

    _readback(chain(x))
    dt = _timed_med(lambda: _readback(chain(x)), oh)
    return k * 2 * x.size * 4 / dt


def fill_throughput(oh: float, g: int = 64, n: int = 1 << 14,
                    m: int = 1024, k: int = 8):
    """Grid-fill bytes/s (V + Srel outputs) via the production fill path."""
    from libstb_tpu.ops import stirling_pallas as sp

    on_tpu = sp.available()
    if not on_tpu:                      # CPU fallback: tiny scan fill
        from libstb_tpu.core import stirling
        g, n, m, k = 4, 2048, 128, 1
    avec0 = jnp.asarray(np.linspace(0.01, 0.9, g), jnp.float32)

    @jax.jit
    def chain(avec0):
        def body(carry, _):
            a = avec0 + carry * 1e-20
            if on_tpu:
                v, s = sp.fill_grid(a, n, m, with_srel=True)
            else:
                from libstb_tpu.core import stirling
                v, s, _ = jax.vmap(lambda ai: stirling.fill_rows(
                    ai, n, m, dtype=jnp.float32))(a)
            return v[0, -1, -1] + s[0, -1, -1], None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    _readback(chain(avec0))
    dt = _timed_med(lambda: _readback(chain(avec0)), oh) / k
    cells = g * n * m
    return cells * 8 / dt, cells / dt


def single_table_throughput(oh: float, n: int = 1 << 20, m: int = 1024,
                            k: int = 2):
    """North-star: ONE table filled to n=2^20 via the column-scan kernel
    (BASELINE.md: fill log S(n,m;a) to n=10^6 at >80% roofline).

    The k repetitions are chained by UNROLLED calls inside one jit, NOT a
    lax.scan: scanning over the cols kernel sends its compile past 9
    minutes (judge-verified in round 3), while the unrolled chain
    compiles in ~3 s and keeps the data dependency that defeats the
    tunnel's async dispatch.  k=2 and running BEFORE the grid fill keep
    the chain's ~12 GB peak clear of HBM allocator pressure: with k=3
    after the 8.6 GB grid phase the same kernel intermittently read 63%
    instead of its isolated 104% (tools/cols_bench.py)."""
    from libstb_tpu.ops import stirling_pallas as sp

    interp = not sp.available()
    if interp:
        n, m, k = 4096, 64, 1

    @jax.jit
    def chain(a0):
        c = jnp.float32(0)
        for _ in range(k):
            v, s, _ = sp.fill_table_cols(a0 + c * 1e-30, n, m,
                                         interpret=interp)
            c = c + (v[(-1,) * v.ndim] + s[(-1,) * s.ndim]) * 1e-30
        return c

    a0 = jnp.float32(0.5)
    _readback(chain(a0).reshape(1))
    dt = _timed_med(lambda: _readback(chain(a0).reshape(1)), oh) / k
    cells = n * m
    return cells * 8 / dt, cells / dt


def sweep_throughput(oh: float, chains: int = 32, sweeps: int = 4):
    """Gibbs-sweep throughput at check.c scale (check.c:83 MAXDATA=1e5):
    N = 100,000 items (100 groups x 1000), DIM = 20.  Measures the
    relative-window CTW sweep (category-scan) and the blocked TI sweep
    (cat-mode schedule) in item-updates/s (items x chains / s)."""
    import numpy as np

    from libstb_tpu import native
    from libstb_tpu.core import stirling
    from libstb_tpu.models import pyp

    if native.available():
        data = native.crp_generate(1, 100, 20, 1000, 0.5, 10.0)
    else:
        data = pyp.crp_generate(1, 20, 20, 500, 0.5, 10.0)
    L = data.data_cat.size
    n_max = int(data.n.max()) + 2
    tab = stirling.make(n_max, min(n_max, 1024), n_max + 64,
                        min(n_max, 1024) + 64, 0.5, use_asympt=True)
    t0_, T0_ = pyp.init_state(data, chains)
    a = jnp.full((chains,), 0.5, jnp.float32)
    b = jnp.full((chains,), 10.0, jnp.float32)
    jvec, ivec, nvec = pyp.ti_pair_layout(data)
    order, stages = pyp.ti_pair_stages(nvec)
    jvec, ivec, nvec = jvec[order], ivec[order], nvec[order]
    jv, iv, nv = jnp.asarray(jvec), jnp.asarray(ivec), jnp.asarray(nvec)

    def timed(fn, state0):
        @jax.jit
        def run(key, st):
            def body(carry, _):
                st, key = carry
                key, k = jax.random.split(key)
                return (fn(k, st), key), None
            (st, _), _ = jax.lax.scan(body, (st, key), None, length=sweeps)
            return st
        key = jax.random.key(0)
        st = run(key, state0)
        _readback(st[1].astype(jnp.float32))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            st = run(key, state0)
            _readback(st[1].astype(jnp.float32))
            ts.append(time.perf_counter() - t0 - oh)
        ts.sort()
        return chains * L * sweeps / ts[len(ts) // 2]

    ctw_msel = pyp.ctw_m_sel(tab, data, window=10)
    ctw = timed(lambda k, st: pyp.ctw_sweep_rel(
        k, st[0], st[1], a, b, tab, data, window=10, m_sel=ctw_msel),
        (t0_, T0_))
    # pair-major TI, count-staged schedule: state stays pair-major (in
    # descending-count order) across sweeps; the conversion is once per
    # run in production (models/pyp.ti_sweep_pairs).  m_sel enables the
    # gather-free V row-selection path (pyp.ti_pair_m_sel).
    tp0 = t0_[:, jv, iv]
    m_sel = pyp.ti_pair_m_sel(tab, nvec)
    ti = timed(lambda k, st: pyp.ti_sweep_pairs_staged(
        k, st[0], st[1], a, b, tab, data, jv, iv, nv, stages,
        m_sel=m_sel), (tp0, T0_))
    return L, ctw, ti


def sampler_throughput(oh: float, chains: int = 4096, iters: int = 32):
    """Joint (a,b) posterior samples/s on the demo workload."""
    from libstb_tpu.core import agrid
    from libstb_tpu.models import pyp
    from libstb_tpu.samplers import hyper

    data = pyp.crp_generate(seed=0, n_groups=4, dim=20, n_per_group=100,
                            a=0.5, b=10.0)
    grid = agrid.make_grid(512, 128, g=64)
    dt = jnp.float32
    ns_flat = jnp.asarray(data.n.reshape(-1))
    N_b = jnp.asarray(data.N, dt)
    t0_, T0_ = pyp.init_state(data, chains)

    @jax.jit
    def run(key, t, T):
        a = jnp.full((chains,), 0.5, dt)
        b = jnp.full((chains,), 10.0, dt)

        def step(carry, _):
            a, b, key = carry
            key, kb, ka = jax.random.split(key, 3)
            b, _ = hyper.sample_b(kb, b, N_b, T.astype(dt), a,
                                  shape=1.1, scale=20.0)
            a, _ = hyper.sample_a(ka, a, grid, ns_flat,
                                  t.reshape(chains, -1), T.astype(dt),
                                  jnp.broadcast_to(b[:, None], T.shape))
            return (a, b, key), None
        (a, b, _), _ = jax.lax.scan(step, (a, b, key), None, length=iters)
        return a[0] + b[0]

    key = jax.random.key(0)
    _readback(run(key, t0_, T0_).reshape(1))
    t0 = time.perf_counter()
    _readback(run(key, t0_, T0_).reshape(1))
    dtm = time.perf_counter() - t0 - oh
    return chains * iters / dtm


def main():
    try:
        oh = _rpc_overhead()
        bw = copy_roofline(oh)
    except Exception as e:                      # keep the contract line
        print(f"roofline bench failed: {e!r}", file=sys.stderr)
        print(json.dumps({"metric": "stirling_grid_fill", "value": 0.0,
                          "unit": "GB/s", "vs_baseline": 0.0}))
        return
    try:
        # before the grid fill: its big transient chain wants a clean heap
        one_bps, one_cps = single_table_throughput(oh)
    except Exception as e:
        print(f"single-table bench failed: {e!r}", file=sys.stderr)
        one_bps = one_cps = float("nan")
    try:
        fill_bps, fill_cps = fill_throughput(oh)
    except Exception as e:                      # keep the contract line
        print(f"fill bench failed: {e!r}", file=sys.stderr)
        print(json.dumps({"metric": "stirling_grid_fill", "value": 0.0,
                          "unit": "GB/s", "vs_baseline": 0.0}))
        return
    try:
        sps = sampler_throughput(oh)
    except Exception as e:                      # keep the contract line
        print(f"sampler bench failed: {e}", file=sys.stderr)
        sps = float("nan")
    try:
        L, ctw_ips, ti_ips = sweep_throughput(oh)
        print(f"# sweep scale (N={L} items, 32 chains): CTW(rel,w=10) "
              f"{ctw_ips:.3g} item-updates/s; blocked TI {ti_ips:.3g} "
              f"item-updates/s", file=sys.stderr)
    except Exception as e:
        print(f"sweep bench failed: {e!r}", file=sys.stderr)

    target = 0.8 * bw
    print(f"# copy roofline: {bw/1e9:.0f} GB/s; fill: {fill_bps/1e9:.0f} "
          f"GB/s = {fill_bps/bw*100:.0f}% roofline, {fill_cps/1e9:.1f} "
          f"Gcells/s; single-table n=2^20: {one_bps/1e9:.0f} GB/s = "
          f"{one_bps/bw*100:.0f}% roofline; (a,b) samples/s: {sps:.3g} "
          f"(target 1e5)", file=sys.stderr)
    print(json.dumps({
        "metric": "stirling_grid_fill",
        "value": round(fill_bps / 1e9, 1),
        "unit": "GB/s",
        "vs_baseline": round(fill_bps / target, 3),
    }))


if __name__ == "__main__":
    main()
