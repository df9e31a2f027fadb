#!/usr/bin/env python
"""On-device component profile of the staged pair-major TI sweep.

Round-4 verdict task: TI at check.c scale runs at 3.0e7 item-updates/s
vs the 5e7 target, with no recorded profile of where the per-round cost
sits.  This tool times the production sweep and component ablations
(monkeypatched, timing-only) at the bench.py workload -- N = 10^5 items
(100 groups x 1000), DIM = 20, 32 chains:

  base          ti_sweep_pairs_staged exactly as bench.py runs it
  noasympt      table built with use_asympt=False (no in-graph asymptote)
  novq          V query replaced by a constant (isolates the table gather)
  norng         uniforms replaced by constants (isolates threefry)
  rbg           chain key uses the rbg PRNG implementation

Usage: python tools/ti_profile.py [--chains 32] [--sweeps 4]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chains", type=int, default=32)
    p.add_argument("--sweeps", type=int, default=4)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--only", type=str, default="")
    args = p.parse_args()

    from libstb_tpu import native
    from libstb_tpu.core import stirling
    from libstb_tpu.models import pyp

    chains, sweeps = args.chains, args.sweeps
    oh = _rpc_overhead()
    if native.available():
        data = native.crp_generate(1, 100, 20, 1000, 0.5, 10.0)
    else:
        data = pyp.crp_generate(1, 20, 20, 500, 0.5, 10.0)
    L = data.data_cat.size
    n_max = int(data.n.max()) + 2
    jvec, ivec, nvec = pyp.ti_pair_layout(data)
    order, stages = pyp.ti_pair_stages(nvec)
    jvec, ivec, nvec = jvec[order], ivec[order], nvec[order]
    jv, iv, nv = jnp.asarray(jvec), jnp.asarray(ivec), jnp.asarray(nvec)
    a = jnp.full((chains,), 0.5, jnp.float32)
    b = jnp.full((chains,), 10.0, jnp.float32)
    t0_, T0_ = pyp.init_state(data, chains)
    tp0 = t0_[:, jv, iv]
    rounds = sum(r1 - r0 for (_, r0, r1) in stages)
    lanes = sum(p * (r1 - r0) for (p, r0, r1) in stages)
    print(f"# L={L} pairs={len(nvec)} max_c={int(nvec.max())} "
          f"stages={len(stages)} rounds={rounds} "
          f"lane-slots/sweep={lanes} ({lanes/L:.2f}x items)",
          file=sys.stderr)

    def timed(label, tab, key_impl=None, m_sel=0):
        key = (jax.random.key(0) if key_impl is None
               else jax.random.key(0, impl=key_impl))

        @jax.jit
        def run(key, st):
            def body(carry, _):
                st, key = carry
                key, k = jax.random.split(key)
                st2 = pyp.ti_sweep_pairs_staged(
                    k, st[0], st[1], a, b, tab, data, jv, iv, nv, stages,
                    m_sel=m_sel)
                return (st2, key), None
            (st, _), _ = jax.lax.scan(body, (st, key), None, length=sweeps)
            return st

        st = run(key, (tp0, T0_))
        _readback(st[1].astype(jnp.float32))
        ts = []
        for _ in range(args.reps):
            t1 = time.perf_counter()
            st = run(key, (tp0, T0_))
            _readback(st[1].astype(jnp.float32))
            ts.append(time.perf_counter() - t1 - oh)
        ts.sort()
        dt = ts[len(ts) // 2]
        ips = chains * L * sweeps / dt
        print(f"{label:10s}: {ips:.3g} item-updates/s  "
              f"({dt/sweeps*1e3:.1f} ms/sweep, "
              f"{dt/sweeps/rounds*1e6:.1f} us/round)", file=sys.stderr)
        return ips

    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    mk = lambda asympt: stirling.make(
        n_max, min(n_max, 1024), n_max + 64, min(n_max, 1024) + 64, 0.5,
        use_asympt=asympt)
    tab = mk(True)
    if want("base"):
        timed("base", tab)
    if want("vrows"):
        timed("vrows", tab, m_sel=pyp.ti_pair_m_sel(tab, nvec))
    if want("noasympt"):
        timed("noasympt", mk(False))
    if want("rbg"):
        timed("rbg", tab, key_impl="rbg")
    # NOTE on the monkeypatched ablations: ti_sweep_pairs_staged is a
    # module-level jitted function, so a patch applied after any earlier
    # variant TRACED it is invisible (the cached executable is reused --
    # this silently produced no-op ablations in the first round-5
    # profile).  Clear its cache around each patched variant.
    if want("novq"):
        orig = pyp._vq
        pyp._vq = lambda tab_, n_, m_, a_: jnp.asarray(0.5, jnp.float32)
        pyp.ti_sweep_pairs_staged.clear_cache()
        try:
            timed("novq", tab)
        finally:
            pyp._vq = orig
            pyp.ti_sweep_pairs_staged.clear_cache()
    if want("norng"):
        orig_u = jax.random.uniform

        def fake_uniform(key, shape=(), dtype=jnp.float32, **kw):
            return jnp.full(shape, 0.5, dtype)
        jax.random.uniform = fake_uniform
        pyp.ti_sweep_pairs_staged.clear_cache()
        try:
            timed("norng", tab)
        finally:
            jax.random.uniform = orig_u
            pyp.ti_sweep_pairs_staged.clear_cache()


if __name__ == "__main__":
    main()
