#!/usr/bin/env python
"""On-device ablation bench for the single-table column-scan kernel.

Times fill_table_cols at the north-star shape (2^20, 1024) in several
variants so kernel changes can be evaluated quickly, and prints the GB/s
vs the measured write floor (tools/vpu_probe.py: 642-657 GB/s for this
exact output pattern).  Run ALONE on the TPU box.

Usage: python tools/cols_bench.py [--n 20] [--m 1024] [--reps 3]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


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
    p.add_argument("--n", type=int, default=20, help="log2 n_max")
    p.add_argument("--m", type=int, default=1024)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--k", type=int, default=3, help="chained fills per jit")
    args = p.parse_args()

    from libstb_tpu.ops import stirling_pallas as sp

    n, m, k = 1 << args.n, args.m, args.k
    oh = _rpc_overhead()
    print(f"# cols kernel ablations at (2^{args.n}, {m}), k={k} chained, "
          f"median of {args.reps}", file=sys.stderr)

    def timed(label, with_srel, kahan, nbytes_per_cell, debug_srel="full"):
        @jax.jit
        def chain(a0):
            c = jnp.float32(0)
            for _ in range(k):
                out = sp.fill_table_cols(a0 + c * 1e-30, n, m,
                                         with_srel=with_srel, kahan=kahan,
                                         debug_srel=debug_srel)
                v = out[0]
                c = c + v[(-1,) * v.ndim] * 1e-30
                if with_srel:
                    c = c + out[1][(-1,) * out[1].ndim] * 1e-30
            return c

        a0 = jnp.float32(0.5)
        _readback(chain(a0).reshape(1))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _readback(chain(a0).reshape(1))
            ts.append(time.perf_counter() - t0 - oh)
        ts.sort()
        dt = ts[len(ts) // 2] / k
        gbps = n * m * nbytes_per_cell / dt / 1e9
        print(f"{label:24s}: {dt*1e3:7.2f} ms  {gbps:6.1f} GB/s  "
              f"({dt/m*1e6:.1f} us/col)", file=sys.stderr)
        return dt, gbps

    which = os.environ.get("COLS_VARIANTS", "default")
    if which == "ablate":
        timed("V+Srel noalu", True, False, 8, debug_srel="noalu")
        timed("V+Srel nopassa", True, True, 8, debug_srel="nopassa")
        timed("V+Srel srel=copy", True, False, 8, debug_srel="copy")
    else:
        timed("V+Srel kahan", True, True, 8)
        timed("V+Srel srel=copy", True, False, 8, debug_srel="copy")
        timed("V+Srel srel=log", True, False, 8, debug_srel="log")
        timed("V only", False, False, 4)


if __name__ == "__main__":
    main()
