#!/usr/bin/env python
"""Multi-sampler comparison -- the test/check.c analog.

Runs the sampler variants (TI / CT / CTW) on the same generated data with
repeats, reporting run-averaged posterior statistics +- stderr and wall
time (check.c:663-1130 methodology).  Agreement of posterior means across
mathematically equivalent samplers is the correctness criterion.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-a", type=float, default=0.5)
    p.add_argument("-b", type=float, default=10.0)
    p.add_argument("-C", type=int, default=300, help="cycles per run")
    p.add_argument("-B", type=int, default=0, help="burnin")
    p.add_argument("-N", type=int, default=40, help="samples per group")
    p.add_argument("-R", type=int, default=4, help="repeat runs")
    p.add_argument("-s", type=int, default=0)
    p.add_argument("-w", type=int, default=10, help="CTW window")
    p.add_argument("--chains", type=int, default=32)
    p.add_argument("--dim", type=int, default=20)
    p.add_argument("--samplers", default="TI,CT,CTW,HSA")
    args = p.parse_args()

    import jax
    from libstb_tpu.core import agrid
    from libstb_tpu.models import driver, pyp
    from libstb_tpu.parallel import mesh as pmesh

    data = pyp.crp_generate(args.s, 1, args.dim, args.N, args.a, args.b)
    T_true = int((data.n > 0).sum())
    print(f"data: N={args.N} dim={args.dim} a={args.a} b={args.b} "
          f"T_init={T_true} backend={jax.default_backend()}")

    n_max = max(int(data.N.max()) + 2, 16)
    grid = agrid.make_grid(n_max, n_max, g=64)

    for name in args.samplers.split(","):
        cfg = driver.GibbsConfig(iters=args.C, burnin=args.B, sampler=name,
                                 window=args.w, scale=float(args.dim))
        Ts, secs = [], []
        for r in range(args.R):
            t0 = time.time()
            out = driver.run_gibbs(jax.random.key(args.s + 17 * r + 1),
                                   data, grid, args.chains,
                                   args.a, args.b, cfg)
            Tm = float(np.asarray(out["Tave_mean"])[0])
            jax.block_until_ready(out["Tave"])
            secs.append(time.time() - t0)
            Ts.append(Tm)
        Ts = np.asarray(Ts)
        se = Ts.std(ddof=1) / np.sqrt(len(Ts)) if len(Ts) > 1 else 0.0
        print(f"  {name:4s}: E[T] = {Ts.mean():8.4f} +- {se:.4f}   "
              f"({np.mean(secs)*1e3:.0f} ms/run)")


if __name__ == "__main__":
    main()
