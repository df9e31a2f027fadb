#!/usr/bin/env python
"""NGG generalized-Stirling tables -- the test/ngg_test.c analog.

Builds the S table and the Lambda1 ratio table for the Normalized
Generalized Gamma process, then prints the (n, k) comparison of table
values vs the umax saddle-point approximation vs tanh-sinh quadrature
(ngg_test.c:502-533's main output, with the quadrature column that
ngg_integral.cpp provides).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-a", type=float, default=0.1, help="NGG discount")
    p.add_argument("-M", type=float, default=10.0, help="NGG mass")
    p.add_argument("-N", type=int, default=16, help="max n")
    p.add_argument("-K", type=int, default=10, help="max k")
    p.add_argument("--step", type=int, default=2)
    args = p.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    from libstb_tpu.core import ngg

    a, M, N, K = args.a, args.M, args.N, args.K
    tab = np.asarray(ngg.ngg_table(a, M, N, K))
    R = np.asarray(ngg.ngg_ratio_table(a, M, N, K))
    print(f"NGG tables: a={a} M={M} N={N} K={K}")
    print(f"{'n':>4} {'k':>3} {'T=log table':>14} {'umax approx':>14} "
          f"{'quadrature':>14} {'L1 ratio':>12}")
    for n in range(1, N, args.step):
        for k in range(1, min(n, K - 1) + 1, args.step):
            t = tab[k - 1, n - 1]
            u = float(ngg.umax_log(a, M, n, k))
            q = float(ngg.ngg_quadrature_log(a, M, n, k))
            r = R[k - 1, n - 1] if n < N else float("nan")
            print(f"{n:4d} {k:3d} {t:14.6f} {u:14.6f} {q:14.6f} {r:12.8f}")
    print("\nlarge-n ratio table via quadrature method (n up to 200):")
    Rb = np.asarray(ngg.ngg_ratio_table(a, M, 200, K,
                                        method="quadrature"))
    for n in (50, 100, 199):
        row = " ".join(f"{Rb[k - 1, n - 1]:.6f}" for k in range(1, K, 2))
        print(f"  n={n:4d}: {row}")


if __name__ == "__main__":
    main()
