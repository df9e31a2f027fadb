#!/usr/bin/env python
"""Statistical acceptance vs the reference binary (BASELINE.md criterion:
posterior moments within 2 Monte-Carlo SE of libstb's own samplers).

Runs the reference ``demo`` binary (compiled from /root/reference into a
scratch dir) R times on seeded data, parses its data counts and posterior
estimates, feeds the IDENTICAL counts into this framework's Gibbs driver
(TI sweep in demo-compat mode: legacy odds, first indicators resampled),
and compares E[T_j], E[a], E[b].

Usage:
  python tools/oracle_compare.py [--ref-bin PATH] [--runs 8]
         [--iters 800] [--seed 7] [--chains 64]
Exit code 0 iff every statistic agrees within 2 combined SE (+ a small
absolute floor for CPU-vs-TPU arithmetic differences).
"""
import argparse
import os
import re
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF_SRC = "/root/reference"
BUILD = "/tmp/libstb_build"


def build_reference() -> str:
    demo = os.path.join(BUILD, "test", "demo")
    if os.path.exists(demo):
        return demo
    shutil.copytree(REF_SRC, BUILD, dirs_exist_ok=True)
    subprocess.run(["make", "-s"], cwd=os.path.join(BUILD, "lib"),
                   check=True, capture_output=True)
    subprocess.run(["make", "-s", "demo"], cwd=os.path.join(BUILD, "test"),
                   check=True, capture_output=True)
    return demo


def run_reference(demo: str, seed: int, iters: int, n_per: int):
    res = subprocess.run(
        [demo, "-s", str(seed), "-C", str(iters), "-H", "2", "-I", "5",
         "-N", str(n_per)],
        capture_output=True, text=True, timeout=600, check=True)
    out = res.stdout + "\n" + res.stderr   # yaps_message goes to stderr
    n = {}
    for m in re.finditer(r"n\[(\d+)\] =([ \d]+)= \d+", out):
        n[int(m.group(1))] = [int(x) for x in m.group(2).split()]
    T = {int(m.group(1)): float(m.group(2))
         for m in re.finditer(r"T\[(\d+)\]=([\d.]+)", out)}
    a = float(re.search(r"^a=([\d.]+)", out, re.M).group(1))
    b = float(re.search(r"^b=([\d.]+)", out, re.M).group(1))
    J = max(n) + 1
    nmat = np.asarray([n[j] for j in range(J)], np.int32)
    Tvec = np.asarray([T[j] for j in range(J)])
    return nmat, Tvec, a, b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=8)
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--n-per", type=int, default=40)
    ap.add_argument("--chains", type=int, default=64)
    args = ap.parse_args()

    demo = build_reference()
    ref_T, ref_a, ref_b = [], [], []
    nmat = None
    for r in range(args.runs):
        n, T, a, b = run_reference(demo, args.seed, args.iters, args.n_per)
        if nmat is None:
            nmat = n
        else:
            assert (nmat == n).all(), "data changed between seeded runs"
        ref_T.append(T)
        ref_a.append(a)
        ref_b.append(b)
    ref_T = np.asarray(ref_T)          # (R, J)
    ref_a = np.asarray(ref_a)
    ref_b = np.asarray(ref_b)

    import jax
    from libstb_tpu.core import agrid
    from libstb_tpu.models import driver, pyp

    data = pyp.from_counts(nmat)
    n_max = max(int(data.N.max()) + 2, 16)
    grid = agrid.make_grid(n_max, n_max, g=64)
    cfg = driver.GibbsConfig(iters=args.iters, bcycle=2, acycle=5,
                             sampler="TI", scale=float(nmat.shape[1]),
                             ti_legacy=True, ti_skip_first=False)
    out = driver.run_gibbs(jax.random.key(args.seed + 1), data, grid,
                           args.chains, 0.0, 0.0, cfg)
    # demo starts a/b at astart=bstart=0 clamped by the samplers; our
    # driver starts at the passed values -- use the same 0-clamped start.
    our_T = np.asarray(out["Tave"])[:, :]     # (C, J)
    our_a = np.asarray(out["aave"])
    our_b = np.asarray(out["bave"])

    def compare(name, ref_vals, our_vals, floor=0.0):
        rm, rs = ref_vals.mean(0), ref_vals.std(0, ddof=1) / np.sqrt(
            len(ref_vals))
        om, osd = our_vals.mean(0), our_vals.std(0, ddof=1) / np.sqrt(
            len(our_vals))
        band = 2 * np.sqrt(rs ** 2 + osd ** 2) + floor
        ok = np.abs(rm - om) <= band
        print(f"{name}: ref={np.round(rm, 4)} ours={np.round(om, 4)} "
              f"band={np.round(band, 4)} -> "
              f"{'OK' if np.all(ok) else 'MISMATCH'}")
        return bool(np.all(ok))

    ok = compare("E[T_j]", ref_T, our_T, floor=0.05)
    ok &= compare("E[a]  ", ref_a[:, None], our_a[:, None], floor=0.01)
    ok &= compare("E[b]  ", ref_b[:, None], our_b[:, None], floor=0.05)
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
