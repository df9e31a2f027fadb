"""Pallas TPU kernel for the Stirling ratio-table fill.

The reference fills its tables with a doubly-nested scalar loop over
(n, m) (lib/stable.c:380-387 log recurrence, 475-482 ratio recurrence).
The TPU kernel keeps the strict n -> n+1 dependency as a sequential grid
walk but makes every step a full (G, M) vector op:

* **M (lanes)**: all columns of a row update at once -- the recurrence
  needs only the previous row and a one-lane shift (``pltpu.roll``);
* **G (sublanes)**: a whole *discount grid* of tables fills
  simultaneously (the AGridTable workload, core/agrid.py) -- G tables
  at G different ``a`` values share every instruction, so the VPU's
  (8, 128) tiles are fully occupied even though n is sequential.

Per grid step the kernel produces a (G, R, M) slab of both outputs
(V ratios and Srel = log S(n, m) - log S(n, 1)); the carry row lives in
a VMEM scratch buffer that persists across the sequential TPU grid, which
is the in-register analog of the reference's heap-resident "remake
frontier" (stable.c:82-90).  Output DMA double-buffers against the next
slab's compute automatically (Pallas output pipelining).

The fill writes 8 bytes/cell (two f32 tables) and performs ~10 VPU ops +
one log per cell, so for wide rows it runs near the HBM write roofline;
``bench.py`` measures this against a copy-roofline on the same chip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fill_grid", "fill_table", "fill_table_cols", "unfold_cols",
           "scan_pos", "available"]


def available() -> bool:
    return jax.default_backend() == "tpu"


def _recip2(x):
    """Approximate reciprocal + 2 Newton steps on the 1e30-clamped
    operand: error ~2^-26 (below f32 divide rounding per step) at ~half
    the cost of the VPU's guarded divide sequence (tools/vpu_probe.py).
    The clamp keeps the kernels' +inf sentinel algebra NaN-free (inf*0
    inside a Newton step) while recip(1e30) ~ 1e-30 preserves the
    effectively-zero reciprocal the sentinels rely on."""
    xc = jnp.minimum(x, 1e30)
    r = pl.reciprocal(xc, approx=True)
    r = r * (2.0 - xc * r)
    return r * (2.0 - xc * r)


def _cumsum_lanes(x, m_max: int):
    """Cumulative sum along the lane (last) axis via log-shift adds.

    Mosaic has no native cumsum; log2(M) masked roll-adds implement the
    Hillis-Steele scan entirely in registers.
    """
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = 1
    while s < m_max:
        shifted = pltpu.roll(x, s, x.ndim - 1)
        x = x + jnp.where(col >= s, shifted, 0.0)
        s *= 2
    return x


def _kernel(am_ref, am1_ref, v_ref, srel_ref, carry_ref, rcarry_ref,
            sacc_ref, scomp_ref, s1_ref, *, rows: int, m_max: int,
            with_srel: bool):
    """One grid step: produce ``rows`` consecutive n-rows for all G tables.

    am_ref:  (G, M) = m * a_g          am1_ref: (G, M) = (m-1) * a_g
    v_ref:   (G, rows, M) output slab of V
    srel_ref:(G, rows, M) output slab of Srel (absent if not with_srel)
    carry_ref: (G, M) persistent scratch, last filled V row.
    sacc_ref/scomp_ref: (G, M) Kahan pair carrying Srel across rows.
    s1_ref: (G, 128) Kahan pair for S1 (lanes 0/1 = sum/comp) used for the
      fresh diagonal cell srel(n, n) = -S1(n).

    Srel propagates by the n-direction ratio update

        srel(n+1, m) = srel(n, m) + log( U(n, m) / (n - a) ),
        U(n, m) = (n - m a) + 1/V(n, m)            (S_U, stable.c:875-883)

    which costs ONE log per cell (vs log + O(log M) lane-cumsum for the
    within-row prefix form).  f32 increments into a growing accumulator
    would random-walk over 10^6 rows, so the accumulator is a Kahan
    (sum, comp) pair held in scratch -- the in-register equivalent of the
    reference's double frontier (stable.c:14-22, 389-449).
    """
    i = pl.program_id(0)
    am = am_ref[:]
    am1 = am1_ref[:]
    g = am.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (g, m_max), 1)
    inf = jnp.inf
    dt = carry_ref.dtype

    @pl.when(i == 0)
    def _():
        # base row n=1: V(1,1) sentinel +inf, all m>1 zero (so the
        # reciprocal row is [0, +inf, ...]); srel(1, .) = [0, -inf, ...];
        # S1(1) = 0.
        carry_ref[:] = jnp.where(col == 0, inf, 0.0).astype(dt)
        rcarry_ref[:] = jnp.where(col == 0, 0.0, inf).astype(dt)
        if with_srel:
            sacc_ref[:] = jnp.where(col == 0, 0.0, -inf).astype(dt)
            scomp_ref[:] = jnp.zeros((g, m_max), dt)
            s1_ref[:] = jnp.zeros((g, 128), dt)

    def row_body(r, _):
        global_row = i * rows + r            # output row index; n = row+1
        v_prev = carry_ref[:]
        r_prev = rcarry_ref[:]               # = 1 / v_prev, carried to
        is_base = global_row == 0            # avoid re-dividing per row

        # ratio recurrence (stable.c:475-482), n_new = global_row + 1:
        #   V(n, m) = (1 + (n-1 - m a) V(n-1, m))
        #             / (1 / V(n-1, m-1) + (n-1 - (m-1) a))
        nm1 = (global_row).astype(am.dtype)  # = n_new - 1
        recip_sh = pltpu.roll(r_prev, 1, 1)
        recip_sh = jnp.where(col == 0, 0.0, recip_sh)
        numer = 1.0 + (nm1 - am) * v_prev
        denom = recip_sh + (nm1 - am1)
        # the two divides were the largest ALU item in the row body;
        # _recip2's clamp handles the +inf sentinels (col-0 numer;
        # above-diagonal denom via the shifted 1/V = inf) while the
        # unclamped values still feed the products, so col-0 v stays
        # exactly +inf and above-diagonal r stays +inf; the ~1e-30
        # residues replacing exact zeros perturb neighbouring
        # denominators by a negligible ~1e-27 (the cols kernel's _VBIG
        # finite-sentinel algebra)
        v_new = numer * _recip2(denom)
        r_new = denom * _recip2(numer)       # = 1 / v_new
        # row 0 of the whole table is the base row itself
        v_new = jnp.where(is_base, v_prev, v_new)
        r_new = jnp.where(is_base, r_prev, r_new)
        carry_ref[:] = v_new
        rcarry_ref[:] = r_new
        v_ref[:, r, :] = v_new

        if with_srel:
            a_g = am[:, :1]                  # a (m=1 column of m*a)
            # S1 increment: S1(n+1) = S1(n) + log(n - a), Kahan into s1_ref
            d1 = jnp.log(jnp.maximum(nm1 - a_g, 1e-30))
            d1 = jnp.where(is_base, 0.0, d1)
            s1 = s1_ref[:, 0:1]
            c1 = s1_ref[:, 1:2]
            y1 = d1 - c1
            t1 = s1 + y1
            s1_ref[:, 0:1] = t1
            s1_ref[:, 1:2] = (t1 - s1) - y1

            # srel increment for surviving cells (2 <= m <= n_old):
            # d = log U(n, m) - log(n - a),  U = (n - m a) + 1/V(n, m)
            u = (nm1 - am) + r_prev
            d = jnp.log(jnp.maximum(u, 1e-30)) - d1
            d = jnp.where(is_base, 0.0, d)
            sacc = sacc_ref[:]
            comp = scomp_ref[:]
            y = d - comp
            t = sacc + y
            comp = (t - sacc) - y
            sacc = t
            # fresh diagonal cell m = n_new: srel(n, n) = -S1(n)
            ndiag = global_row            # col index of m = n_new
            on_diag = col == ndiag
            sacc = jnp.where(on_diag, -t1, sacc)
            sacc = jnp.where(col > ndiag, -inf, sacc)
            comp = jnp.where(col >= ndiag, 0.0, comp)
            sacc_ref[:] = sacc
            scomp_ref[:] = comp
            srel_ref[:, r, :] = sacc
        return 0

    jax.lax.fori_loop(0, rows, row_body, 0, unroll=False)


def _pick_row_block(g: int, m_max: int, n_max: int, with_srel: bool,
                    itemsize: int = 4,
                    vmem_budget: int = 56 * 1024 * 1024) -> int:
    """Largest power-of-two row block fitting the VMEM budget.

    Accounts for: carry scratch (+3 Kahan buffers with srel), the two
    (G, M) inputs, and double-buffered output slabs (n_outputs x 2 x
    G x rows x M).
    """
    row_bytes = g * m_max * itemsize
    scratch = (4 if with_srel else 1) * row_bytes + g * 128 * itemsize
    inputs = 2 * row_bytes * 2          # double-buffered too
    n_out = 2 if with_srel else 1
    avail = vmem_budget - scratch - inputs
    rows = avail // max(n_out * 2 * row_bytes, 1)
    if rows < 8:
        return 8                         # may still OOM; caller's problem
    rows = 1 << (int(rows).bit_length() - 1)
    return max(8, min(rows, 512, n_max))


@functools.partial(
    jax.jit,
    static_argnames=("n_max", "m_max", "row_block", "with_srel", "dtype",
                     "interpret"))
def fill_grid(avec, n_max: int, m_max: int, row_block: int | None = None,
              with_srel: bool = True, dtype=jnp.float32,
              interpret: bool = False):
    """Fill V (and Srel) tables for all discounts in ``avec`` at once.

    Returns (vtab, srel) with shape (G, n_max, m_max); row i holds n=i+1,
    column j holds m=j+1 (same layout/invariants as stirling.fill_rows,
    which is the correctness oracle in tests/test_pallas.py).

    G should be a multiple of 8 (f32 sublane tile) and m_max a multiple
    of 128 (lane tile) for full VPU occupancy; other sizes work but pad
    internally in Mosaic.
    """
    avec = jnp.asarray(avec, dtype)
    g = avec.shape[0]
    if row_block is None:
        row_block = _pick_row_block(g, m_max, n_max, with_srel,
                                    jnp.dtype(dtype).itemsize)
    rows = min(row_block, n_max)
    n_pad = pl.cdiv(n_max, rows) * rows
    grid = (n_pad // rows,)

    mvec = jnp.arange(1, m_max + 1, dtype=dtype)
    am = avec[:, None] * mvec[None, :]
    am1 = avec[:, None] * (mvec[None, :] - 1.0)

    out_shape = [jax.ShapeDtypeStruct((g, n_pad, m_max), dtype)]
    out_specs = [pl.BlockSpec((g, rows, m_max), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)]
    scratch = [pltpu.VMEM((g, m_max), dtype), pltpu.VMEM((g, m_max), dtype)]
    if with_srel:
        out_shape.append(jax.ShapeDtypeStruct((g, n_pad, m_max), dtype))
        out_specs.append(pl.BlockSpec((g, rows, m_max), lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM))
        scratch += [pltpu.VMEM((g, m_max), dtype),
                    pltpu.VMEM((g, m_max), dtype),
                    pltpu.VMEM((g, 128), dtype)]
        kernel = functools.partial(_kernel, rows=rows, m_max=m_max,
                                   with_srel=True)
    else:
        def kernel(am_ref, am1_ref, v_ref, carry_ref, rcarry_ref):
            return _kernel(am_ref, am1_ref, v_ref, None, carry_ref,
                           rcarry_ref, None, None, None,
                           rows=rows, m_max=m_max, with_srel=False)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, m_max), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, m_max), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if with_srel else out_specs[0],
        out_shape=out_shape if with_srel else out_shape[0],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=16 * g * n_pad * m_max,
            bytes_accessed=(2 if with_srel else 1) * 4 * g * n_pad * m_max,
            transcendentals=(g * n_pad * m_max) if with_srel else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(am, am1)

    if with_srel:
        vtab, srel = outs
    else:
        vtab, srel = outs, None
    if n_pad != n_max:
        vtab = vtab[:, :n_max]
        srel = srel[:, :n_max] if srel is not None else None
    return vtab, srel


# ---------------------------------------------------------------------------
# Single-table fill with sublane folding (the n=10^6 north-star kernel)
# ---------------------------------------------------------------------------

_FOLD = 8       # f32 sublane tile
_UNROLL = 8     # manual row unroll inside the fori_loop


def _kernel_folded(a_ref, v_ref, srel_ref, carry_ref, rcarry_ref,
                   sacc_ref, scomp_ref, lg_ref, s1_ref, *, rows: int,
                   m_max: int, with_srel: bool):
    """One grid step of the FOLDED single-table fill.

    A single table at G=1 would occupy 1 of 8 sublanes in the grid kernel,
    capping it at ~1/8 of the VPU; here one n-row of M columns folds into
    an (8, M/8) tile -- m = sublane * (M/8) + lane -- so every vector op
    runs at full occupancy.  The HBM layout is unchanged: an (N, 8, M/8)
    output reshapes to (N, M) row-major for free.

    Performance structure (measured on v5e; see BENCH notes): the fill is
    bound by the strict row-to-row dependence chain, so every per-row op
    counts.  Hence:

    * all loop state lives in fori_loop REGISTER carries; scratch refs are
      touched once per grid step (VMEM round-trips per row cost ~2x);
    * zero per-row scalar work: the row-dependent coefficients
      (n-1 - m a) etc. are vreg carries advanced by +1 vector adds (a
      per-row int->float scalar conversion alone costs ~12 ns);
    * the m-1 boundary between sublanes uses two full-vreg rolls
      (roll(roll(x, 1, lane), 1, sublane) puts x[s-1, L-1] at lane 0 of
      sublane s) -- a strided 1-lane slice lowers catastrophically;
    * the Srel transcendental is pipelined one row ahead: the log's input
      is ready right after the divide, its value is consumed a full row
      later, so it sits off the critical chain;
    * grid steps past the diagonal run a LEAN body: no base-row/diagonal
      selects, and no column-0 masks -- once the diagonal has passed the
      last column the inf/0 sentinel algebra makes them redundant
      (numer(0) = 1 + c*inf = inf, so v(0) stays inf and r(0) stays 0
      for any finite wrapped-around boundary garbage);
    * Srel increments use d = log(u / (n-a)) (one vector log + divide),
      which is also MORE accurate than log(u) - log(n-a): the ratio is
      near 1 where f32 log is exact to ~1e-7 absolute (verified against
      the native long-double oracle: max |dSrel| 2.4e-3 at n=8192 vs
      1.6e-2 for the difference form).

    Same V-ratio recurrence + Kahan-carried Srel/S1 semantics as _kernel
    (stable.c:475-482 / 875-883).
    """
    i = pl.program_id(0)
    L = m_max // _FOLD
    a = a_ref[0]
    dt = carry_ref.dtype
    sub = jax.lax.broadcasted_iota(jnp.int32, (_FOLD, L), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_FOLD, L), 1)
    midx = sub * L + lane                       # global column (m-1)
    inf = jnp.inf
    col0 = midx == 0
    lane0 = lane == 0

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.where(col0, inf, 0.0).astype(dt)
        rcarry_ref[:] = jnp.where(col0, 0.0, inf).astype(dt)
        if with_srel:
            sacc_ref[:] = jnp.where(col0, 0.0, -inf).astype(dt)
            scomp_ref[:] = jnp.zeros((_FOLD, L), dt)
            lg_ref[:] = jnp.zeros((_FOLD, L), dt)
            s1_ref[0] = jnp.zeros((), dt)
            s1_ref[1] = jnp.zeros((), dt)

    nm1_0 = (i * rows).astype(dt)
    am = a * (midx + 1).astype(dt)
    cm0 = nm1_0 - am                 # nm1 - m a
    cma0 = cm0 + a                   # nm1 - (m-1) a
    cmu0 = cm0 + 1.0                 # (nm1+1) - m a  (next row's u coeff)
    one = jnp.ones((_FOLD, L), dt)
    nma0 = (nm1_0 + 1.0 - a) * one   # (nm1+1) - a    (next row's d1 arg)

    def shift_m(x):
        y = pltpu.roll(x, 1, 1)
        y2 = pltpu.roll(y, 1, 0)
        return jnp.where(lane0, y2, y)

    def row_lean(r, st):
        v_prev, r_prev, sacc, comp, lg, cm, cma, cmu, nma, s1, c1 = st
        rsh = shift_m(r_prev)
        numer = 1.0 + cm * v_prev
        denom = rsh + cma
        v_new = numer * _recip2(denom)
        r_new = denom * _recip2(numer)
        v_ref[r, :, :] = v_new
        if with_srel:
            # consume last row's pipelined log-ratio
            y = lg - comp
            t = sacc + y
            comp = (t - sacc) - y
            sacc = t
            srel_ref[r, :, :] = sacc
            u = cmu + r_new
            lg = jnp.log(u / nma)
        return (v_new, r_new, sacc, comp, lg, cm + one, cma + one,
                cmu + one, nma + one, s1, c1)

    def row_full(r, st):
        v_prev, r_prev, sacc, comp, lg, cm, cma, cmu, nma, s1, c1 = st
        global_row = i * rows + r
        is_base = global_row == 0
        rsh = shift_m(r_prev)
        rsh = jnp.where(col0, 0.0, rsh)
        numer = 1.0 + cm * v_prev
        denom = rsh + cma
        v_new = numer * _recip2(denom)
        r_new = denom * _recip2(numer)
        v_new = jnp.where(is_base, v_prev, v_new)
        r_new = jnp.where(is_base, r_prev, r_new)
        v_ref[r, :, :] = v_new
        if with_srel:
            nm1 = (global_row).astype(dt)
            # scalar-core S1 Kahan (only the diagonal fix-up needs it)
            d1 = jnp.log(jnp.maximum(nm1 - a, 1e-30))
            d1 = jnp.where(is_base, 0.0, d1)
            y1 = d1 - c1
            t1 = s1 + y1
            c1 = (t1 - s1) - y1
            s1 = t1
            d = jnp.where(is_base, 0.0, lg)
            y = d - comp
            t = sacc + y
            comp = (t - sacc) - y
            sacc = t
            ndiag = global_row
            sacc = jnp.where(midx == ndiag, -s1, sacc)
            sacc = jnp.where(midx > ndiag, -inf, sacc)
            comp = jnp.where(midx >= ndiag, 0.0, comp)
            srel_ref[r, :, :] = sacc
            u = cmu + r_new
            lg = jnp.log(jnp.maximum(u / nma, 1e-30))
        return (v_new, r_new, sacc, comp, lg, cm + one, cma + one,
                cmu + one, nma + one, s1, c1)

    if with_srel:
        st0 = (carry_ref[:], rcarry_ref[:], sacc_ref[:], scomp_ref[:],
               lg_ref[:], cm0, cma0, cmu0, nma0, s1_ref[0], s1_ref[1])
    else:
        z = jnp.zeros((), dt)
        zv = jnp.zeros((_FOLD, L), dt)
        st0 = (carry_ref[:], rcarry_ref[:], zv, zv, zv, cm0, cma0, cmu0,
               nma0, z, z)

    def finish(st):
        carry_ref[:], rcarry_ref[:] = st[:2]
        if with_srel:
            sacc_ref[:], scomp_ref[:], lg_ref[:] = st[2:5]
            s1_ref[0] = st[9]
            s1_ref[1] = st[10]

    unroll = _UNROLL if rows % _UNROLL == 0 else 1

    @pl.when(i * rows < m_max)
    def _():
        def body(rb, st):
            for u in range(unroll):
                st = row_full(rb * unroll + u, st)
            return st
        finish(jax.lax.fori_loop(0, rows // unroll, body, st0))

    @pl.when(i * rows >= m_max)
    def _():
        def body(rb, st):
            for u in range(unroll):
                st = row_lean(rb * unroll + u, st)
            return st
        finish(jax.lax.fori_loop(0, rows // unroll, body, st0))


@functools.partial(
    jax.jit,
    static_argnames=("n_max", "m_max", "row_block", "with_srel", "dtype",
                     "interpret", "fold_raw"))
def fill_table(a, n_max: int, m_max: int, row_block: int | None = None,
               with_srel: bool = True, dtype=jnp.float32,
               interpret: bool = False, fold_raw: bool = False):
    """Fill ONE table's V (and Srel) at discount ``a`` to (n_max, m_max).

    Returns (vtab, srel) shaped (n_max, m_max), same layout/invariants as
    stirling.fill_rows (the oracle in tests/test_pallas.py); with
    ``fold_raw=True`` the kernel's raw (n_max, 8, m_max//8) folded layout
    is returned instead, skipping the (n, m) reshape, which on TPU is a
    full relayout copy (the production path -- see the return site).
    m_max must be a multiple of 8; multiples of 1024 give full (8, 128)
    tiles.

    This is the BASELINE north-star path (fill to n=10^6 at >80% of the
    HBM roofline): unlike fill_grid at G=1, the folded layout keeps all 8
    sublanes busy, so throughput is write-bandwidth-bound.
    """
    if m_max % _FOLD:
        raise ValueError(f"m_max={m_max} must be a multiple of {_FOLD}")
    a = jnp.asarray(a, dtype).reshape(1)
    L = m_max // _FOLD
    if row_block is None:
        row_block = _pick_row_block(_FOLD, L, n_max, with_srel,
                                    jnp.dtype(dtype).itemsize)
    rows = min(row_block, n_max)
    n_pad = pl.cdiv(n_max, rows) * rows
    grid = (n_pad // rows,)

    out_shape = [jax.ShapeDtypeStruct((n_pad, _FOLD, L), dtype)]
    out_specs = [pl.BlockSpec((rows, _FOLD, L), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    scratch = [pltpu.VMEM((_FOLD, L), dtype), pltpu.VMEM((_FOLD, L), dtype)]
    if with_srel:
        out_shape.append(jax.ShapeDtypeStruct((n_pad, _FOLD, L), dtype))
        out_specs.append(pl.BlockSpec((rows, _FOLD, L), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        scratch += [pltpu.VMEM((_FOLD, L), dtype),
                    pltpu.VMEM((_FOLD, L), dtype),
                    pltpu.VMEM((_FOLD, L), dtype),
                    pltpu.SMEM((2,), dtype)]
        kernel = functools.partial(_kernel_folded, rows=rows, m_max=m_max,
                                   with_srel=True)
    else:
        def kernel(a_ref, v_ref, carry_ref, rcarry_ref):
            return _kernel_folded(a_ref, v_ref, None, carry_ref,
                                  rcarry_ref, None, None, None, None,
                                  rows=rows, m_max=m_max, with_srel=False)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=out_specs if with_srel else out_specs[0],
        out_shape=out_shape if with_srel else out_shape[0],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=16 * n_pad * m_max,
            bytes_accessed=(2 if with_srel else 1) * 4 * n_pad * m_max,
            transcendentals=(n_pad * m_max) if with_srel else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a)

    if with_srel:
        vtab, srel = outs
    else:
        vtab, srel = outs, None
    if fold_raw:
        # keep the kernel's (n, _FOLD, L) layout: the (n, m) reshape below
        # is NOT free on TPU -- XLA materialises it as a relayout copy
        # (copy_bitcast_fusion, ~2x the fill's own HBM write traffic).
        # Column j lives at [:, j // L, j % L]; StirlingTable._cell
        # handles the decomposition (fold layout).
        return vtab[:n_max], srel[:n_max] if srel is not None else None
    vtab = vtab.reshape(n_pad, m_max)[:n_max]
    srel = srel.reshape(n_pad, m_max)[:n_max] if srel is not None else None
    return vtab, srel


# ---------------------------------------------------------------------------
# Column-sequential fill with a chunked parallel scan over n
# (the n=10^6 single-table kernel, v2)
# ---------------------------------------------------------------------------
#
# The folded row kernel above walks n sequentially: ~10^6 dependent row
# steps whose divide/roll chain costs ~100 ns each, capping a 2^20-row
# fill at ~12% of the HBM roofline (BENCH_r02) no matter how lean the
# body gets.  This kernel flips the axes.  Given column m-1, the ratio
# recurrence along n for column m (stable.c:475-482),
#
#     V(n, m) = (1 + (n-1 - m a) V(n-1, m))
#               / (1/V(n-1, m-1) + (n-1 - (m-1) a)),
#
# is AFFINE in the unknown column:  V(n) = A_n V(n-1) + B_n  with
#
#     B_n = 1 / (1/V(n-1, m-1) + c1) = vL / (1 + c1 vL),   vL = V(n-1, m-1)
#     A_n = c2 B_n,     c1 = n-1 - (m-1) a,   c2 = n-1 - m a.
#
# Affine maps compose associatively, so one column is a parallel prefix:
# the N rows split into C contiguous chunks of H = N/C rows laid out as
# an (H, S, 128) VMEM slab with chunk = sublane*128 + lane and h the
# sequential axis.  Two phases per column (a third, per-chunk map
# composition, is FUSED into the previous column's replay -- see below):
#
#   pass A: Hillis-Steele compose-scan over the C chunk maps in linear
#           (sublane, lane) order (log2 C masked roll steps) -> the
#           V value entering each chunk;
#   pass B: replay each chunk's rows applying v = A v + B, emitting V,
#           log-S, and the NEXT column's maps from the in-register
#           v(n-1) -- so the left-column shift never touches memory.
#           While emitting, the next column's maps are ALSO composed
#           into per-chunk accumulators on the fly (3 extra FMAs per
#           cell, all off the replay's critical dependence chain), so
#           the v2 kernel's separate composition pass over the map
#           slabs -- 2 VMEM loads + its own loop per cell -- vanishes.
#           Only B is stored per row: A = (r - m a) B is recomputed
#           from a +1-advancing register carry, halving map traffic and
#           map scratch (the freed VMEM admits larger chunk counts).
#           Measured on v5e at (2^20, 1024), V+Srel, chained-in-jit
#           timing: 39 ms/fill = 219 GB/s (v2 was equal within noise --
#           the kernel is issue-bound, not VMEM-bound -- but v3 is the
#           simpler structure); V-only 20 ms; folded row walk 109 ms.
#
# Srel comes out even better than in the row kernels: since
# Srel(n, m) = Srel(n, m-1) + log V(n, m), the log-S accumulation runs
# ALONG m -- M ~ 10^3 Kahan-compensated adds per row instead of the row
# walk's 10^6 -- and the m=1 column is exactly 0, no S1 carry needed.
#
# Diagonal/sentinel algebra (all automatic, no masks in steady state):
# column m=1 carries vL = 1e30 (a finite stand-in for the +inf sentinel:
# B = 1e30/(1 + c1 1e30) rounds to 1/c1 in f32 for any |c1| < 1e7);
# rows above the diagonal have vL = 0 -> (A, B) = (0, 0), which both
# zeroes V(n<m) exactly and resets the prefix scan at the diagonal; the
# only forced cells are row n=1 (maps (0,0) for m >= 2), applied at the
# h=0 special step of each pass, off the steady-state path.
#
# Layout: the scan produces rows in (h, chunk) order, so outputs are
# stored COLUMN-MAJOR and n-permuted: out[m-1, h, s, l] holds row
# r = n-1 = (s*128 + l) * H + h.  Any bijective layout serves the
# table's random (n, m) gathers equally (the reference itself packs
# triangular blocks, stable.c:160-233); scan_pos() maps a natural row
# to its slot and unfold_cols() unpermutes for oracle tests.

_SCAN_C = 4096          # chunks = (32 sublanes) x (128 lanes)
_VBIG = 1e30            # finite stand-in for the V(n,1) = +inf sentinel


def scan_pos(i, n_pad: int, chunks: int):
    """Flat position of natural 0-based row ``i`` in a fill_table_cols
    column: i = c*H + h is stored at h*C + c."""
    h = n_pad // chunks
    return (i % h) * chunks + (i // h)


def unfold_cols(tab, n_max: int, chunks: int):
    """Column-major permuted table -> natural (n_max, M).  Accepts the
    kernel's raw (M, H, S, 128) output or a flattened (M, n_pad) view
    (oracle/test path; on TPU the flatten is a relayout copy, which is
    exactly why the production table keeps the 4-D layout)."""
    m = tab.shape[0]
    tab = tab.reshape(m, -1)
    n_pad = tab.shape[1]
    h = n_pad // chunks
    return tab.reshape(m, h, chunks).transpose(2, 1, 0).reshape(n_pad, m)[
        :n_max]


def _lin_shift(x, k: int, sub, lane):
    """out[c] = x[c - k] over the linearized (sublane, lane) chunk order;
    entries with c < k are garbage (callers mask on c >= k)."""
    del sub
    s = x.shape[0]
    if k % 128 == 0:
        return pltpu.roll(x, k // 128, 0)
    y = pltpu.roll(x, k % 128, 1)
    if s > 1:
        y2 = pltpu.roll(y, 1 + k // 128, 0)
        # lanes that did NOT wrap around still need the whole-sublane part
        # of the shift when k > 128
        if k // 128 > 0:
            y = pltpu.roll(y, k // 128, 0)
    else:
        y2 = y
    return jnp.where(lane < (k % 128), y2, y)


def _kernel_cols(a_ref, v_ref, srel_ref, carry_b, acc_a, acc_b, sacc_ref,
                 scomp_ref, *, h_len: int, s_sub: int, with_srel: bool,
                 kahan: bool, debug_srel: str = "full"):
    """One grid step = one column m = j+1 for all n at once (v3, fused).

    a_ref: (1,) SMEM, the discount.
    v_ref/srel_ref: (1, H, S, 128) output blocks for V and Srel.
    carry_b: (H, S, 128) scratch, this column's affine offsets B (the
      slope A = (r - m a) B is recomputed from a register carry);
      overwritten with column j+1's offsets during the replay.
    acc_a/acc_b: (S, 128) scratch, this column's chunk-composed maps,
      written by the PREVIOUS grid step's fused composition; the row-0
      forced map (0,0) is already folded in at emission.
    sacc_ref/scomp_ref: (H, S, 128) Kahan pair accumulating Srel along m.
    """
    j = pl.program_id(0)
    dt = carry_b.dtype
    H, S, L = h_len, s_sub, 128
    a0 = a_ref[0]
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
    cidx = sub2 * L + lane2                      # chunk index (S, L)
    c0mask = cidx == 0                           # chunk 0 <-> rows 0..H-1
    # manual unroll (Mosaic forbids partial fori unroll): blocks of u
    # rows; the h=0 row-0 forcing runs outside the fori so the
    # steady-state loop body stays uniform
    u = _UNROLL if h_len % _UNROLL == 0 and h_len > _UNROLL else 1
    nblk = H // u

    @pl.when(j == 0)
    def _():
        # column m=1: V = +inf sentinel, Srel = 0; prepare column m=2's
        # affine offsets in closed form: B = 1/(r - a), A = (r - 2a) B.
        # (NOT via the B = vL/(1 + c vL) route with a huge-vL sentinel:
        # the TPU divide loses ~2 digits at extreme exponents -- measured
        # 1.6e-5 relerr for 1e30/(1+c 1e30) vs 1.2e-7 for 1/c -- and the
        # m=2 column contracts so weakly that a systematic map bias
        # amplifies ~n-fold, to 1e-2 by n=8192.)  The row-0 forced map
        # (0,0) is stored directly, and the chunk maps are composed here
        # once -- every later column's composition rides the replay.
        hh = jax.lax.broadcasted_iota(jnp.int32, (H, S, L), 0)
        cc = (jax.lax.broadcasted_iota(jnp.int32, (H, S, L), 1) * L
              + jax.lax.broadcasted_iota(jnp.int32, (H, S, L), 2))
        rvec = (cc * H + hh).astype(dt)          # global row r = n-1
        c1 = rvec - a0                           # r - (m-1) a at m = 2
        bb = 1.0 / c1
        bb = jnp.where((hh == 0) & (cc == 0), 0.0, bb)   # row-0 force
        carry_b[:] = bb
        v_ref[0] = jnp.full((H, S, L), jnp.inf, dt)
        if with_srel:
            sacc_ref[:] = jnp.zeros((H, S, L), dt)
            if kahan:
                scomp_ref[:] = jnp.zeros((H, S, L), dt)
            srel_ref[0] = jnp.zeros((H, S, L), dt)
        # one-time composition of the m=2 chunk maps (A = (c1 - a) B)
        c_h = (cidx * H).astype(dt)              # chunk-start row r
        cB0 = c_h - 2.0 * a0                     # r - 2a at chunk starts

        def compose(i, st):
            aac, bac, cB = st
            for q in range(u):
                bq = carry_b[i * u + q]
                aq = cB * bq
                aac, bac = aq * aac, aq * bac + bq
                cB = cB + 1.0
            return aac, bac, cB

        aacc, bacc, cB = compose(0, (jnp.zeros((S, L), dt) + 1.0,
                                     jnp.zeros((S, L), dt), cB0))
        # fori_loop from block 1; block 0 ran above to seed with identity
        aacc, bacc, _ = jax.lax.fori_loop(1, nblk, compose,
                                          (aacc, bacc, cB))
        acc_a[:] = aacc
        acc_b[:] = bacc

    @pl.when(j > 0)
    def _():
        jf = j.astype(dt)
        # ---- pass A: compose-scan over chunk maps (linear chunk order);
        # the per-chunk maps were fused into the previous column's replay
        aacc = acc_a[:]
        bacc = acc_b[:]
        if debug_srel != "nopassa":              # ablation: skip the scan
            k = 1
            while k < S * L:
                a_s = _lin_shift(aacc, k, sub2, lane2)
                b_s = _lin_shift(bacc, k, sub2, lane2)
                ok = cidx >= k
                aacc, bacc = (jnp.where(ok, aacc * a_s, aacc),
                              jnp.where(ok, aacc * b_s + bacc, bacc))
                k *= 2
        # carry INTO chunk c = inclusive map of chunks < c applied to
        # v(row -1) = 0  ->  just the exclusive-scan B
        v_in = jnp.where(c0mask, 0.0, _lin_shift(bacc, 1, sub2, lane2))

        # ---- pass B: replay rows; emit V, Srel, and column j+1's maps,
        # composing the new maps into chunk accumulators as they appear.
        # Register carries per chunk: cB = r - (j+1) a, which is BOTH the
        # current column's slope coefficient (A = cB B, since m = j+1)
        # and the next column's denominator coefficient c1' = r - (m'-1)a.
        #
        # VMEM access structure (v4): the replay's per-row slab accesses
        # are BATCHED u rows at a time -- one (u, S, L) load of the B
        # offsets, one store each for V / new-B / Srel / Kahan state per
        # unrolled block.  Measured on v5e (tools/vpu_probe.py): a single
        # dynamic (S, 128) slab access costs ~5.5-6.4 ns while the same
        # access batched 8-wide costs ~3.0 ns/tile, and the v3 kernel's 8
        # single accesses per row were the dominant cost (V-only 19 us/col
        # vs V+Srel 39 us/col, ALU model ~18 ns/row).  The row registers
        # within a block are stacked/unstacked for free (vreg aliasing).
        c_h = (cidx * H).astype(dt)              # chunk-start row r
        cB0 = c_h - (jf + 1.0) * a0

        def block(rb, st, first=False):
            v, cB, aac, bac = st
            off = pl.multiple_of(rb * u, u)
            bq_blk = carry_b[pl.ds(off, u)]      # one (u, S, L) load
            if debug_srel == "noalu":            # ablation: structure only
                vblk = bq_blk * 1.0001
                v_ref[0, pl.ds(off, u)] = vblk
                carry_b[pl.ds(off, u)] = vblk
                srel_ref[0, pl.ds(off, u)] = vblk
                return vblk[u - 1], cB + float(u), aac, bac
            v_list, bn_list = [], []
            for q in range(u):
                bq = bq_blk[q]
                # v_new = B (cB v + 1) = (cB bq) v + bq: slope cB*bq is
                # off the row-to-row chain, so the serial dependence is
                # one fma per row
                v_new = (cB * bq) * v + bq
                num = cB * v + 1.0               # off-chain, feeds bn
                # bn = v / num via the shared clamped recip+Newton
                # chain (err ~1e-7 rel, below the f32 recurrence noise)
                bn = v * _recip2(num)
                if first and q == 0:
                    bn = jnp.where(c0mask, 0.0, bn)
                an = (cB - a0) * bn              # next col slope coeff
                aac, bac = an * aac, an * bac + bn
                v_list.append(v_new)
                bn_list.append(bn)
                v = v_new
                cB = cB + 1.0
            vblk = jnp.stack(v_list)
            v_ref[0, pl.ds(off, u)] = vblk
            carry_b[pl.ds(off, u)] = jnp.stack(bn_list)
            if with_srel:
                if debug_srel == "copy":         # ablation: store cost only
                    srel_ref[0, pl.ds(off, u)] = vblk
                    return v, cB, aac, bac
                lg = jnp.log(vblk)               # batched (u, S, L) log
                if debug_srel == "log":          # ablation: + log cost
                    srel_ref[0, pl.ds(off, u)] = lg
                    return v, cB, aac, bac
                sacc = sacc_ref[pl.ds(off, u)]
                if kahan:
                    comp = scomp_ref[pl.ds(off, u)]
                    y = lg - comp
                    t = sacc + y
                    scomp_ref[pl.ds(off, u)] = jnp.where(
                        jnp.isfinite(t), (t - sacc) - y, 0.0)
                else:
                    t = sacc + lg
                sacc_ref[pl.ds(off, u)] = t
                srel_ref[0, pl.ds(off, u)] = t
            return v, cB, aac, bac

        st = (v_in, cB0, jnp.zeros((S, L), dt) + 1.0, jnp.zeros((S, L), dt))
        st = block(0, st, first=True)
        _, _, aacc2, bacc2 = jax.lax.fori_loop(1, nblk, block, st)
        acc_a[:] = aacc2
        acc_b[:] = bacc2


@functools.partial(
    jax.jit,
    static_argnames=("n_max", "m_max", "chunks", "with_srel", "kahan",
                     "dtype", "interpret", "debug_srel"))
def fill_table_cols(a, n_max: int, m_max: int, chunks: int = _SCAN_C,
                    with_srel: bool = True, kahan: bool = True,
                    dtype=jnp.float32, interpret: bool = False,
                    debug_srel: str = "full"):
    """Fill ONE table at discount ``a`` by the column-sequential chunked
    parallel scan (see the block comment above).

    Returns (vtab, srel, n_pad): arrays in the kernel's raw 4-D
    (m_max, H, chunks//128, 128) COLUMN-MAJOR, n-permuted layout --
    natural row i of column j lives at flat position
    scan_pos(i, n_pad, chunks) of the (m_max, n_pad) flattened view,
    i.e. index [j, i % H, (i//H) // 128, (i//H) % 128]; unfold_cols()
    restores the (n, m) layout.  The 4-D layout is deliberate: a
    .reshape(m_max, n_pad) on TPU is a full relayout copy (~2x the
    fill's own HBM traffic), see the return-site comment.  ``chunks``
    must be a multiple of 128 (the lane count); n is padded to a
    multiple of it.  f32 row indexing limits n_max to < 2^24.
    """
    if chunks % 128:
        raise ValueError(f"chunks={chunks} must be a multiple of 128")
    if n_max >= (1 << 24):
        raise ValueError("fill_table_cols: n_max must be < 2^24 (f32 row "
                         "index exactness)")
    S = chunks // 128
    H = pl.cdiv(n_max, chunks)
    n_pad = H * chunks
    a = jnp.asarray(a, dtype).reshape(1)

    out_shape = [jax.ShapeDtypeStruct((m_max, H, S, 128), dtype)]
    out_specs = [pl.BlockSpec((1, H, S, 128), lambda j: (j, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    scratch = [pltpu.VMEM((H, S, 128), dtype),       # carry_b
               pltpu.VMEM((S, 128), dtype),          # acc_a
               pltpu.VMEM((S, 128), dtype)]          # acc_b
    if with_srel:
        out_shape.append(jax.ShapeDtypeStruct((m_max, H, S, 128), dtype))
        out_specs.append(pl.BlockSpec((1, H, S, 128), lambda j: (j, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        scratch.append(pltpu.VMEM((H, S, 128), dtype))
        if kahan:
            scratch.append(pltpu.VMEM((H, S, 128), dtype))
        kernel = functools.partial(_kernel_cols, h_len=H, s_sub=S,
                                   with_srel=True, kahan=kahan,
                                   debug_srel=debug_srel)
        if not kahan:
            def kernel(a_ref, v_ref, srel_ref, cb, aa, ab, sa):  # noqa: F811
                return _kernel_cols(a_ref, v_ref, srel_ref, cb, aa, ab, sa,
                                    None, h_len=H, s_sub=S,
                                    with_srel=True, kahan=False,
                                    debug_srel=debug_srel)
    else:
        def kernel(a_ref, v_ref, cb, aa, ab):
            return _kernel_cols(a_ref, v_ref, None, cb, aa, ab, None, None,
                                h_len=H, s_sub=S, with_srel=False,
                                kahan=False)

    outs = pl.pallas_call(
        kernel,
        grid=(m_max,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=out_specs if with_srel else out_specs[0],
        out_shape=out_shape if with_srel else out_shape[0],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=24 * m_max * n_pad,
            bytes_accessed=(2 if with_srel else 1) * 4 * m_max * n_pad,
            transcendentals=(m_max * n_pad) if with_srel else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(a)

    if with_srel:
        vtab, srel = outs
    else:
        vtab, srel = outs, None
    # Returned in the kernel's raw 4-D layout (m_max, H, S, 128): the
    # obvious .reshape(m_max, n_pad) is NOT free here -- XLA materialises
    # it as a full relayout copy (copy_bitcast_fusion, ~8 GB of extra HBM
    # traffic at the (2^20, 1024) north-star shape, measured 26 of the
    # 39 ms/fill in round 4).  Queries index the 4-D layout directly
    # (StirlingTable._cell); natural row i of column j lives at
    # [j, i % H, (i // H) // 128, (i // H) % 128].
    return vtab, srel, n_pad
