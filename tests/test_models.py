"""PYP model tests: sampler-equivalence methodology of check.c (§4.4):
mathematically equivalent samplers must agree on posterior means within
Monte-Carlo error; invariants on the latent state hold throughout."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from libstb_tpu.core import agrid
from libstb_tpu.models import driver, pyp


@pytest.fixture(scope="module")
def workload():
    data = pyp.crp_generate(seed=7, n_groups=2, dim=5, n_per_group=25,
                            a=0.5, b=1.0)
    grid = agrid.make_grid(64, 32, g=100, dtype=jnp.float64)
    return data, grid


def test_crp_counts_consistent(workload):
    data, _ = workload
    assert data.n.sum() == data.data_cat.size
    assert (data.N == data.n.sum(axis=1)).all()
    # first-occurrence flags: one per (group, category) with n>0
    assert data.first.sum() == (data.n > 0).sum()


def test_state_invariants_ti(workload):
    data, grid = workload
    C = 64
    t, T = pyp.init_state(data, C)
    a = jnp.full((C,), 0.5); b = jnp.full((C,), 1.0)
    key = jax.random.key(0)
    for k in jax.random.split(key, 5):
        t, T = pyp.ti_sweep(k, t, T, a, b, grid, data)
    t_np, T_np = np.asarray(t), np.asarray(T)
    n = data.n[None]
    assert (T_np == t_np.sum(axis=2)).all()
    assert (t_np <= n).all()
    assert (t_np[:, n[0] > 0] >= 1).all()


def test_state_invariants_ct(workload):
    data, grid = workload
    C = 64
    t, T = pyp.init_state(data, C)
    a = jnp.full((C,), 0.5); b = jnp.full((C,), 1.0)
    tmax = int(data.n.max()) + 1
    for k in jax.random.split(jax.random.key(1), 5):
        t, T = pyp.ct_sweep(k, t, T, a, b, grid, data, tmax)
    t_np, T_np = np.asarray(t), np.asarray(T)
    n = data.n[None]
    assert (T_np == t_np.sum(axis=2)).all()
    assert (t_np <= n).all()
    assert (t_np[:, n[0] > 0] >= 1).all()


def test_sampler_equivalence(workload):
    """TI, CT and CTW are kernels for the SAME posterior: ensemble
    posterior means of T must agree within MC error (check.c:98 design)."""
    data, grid = workload
    C = 256
    cfgs = {
        "TI": driver.GibbsConfig(iters=120, sampler="TI"),
        "CT": driver.GibbsConfig(iters=120, sampler="CT"),
        "CTW": driver.GibbsConfig(iters=120, sampler="CTW", window=5),
    }
    means, ses = {}, {}
    for name, cfg in cfgs.items():
        out = driver.run_gibbs(jax.random.key(2), data, grid, C, 0.5, 1.0, cfg)
        Tave = np.asarray(out["Tave"]).sum(axis=1)   # (C,) total tables
        means[name] = Tave.mean()
        ses[name] = Tave.std() / np.sqrt(C)
    for x in ("CT", "CTW"):
        diff = abs(means["TI"] - means[x])
        se = np.sqrt(ses["TI"] ** 2 + ses[x] ** 2)
        assert diff < 5 * se + 0.05, (x, means, ses)


def test_against_reference_binary_values():
    """Oracle cross-check: the reference compiled from /root/reference and
    run as  `check -a 0.5 -b 1.0 -N 50 -C 4000 -B 1000 -s 42 -S {CT,SA} -r 3`
    prints n[] = 30 2 14 3 1 and run-average T of 12.055 (CT) / 12.066 (SA)
    (its own TI sampler gives 10.87 -- biased, see pyp.ti_sweep docstring).
    Our TI (exact odds) and CT must both land on the exact samplers'
    value."""
    data = pyp.from_counts(np.array([30, 2, 14, 3, 1]))
    grid = agrid.make_grid(64, 40, g=100, dtype=jnp.float64)
    C = 512
    for name in ("TI", "CT"):
        cfg = driver.GibbsConfig(iters=300, sampler=name)
        out = driver.run_gibbs(jax.random.key(2), data, grid, C, 0.5, 1.0, cfg)
        Tave = np.asarray(out["Tave"]).sum(axis=1)
        m, se = Tave.mean(), Tave.std() / np.sqrt(C)
        assert abs(m - 12.06) < 5 * se + 0.06, (name, m, se)


def test_hyper_sampling_in_loop(workload):
    data, grid = workload
    cfg = driver.GibbsConfig(iters=60, sampler="TI", acycle=2, bcycle=2,
                             scale=5.0)
    out = driver.run_gibbs(jax.random.key(3), data, grid, 64, 0.5, 1.0, cfg)
    aave = float(out["aave_mean"]); bave = float(out["bave_mean"])
    assert 0.01 <= aave <= 0.98
    assert 0.01 <= bave <= 2000
    # posterior should have moved off the (arbitrary) inits
    assert np.isfinite(float(out["Tave_mean"].sum()))


def test_driver_grows_undersized_grid(workload):
    """A grid too small for the data is grown preflight (the S_extend
    analog, stable.c:564-815) and the run matches a big-grid run."""
    data, _ = workload
    tiny = agrid.make_grid(10, 10, g=100, dtype=jnp.float64)
    big = agrid.make_grid(64, 32, g=100, dtype=jnp.float64)
    cfg = driver.GibbsConfig(iters=60, bcycle=2, acycle=2, sampler="CT")
    key = jax.random.key(3)
    out_t = driver.run_gibbs(key, data, tiny, 8, 0.5, 1.0, cfg)
    out_b = driver.run_gibbs(key, data, big, 8, 0.5, 1.0, cfg)
    # grown grid covers the data; same key need not give identical draws
    # (grids differ in n_max), but the posterior means agree closely
    np.testing.assert_allclose(np.asarray(out_t["Tave_mean"]),
                               np.asarray(out_b["Tave_mean"]), rtol=0.12)
    assert np.isfinite(np.asarray(out_t["aave"])).all()


def test_hpyp_grows_for_dynamic_level0():
    """HPYP level-0 counts (sums of t1) can exceed any per-category data
    count; the driver must grow the grid to the reachable bound."""
    from libstb_tpu.models import hpyp
    data = pyp.crp_generate(seed=3, n_groups=6, dim=4, n_per_group=20,
                            a=0.5, b=1.0)
    # per-category max is ~20 but level-0 n0 can reach sum_j n[j,i] (~60+)
    small = agrid.make_grid(int(data.n.max()) + 2, int(data.n.max()) + 2,
                            g=64, dtype=jnp.float64)
    cfg = hpyp.HPYPConfig(iters=40, hyper_cycle=2)
    out = hpyp.run_hpyp(jax.random.key(0), data, small, 8,
                        0.5, 1.0, 0.5, 1.0, cfg)
    n0_bound = int(data.n.sum(axis=0).max())
    # T0 must be able to exceed the small grid's coverage and stay finite
    assert np.isfinite(np.asarray(out["T0ave"])).all()
    assert np.asarray(out["t0"]).max() <= n0_bound
    assert np.isfinite(np.asarray(out["a0ave"])).all()
