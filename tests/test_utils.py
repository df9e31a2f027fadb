"""utils: checkpoint round-trip, metrics, config, yaps facade."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libstb_tpu.utils import checkpoint, config, metrics, yaps


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "t": jnp.arange(12).reshape(3, 4),
        "a": jnp.asarray([0.5, 0.6]),
        "key": jax.random.key(7),
    }
    p = checkpoint.save(str(tmp_path / "ck"), state, meta={"iter": 42})
    assert os.path.exists(p)
    loaded, meta = checkpoint.load(p, like=state)
    assert meta["iter"] == 42
    np.testing.assert_array_equal(np.asarray(loaded["t"]),
                                  np.asarray(state["t"]))
    # key round-trips: same draws
    np.testing.assert_array_equal(
        np.asarray(jax.random.uniform(loaded["key"], (3,))),
        np.asarray(jax.random.uniform(state["key"], (3,))))


def test_checkpoint_load_without_like(tmp_path):
    # structure restored from the serialised treedef sidecar
    state = {"t": jnp.arange(6).reshape(2, 3), "cfg": (1.5, 2.5),
             "key": jax.random.key(3)}
    p = checkpoint.save(str(tmp_path / "ck2"), state, meta={"n": 1})
    loaded, meta = checkpoint.load(p)
    assert isinstance(loaded, dict) and set(loaded) == set(state)
    np.testing.assert_array_equal(np.asarray(loaded["t"]),
                                  np.asarray(state["t"]))
    assert tuple(np.asarray(x) for x in loaded["cfg"]) == (1.5, 2.5)
    np.testing.assert_array_equal(
        np.asarray(jax.random.uniform(loaded["key"], (2,))),
        np.asarray(jax.random.uniform(state["key"], (2,))))


def test_meter():
    m = metrics.Meter("fill", "cells/s")
    m.add(1000, 0.5)
    m.add(1000, 0.5)
    assert m.rate == 2000
    assert "fill" in m.report()


def test_device_timer_runs():
    f = jax.jit(lambda x: x * 2.0)
    dt = metrics.device_timer(f, jnp.ones((64, 64)), reps=2)
    assert dt > 0


def test_config_env_overrides(monkeypatch):
    monkeypatch.setenv("LIBSTB_GRID_POINTS", "32")
    monkeypatch.setenv("LIBSTB_USE_ASYMPT", "false")
    c = config.from_env(config.TableConfig)
    assert c.grid_points == 32 and c.use_asympt is False
    s = config.from_env(config.SamplerConfig)
    assert s.kernel == "slice"


def test_yaps_sink_and_quit():
    got = []
    yaps.set_sink(got.append)
    try:
        yaps.message("hello %d", 7)
        with pytest.raises(yaps.LibstbError):
            yaps.quit("fatal %s", "x")
    finally:
        yaps.set_sink(None)
    assert got == ["hello 7", "fatal x"]
