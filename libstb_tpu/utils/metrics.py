"""Throughput counters and profiling hooks.

The reference's observability is ad-hoc clock_gettime timing in test
programs plus per-table byte counters (SURVEY.md §5.1).  Here:

* ``Meter`` -- named rate counters (cells/s for fills, samples/s for
  sampler steps, acceptance fractions) with a one-line report in the
  spirit of S_report (stable.c:1025-1055);
* ``device_timer`` -- wall-time a device computation correctly through
  an async dispatch path (readback-forced, RPC overhead subtracted);
* ``trace`` -- context manager around jax.profiler for TensorBoard-style
  traces.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, Dict

import jax
import jax.numpy as jnp

__all__ = ["Meter", "device_timer", "trace", "rpc_overhead"]


@dataclass
class Meter:
    """Accumulating rate meter: ``add(units, seconds)`` then ``rate``."""
    name: str
    unit: str = "items/s"
    units: float = 0.0
    seconds: float = 0.0
    calls: int = field(default=0)

    def add(self, units: float, seconds: float):
        self.units += units
        self.seconds += seconds
        self.calls += 1

    @property
    def rate(self) -> float:
        return self.units / self.seconds if self.seconds > 0 else 0.0

    def report(self) -> str:
        return (f"{self.name}: {self.rate:.4g} {self.unit} "
                f"({self.units:.4g} in {self.seconds:.3f}s, {self.calls} calls)")


def rpc_overhead(reps: int = 5) -> float:
    """Measured dispatch+readback latency (subtract from device timings;
    dominant through the remote-TPU tunnel, ~25 ms)."""
    f = jax.jit(lambda x: x * 1.000001)
    y = f(jnp.ones((8, 128), jnp.float32))
    float(y[0, 0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(y)[0, 0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def device_timer(fn: Callable, *args, reps: int = 3,
                 overhead: float = 0.0) -> float:
    """Best-of-``reps`` seconds for fn(*args), completion forced by a
    scalar readback of the first output leaf."""
    def run():
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[-1])
    run()                                   # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - overhead, 1e-9)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace scope (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
