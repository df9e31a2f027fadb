"""Test harness config: force an 8-device virtual CPU mesh and x64 so
f64 oracles are available.  TPU behaviour (f32) is tested explicitly by
passing dtype=float32 into the functions under test.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
