"""Test harness config: force CPU backend with 8 virtual devices.

The driver environment pre-imports jax (sitecustomize) with
JAX_PLATFORMS=axon pointing at a remote TPU tunnel; unit tests must run on
local CPU with 8 virtual devices for sharding coverage.  Because jax is
already imported before pytest starts, we must go through jax.config (env
mutation alone is too late for jax_platforms) -- but XLA_FLAGS is still read
at first backend init, which has not happened yet at conftest time.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
