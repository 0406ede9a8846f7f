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
# persistent compile cache: the suite compiles hundreds of small kernels;
# warm runs skip all of it
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
