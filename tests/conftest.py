"""Test configuration: run everything on CPU with 8 virtual devices.

SURVEY.md §4: jax runs the same code on CPU — this is the "fake backend"
the reference never had.  Multi-chip sharding logic is tested on a
virtual 8-device CPU mesh via --xla_force_host_platform_device_count.
"""

import os

# Set CUBURN_TEST_TPU=1 to run the suite against the real chip: ALL
# CPU forcing must stay inside this guard — on a standard JAX install
# (no sitecustomize) the env var alone decides the platform, so an
# unconditional setdefault would silently run the "TPU" suite on CPU.
if not os.environ.get("CUBURN_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    # The suite assumes an 8-device virtual mesh: REPLACE any
    # pre-existing count (a substring check would silently keep e.g.
    # =4 from an unrelated CI job and run the sharding tests on the
    # wrong mesh size)
    import re
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   flags).strip()
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
    # The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS via
    # the config API, so env vars alone don't stick — force CPU the
    # same way.
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated test runs skip recompiles.
# jax is already imported (sitecustomize), so set the config directly
# — env vars at this point are not guaranteed to be read.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_cuburn_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
import jax as _jax
_jax.config.update("jax_compilation_cache_dir",
                   os.environ["JAX_COMPILATION_CACHE_DIR"])
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
