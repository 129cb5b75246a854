"""Test configuration: run everything on CPU with 8 virtual devices.

SURVEY.md §4: jax runs the same code on CPU — this is the "fake backend"
the reference never had.  Multi-chip sharding logic is tested on a
virtual 8-device CPU mesh via --xla_force_host_platform_device_count.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
