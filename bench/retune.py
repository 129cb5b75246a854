#!/usr/bin/env python
"""Repo-checkout wrapper for the packaged tuner: cuburn_tpu/retune.py
(installed as the `cuburn-tpu-retune` console script).  See that
module's docstring for what it measures and writes."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

from cuburn_tpu.retune import main

if __name__ == "__main__":
    main()
