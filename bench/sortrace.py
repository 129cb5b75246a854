#!/usr/bin/env python
"""Race sort implementations for the flush's key-sort stage.

Round-2 measured lax.sort at ~25-30 M rec/s vs the roll-based bitonic's
~35-58 M on the then-current chip; round-5's chip runs integer/select
vector ops ~2x faster, so the choice needs re-racing (CLAUDE.md: chip
economics drift between rounds — re-measure, don't trust either
result).  All candidates run IN-LOOP (L chained evals in one program)
on REAL full_feature records at the tuned flush size.

Candidates:
  bitonic-S1/-S4/-S16 — ops.sort.sort_records at those segment counts
  lax_sort            — jax.lax.sort (XLA's sort) on the flat u32 keys

Usage: python bench/sortrace.py [dim=512] [K=128] [L=8]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import jax as _jax
_jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    B = 1 << 15
    total = B * K

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from flushprof import in_loop, make_records, timed
    from cuburn_tpu.ops.sort import sort_records

    g, cam, params, cbits, recs = make_records(dim, 1, B, K)
    print(f"# sortrace backend={jax.default_backend()} dim={dim} "
          f"records={total} L={L}")
    flip = jnp.uint32(1 << cbits)

    for s in (1, 4, 16):
        def stage(r, s=s):
            return sort_records(r, segments=s).ravel()[0]
        timed(f"bitonic-S{s}", in_loop(stage, flip, L), recs, total, L)

    def stage_lax(r):
        return jax.lax.sort(r.reshape(-1)).ravel()[0]
    timed("lax_sort", in_loop(stage_lax, flip, L), recs, total, L)

    # VMEM-fused tiled bitonic (ops/pallas_sort.py — a round-3
    # measured negative; chip economics flip between rounds, re-race)
    from cuburn_tpu.ops.pallas_sort import bitonic_sort_u32_tiled
    interp = jax.default_backend() != "tpu"

    def stage_tiled(r):
        return bitonic_sort_u32_tiled(
            r.reshape(-1), interpret=interp).ravel()[0]
    timed("bitonic_tiled", in_loop(stage_tiled, flip, L), recs,
          total, L)


if __name__ == "__main__":
    main()
