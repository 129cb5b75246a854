#!/usr/bin/env python
"""Per-stage breakdown of the render loop on the current chip.

Separates the headline samples/s into its parts so optimization effort
goes where the time is (BASELINE.md measurement protocol; all timings
chained + hard-synced):

  iterate       — chaos game only, records discarded (jnp.sum sink)
  iterate+pack  — plus packed-record formation
  + scatter     — full loop with the scatter backend
  + pallas_win  — full loop with the windowed sorted-matmul backend

Usage: python bench/breakdown.py [batch_log2=15] [iters_per_chunk=64]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import jax as _jax
_jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    b_log = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from functools import partial

    from cuburn_tpu.models import full_feature
    from cuburn_tpu.ops.camera import CameraSpec
    from cuburn_tpu.ops.iterate import (hist_alloc_for, init_state,
                                        iterate_accumulate,
                                        iterate_step, pack_records,
                                        xform_cdf_rows)
    from cuburn_tpu.utils.timing import hard_sync

    g = full_feature()
    key = g.structure_key()
    params = jax.tree_util.tree_map(jnp.asarray, g.eval_at(0.0))
    cam = CameraSpec(512, 512, 1)
    cdf = xform_cdf_rows(params)
    ppu = params.ppu * jnp.float32(512 / g.size[0])
    B = 1 << b_log
    n_chunks = max(1, (1 << 25) // (B * K))
    total = n_chunks * B * K
    print(f"backend={jax.default_backend()} B={B} K={K} "
          f"chunks={n_chunks} total={total / 1e6:.1f}M iters")

    @partial(jax.jit, static_argnames=("mode",))
    def iterate_only(state, n, mode="discard"):
        def chunk(_, carry):
            state, acc = carry

            def body(state, __):
                state, addr, pcolor, opacity = iterate_step(
                    key, cam, 32, params, cdf, ppu, state)
                if mode == "pack":
                    rec = pack_records(10, addr, pcolor)
                    return state, jnp.sum(rec.astype(jnp.uint32)
                                          >> jnp.uint32(16))
                return state, jnp.sum(addr)

            state, sums = jax.lax.scan(body, state, None, length=K)
            return state, acc + jnp.sum(sums)

        return jax.lax.fori_loop(0, n, chunk,
                                 (state, jnp.uint32(0) if mode == "pack"
                                  else jnp.int32(0)))

    def timed(label, fn, *args):
        out = fn(*args)
        hard_sync(out)
        # chain: reuse the advanced state so the timed call differs
        t0 = time.perf_counter()
        out2 = fn(out[0] if isinstance(out, tuple) else out,
                  *args[1:])
        hard_sync(out2)
        dt = time.perf_counter() - t0
        print(f"{label:<22} {dt * 1e3:9.1f} ms   "
              f"{total / dt / 1e6:8.1f} M iters/s")
        return dt

    state = init_state(jax.random.PRNGKey(0), B)
    timed("iterate (discard)", lambda s: iterate_only(
        s, jnp.int32(n_chunks), mode="discard"), state)
    timed("iterate + pack", lambda s: iterate_only(
        s, jnp.int32(n_chunks), mode="pack"), state)

    for backend in ("scatter", "pallas_win"):
        hist = hist_alloc_for(backend, cam.n_bins)

        def full(s, hist=hist, backend=backend):
            s, h, n = iterate_accumulate(
                key, cam, backend, params, cdf, s, hist, ppu,
                jnp.int32(n_chunks), K, 32)
            return s, h, n

        timed(f"full ({backend})", full, state)


if __name__ == "__main__":
    main()
