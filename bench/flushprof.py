#!/usr/bin/env python
"""Attribution of the windowed flush (round-5 verdict item 2).

The flush eats ~39% of the 512² render loop (BENCH_r04.json
flush_frac).  This probe splits ONE flush at the tuned geometry into
its stages on REAL records from an actual full_feature iterate run
(the sort cost depends on the key distribution, so synthetic uniform
records would lie):

  sort       — ops.sort.sort_records at the tuned segment count
  sort+prep  — _prep_windows (sort + quantize/reshape/window ids +
               straddle diversion + palette factoring)
  full flush — accumulate_windowed_pallas (prep + Pallas kernel +
               straddle scatter)

Every stage runs IN-LOOP (L chained evaluations inside one device
program, the next input data-derived from the previous output) —
standalone dispatches carry ~30-40 ms tunnel overhead that would
swamp the per-stage deltas (CLAUDE.md).  kernel = full - (sort+prep);
prep = (sort+prep) - sort.  Numbers land in BASELINE.md.

Usage: python bench/flushprof.py [dim=512] [ss=1] [K=128] [S=4] [L=8]
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


def make_records(dim, ss, B, K):
    """Real packed records: one K-step iterate scan of full_feature at
    the probe geometry (the headline bench's own record stream)."""
    from cuburn_tpu.models import full_feature
    from cuburn_tpu.ops.camera import CameraSpec
    from cuburn_tpu.ops.iterate import (color_bits_for, init_state,
                                        iterate_step, pack_records,
                                        xform_cdf_rows)
    g = full_feature()
    key = g.structure_key()
    params = jax.tree_util.tree_map(jnp.asarray, g.eval_at(0.0))
    cam = CameraSpec(dim, dim, ss)
    cdf = xform_cdf_rows(params)
    ppu = params.ppu * jnp.float32(dim / g.size[0])
    cbits = min(color_bits_for(cam.layout_bins), 8)

    @jax.jit
    def gen(state):
        def body(state, __):
            state, addr, pcolor, opacity = iterate_step(
                key, cam, 32, params, cdf, ppu, state)
            return state, pack_records(cbits, addr, pcolor)
        state, recs = jax.lax.scan(body, state, None, length=K)
        return state, recs

    state = init_state(jax.random.PRNGKey(0), B)
    state, _ = gen(state)          # fuse warm-up chunk
    _, recs = gen(state)
    return g, cam, params, cbits, recs


def in_loop(stage_fn, flip, L):
    """L chained stage evaluations in ONE device program: iteration
    i+1's records are xored with a bit derived from iteration i's
    output, so XLA can't hoist the stage out of the loop and every
    evaluation is a real, serialized execution."""

    @jax.jit
    def run(recs):
        def body(i, carry):
            recs, acc = carry
            s = stage_fn(recs)                      # (scalar u32-ish)
            # flip addr bit 0 on half the records, parity from the
            # stage output — data dependence without changing the
            # distribution (adjacent-pixel move)
            recs = recs ^ (flip * (jnp.uint32(1) + (s & jnp.uint32(1))))
            return recs, acc + s
        return jax.lax.fori_loop(
            0, L, body, (recs, jnp.uint32(0)))

    return run


def timed(label, run, recs, total, L):
    from cuburn_tpu.utils.timing import hard_sync
    out = run(recs)
    hard_sync(out)
    t0 = time.perf_counter()
    out2 = run(out[0])
    hard_sync(out2)
    dt = (time.perf_counter() - t0) / L
    print(json.dumps({"stage": label, "ms": round(dt * 1e3, 2),
                      "M_rec_per_s": round(total / dt / 1e6, 1)}))
    return dt


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ss = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    S = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    L = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    B = 1 << 15
    total = B * K

    from cuburn_tpu.ops import pallas_hist as ph
    from cuburn_tpu.ops.iterate import expand_palette, hist_alloc_for
    from cuburn_tpu.ops.sort import sort_records

    g, cam, params, cbits, recs = make_records(dim, ss, B, K)
    pal = expand_palette(params.palette, cbits)
    hist = hist_alloc_for("pallas_win", cam.n_bins)
    rows = hist.shape[1]
    br = rows if rows <= ph.BLOCK_ROWS else ph.TILED_BLOCK_ROWS
    n_blocks = rows // br
    print(f"# flushprof backend={jax.default_backend()} dim={dim} "
          f"ss={ss} bins={cam.n_bins} records={total} S={S} L={L} "
          f"cbits={cbits} rows={rows} n_blocks={n_blocks}")
    flip = jnp.uint32(1 << cbits)   # addr bit 0 (adjacent pixel)
    interp = jax.default_backend() != "tpu"

    # 1. sort only
    def s_sort(r):
        return sort_records(r, segments=S).ravel()[0]

    t_sort = timed("sort", in_loop(s_sort, flip, L), recs, total, L)

    # 2. sort + prep: one element of every prep output a flush
    # consumes (each slice data-depends on its whole producing op)
    def s_prep(r):
        p = ph._prep_windows(r, pal, cam.n_bins, cbits, False, S,
                             br, n_blocks)
        outs = [p["perm"], p["rbg"], p["addr_w"], p["q_f"]]
        acc = jnp.uint32(0)
        for o in outs:
            acc = acc + o.ravel()[0].astype(jnp.uint32)
        # i32 hop: no direct f32->u32 cast on this backend
        acc = acc + p["cnt_f"].ravel()[0].astype(jnp.int32)\
            .astype(jnp.uint32)
        if p["s_addr"] is not None:
            acc = acc + p["s_addr"].ravel()[0].astype(jnp.uint32)
        return acc

    t_prep = timed("sort+prep", in_loop(s_prep, flip, L), recs,
                   total, L)

    # 3. full flush (fresh hist each iteration — matches the render
    # loop, where the flush adds into the carried histogram)
    def s_flush(r):
        h = ph.accumulate_windowed_pallas(
            hist, r, pal, cam.n_bins, cbits, interpret=interp,
            sort_segments=S)
        return h.ravel()[0].astype(jnp.int32).astype(jnp.uint32)

    t_full = timed("flush_full", in_loop(s_flush, flip, L), recs,
                   total, L)

    print(json.dumps({
        "attribution_ms": {
            "sort": round(t_sort * 1e3, 2),
            "prep": round((t_prep - t_sort) * 1e3, 2),
            "kernel+scatter": round((t_full - t_prep) * 1e3, 2),
            "full": round(t_full * 1e3, 2),
        },
        "records": total, "bins": cam.n_bins, "S": S}))


if __name__ == "__main__":
    main()
