#!/usr/bin/env python
"""Sweep the segmented sub-sort width S for the pallas_win flush.

The flush is sort-bound (~85% of the flush, which is ~80% of the
render loop — BASELINE.md roofline); S independent sub-sorts per
flush cut bitonic substages (2^21: 231 -> 153 at S=16 -> 120 at S=64)
at the cost of ~S x wider windows, which can drop flush tiers
(dense -> mid -> sparse, ops/pallas_hist.py).  Only an end-to-end
measurement can price that trade — this script produces it, plus the
window-tier distribution per S so the result is explainable.

Usage: python bench/segsweep.py [batch_log2=15] [iters_per_chunk=64]
                                [width=512] [height=width] [S,S,...]
Emits one JSON line per S and a summary recommendation.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
import jax as _jax
_jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax
import jax.numpy as jnp
import numpy as np


def tier_distribution(recs, n_bins, cbits, segs):
    """Host-side replica of accumulate_windowed_pallas's window
    classification: fraction of nonempty windows per flush tier."""
    from cuburn_tpu.ops.pallas_hist import GROUP, WIN
    from cuburn_tpu.ops.sort import sort_records
    r = np.asarray(sort_records(jnp.asarray(recs), segments=segs))
    m = r.shape[0]
    n_win = (-(-m // (GROUP * WIN))) * GROUP
    pad = n_win * WIN - m
    if pad:
        r = np.concatenate([r, np.full(pad, n_bins << cbits, np.uint32)])
    addr = (r >> np.uint32(cbits)).astype(np.int64).reshape(n_win, WIN)
    live = addr[:, 0] <= n_bins   # windows that start with real records
    base = addr[:, 0] & ~np.int64(127)
    span = addr[:, -1] - base
    tier = np.where(span < 128, 2, np.where(span < 1024, 1, 0))
    t = tier[live]
    return {k: round(float((t == k).mean()), 3) for k in (0, 1, 2)}


def main():
    b_log = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    H = int(sys.argv[4]) if len(sys.argv) > 4 else W
    s_list = ([int(x) for x in sys.argv[5].split(",")]
              if len(sys.argv) > 5 else [1, 2, 4, 8, 16, 32, 64])

    from cuburn_tpu.models import full_feature
    from cuburn_tpu.ops.camera import CameraSpec
    from cuburn_tpu.ops.iterate import (color_bits_for, hist_alloc_for,
                                        init_state, iterate_accumulate,
                                        iterate_chunk, pack_records,
                                        xform_cdf_rows)
    from cuburn_tpu.utils.timing import hard_sync

    g = full_feature()
    key = g.structure_key()
    params = jax.tree_util.tree_map(jnp.asarray, g.eval_at(0.0))
    cam = CameraSpec(W, H, 1)
    cdf = xform_cdf_rows(params)
    ppu = params.ppu * jnp.float32(W / g.size[0])
    B = 1 << b_log
    n_chunks = max(1, (1 << 25) // (B * K))
    total = n_chunks * B * K
    print(f"backend={jax.default_backend()} B={B} K={K} "
          f"chunks={n_chunks} total={total / 1e6:.1f}M iters "
          f"flush={B * K / 1e6:.2f}M recs n_bins={cam.n_bins}")

    # one real flush's records for the tier histogram
    st = init_state(jax.random.PRNGKey(0), B)
    st, addrs, _ = iterate_chunk(key, cam, params, cdf, st, ppu, K, 32)
    cbits = min(color_bits_for(cam.n_bins), 8)
    recs = np.asarray(
        (np.asarray(addrs).astype(np.uint32).reshape(-1) << cbits))

    def run(segs):
        hist = hist_alloc_for("pallas_win", cam.n_bins)
        state = init_state(jax.random.PRNGKey(0), B)

        def full(s):
            return iterate_accumulate(
                key, cam, "pallas_win", params, cdf, s, hist, ppu,
                jnp.int32(n_chunks), K, 32, sort_segments=segs)

        out = full(state)
        hard_sync(out)
        t0 = time.perf_counter()
        out2 = full(out[0])
        hard_sync(out2)
        dt = time.perf_counter() - t0
        tiers = tier_distribution(recs, cam.n_bins, cbits, segs)
        rec = {"segs": segs, "ms": round(dt * 1e3, 1),
               "M_iters_per_s": round(total / dt / 1e6, 1),
               "tiers": tiers}
        print(json.dumps(rec))
        return rec

    results = [run(s) for s in s_list]
    best = max(results, key=lambda r: r["M_iters_per_s"])
    base = results[0]["M_iters_per_s"]
    print(json.dumps({
        "best_segs": best["segs"],
        "best_M_iters_per_s": best["M_iters_per_s"],
        "speedup_vs_full_sort": round(
            best["M_iters_per_s"] / base, 3)}))


if __name__ == "__main__":
    main()
