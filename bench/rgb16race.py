#!/usr/bin/env python
"""Race the bf16-rgb split-plane flush against the f32 in-place flush
at HBM-TILED density (VERDICT round-4 item 5: tiled-histogram traffic
compression).

At tiled densities the windowed flush is row-block-reload-bound
(~the histogram's own size per flush — the measured 2^20..2^24
ladder).  pallas_rgb16 stores the three rgb planes bf16 in HBM,
halving their reload+writeback bytes (3/8 of total flush traffic
saved) while density stays f32 and accumulation stays f32 in VMEM.
This script measures whether that translates end-to-end, and checks
the rgb error envelope per-bin against the f32 path ON DEVICE.

Timings are CHAINED (each timed call consumes the previous call's
state+hist — see CLAUDE.md: the tunnel caches identical executions)
and in-loop (n_chunks traced fori_loop; standalone dispatches carry
~30-40 ms overhead).

Usage: python -u bench/rgb16race.py [--width 1920] [--height 1080]
           [--ss 2] [--chunks 4] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
if "--cpu" in sys.argv:
    # the axon plugin force-registers itself as default (CLAUDE.md);
    # config update before any device query is the only opt-out
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--ss", type=int, default=2)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ipc", type=int, default=0,
                    help="iters/chunk; 0 = tuned tiled_flush_records/B")
    ap.add_argument("--segs", type=int, default=0,
                    help="sort_segments override (0 = tuned; the "
                         "straddle slot count — and the rgb16 fix's "
                         "per-address combine cost — scales with it)")
    args = ap.parse_args()

    from cuburn_tpu.models import full_feature
    from cuburn_tpu.ops.camera import CameraSpec
    from cuburn_tpu.ops.iterate import (hist_alloc_for, hist_to_logical,
                                        init_state, iterate_accumulate,
                                        xform_cdf_rows)
    from cuburn_tpu.ops.pallas_hist import BLOCK_ROWS, planes_rows
    from cuburn_tpu.render import _load_tune
    from cuburn_tpu.utils.timing import hard_sync

    on_tpu = jax.default_backend() == "tpu"
    tune = _load_tune() if on_tpu else {}
    g = full_feature()
    key = g.structure_key()
    params = jax.tree_util.tree_map(jnp.asarray, g.eval_at(0.0))
    cdf = xform_cdf_rows(params)
    B = 1 << 15 if on_tpu else 1 << 11
    cam = CameraSpec(args.width, args.height, args.ss)
    ppu = params.ppu * jnp.float32(args.width / g.size[0])
    rows = planes_rows(cam.n_bins)
    ipc = args.ipc or max(
        32, int(tune.get("tiled_flush_records", 1 << 23)) // B)
    ss_seg = args.segs or (int(tune.get("sort_segments", 1))
                           if on_tpu else 1)
    print(json.dumps({"probe": "rgb16-race", "n_bins": cam.n_bins,
                      "rows": rows, "tiled": rows > BLOCK_ROWS,
                      "B": B, "ipc": ipc, "chunks": args.chunks,
                      "sort_segments": ss_seg,
                      "hist_mb": round(rows * 128 * 4 * 4 / 2**20, 1)}))

    results, logical = {}, {}
    for backend in ("pallas_win", "pallas_rgb16"):
        state = init_state(jax.random.PRNGKey(0), B)
        hist = hist_alloc_for(backend, cam.n_bins)
        # warm compile (1 chunk — same program, traced n_chunks)
        state, hist, n = iterate_accumulate(
            key, cam, backend, params, cdf, state, hist, ppu,
            jnp.int32(1), ipc, 32, sort_segments=ss_seg)
        hard_sync(hist)
        t0 = time.perf_counter()
        tot = 0
        for _ in range(args.reps):
            state, hist, dn = iterate_accumulate(
                key, cam, backend, params, cdf, state, hist, ppu,
                jnp.int32(args.chunks), ipc, 32, sort_segments=ss_seg)
            tot += int(B) * ipc * args.chunks
        hard_sync(hist)
        dt = time.perf_counter() - t0
        results[backend] = tot / dt
        logical[backend] = hist_to_logical(backend, hist, cam.n_bins)
        print(json.dumps({"backend": backend,
                          "samples_per_sec_M": round(tot / dt / 1e6, 1),
                          "sec": round(dt, 2)}))

    # per-bin differential on device (identical seeds + chunk counts:
    # same trajectory stream, so density must be bit-exact and rgb
    # inside the bf16 storage envelope)
    w = np.asarray(logical["pallas_win"][:-1])
    r = np.asarray(logical["pallas_rgb16"][:-1])
    dens_err = float(np.max(np.abs(w[:, 3] - r[:, 3])))
    flushes = (args.reps * args.chunks + 1)
    rel = np.abs(w[:, :3] - r[:, :3]) / np.maximum(w[:, 3:4], 1.0)
    rgb_rel = float(rel.max())
    env = flushes * 2.0 ** -8
    worst = int(np.unravel_index(rel.argmax(), rel.shape)[0])
    speedup = results["pallas_rgb16"] / results["pallas_win"]
    out = {"speedup_rgb16": round(speedup, 3),
           "max_bin_err_density": dens_err,
           "max_bin_err_rgb_rel": round(rgb_rel, 6),
           "rgb_envelope": round(env, 6),
           "bins_over_envelope": int((rel.max(axis=1) > env).sum()),
           "worst_bin": worst,
           "worst_f32_rgba": [round(float(v), 3) for v in w[worst]],
           "worst_rgb16_rgb": [round(float(v), 3) for v in r[worst, :3]],
           "ok": dens_err == 0.0 and rgb_rel <= env}
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
