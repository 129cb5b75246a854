#!/usr/bin/env python
"""Config-4-size whole-frame accumulation probe (8.6 M bins).

Escalation of bench/fullframe.py to the binding config-4 geometry
(1920x1080, ss=2, DE gutter): probe survival at tiny quality, then
measure a q-sized run and the 6-stripe comparison at matched quality.

Usage: python -u bench/fullframe4.py [--quality Q] [--cap ITERS]
       [--skip-striped] [--probe-only]
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality", type=int, default=150)
    ap.add_argument("--cap", type=int, default=600_000_000)
    ap.add_argument("--skip-striped", action="store_true")
    ap.add_argument("--probe-only", action="store_true")
    ap.add_argument("--probe-quality", type=int, default=8)
    ap.add_argument("--ipc", type=int, default=32,
                    help="iters_per_chunk: records per flush = "
                         "batch * ipc; at 8.6M bins every flush "
                         "touches ~all HBM row blocks, so bigger "
                         "flushes amortize row traffic")
    args = ap.parse_args()

    from cuburn_tpu.models import classic_swirl
    from cuburn_tpu.profile import RenderProfile
    from cuburn_tpu.render import Renderer

    on_tpu = jax.default_backend() == "tpu"
    g = classic_swirl()
    B = 1 << 15 if on_tpu else 1 << 12

    def prof(quality):
        return RenderProfile(width=1920, height=1080, ss=2,
                             quality=quality, de_enabled=True,
                             batch=B, iters_per_chunk=args.ipc, fuse=32,
                             hist_backend="auto",
                             dispatch_iter_cap=args.cap)

    r0 = Renderer(g, prof(args.probe_quality))
    print(json.dumps({"probe": "whole-frame-c4",
                      "n_bins": r0.cam.n_bins, "ipc": args.ipc,
                      "backend": r0.backend, "cap": args.cap}),
          flush=True)
    t0 = time.perf_counter()
    hist, stats = r0.accumulate(0.2, seed=1)
    print(json.dumps({"probe_wall_s":
                      round(time.perf_counter() - t0, 1),
                      "probe_mass": float(np.asarray(
                          hist[:-1, 3]).sum()),
                      "probe_plotted": stats.plotted_samples}),
          flush=True)
    del hist
    if args.probe_only:
        return

    r = Renderer(g, prof(args.quality))
    t0 = time.perf_counter()
    hist, stats = r.accumulate(0.2, seed=2)
    full_wall = time.perf_counter() - t0
    full_mass = float(np.asarray(hist[:-1, 3]).sum())
    print(json.dumps({"mode": "whole-frame", "quality": args.quality,
                      "wall_s": round(full_wall, 1),
                      "samples_per_sec":
                          round(stats.samples_per_sec / 1e6, 1),
                      "plotted": stats.plotted_samples,
                      "mass": full_mass}), flush=True)
    del hist

    if not args.skip_striped:
        n_stripes = max(2, -(-r.cam.n_bins // 1_500_000))
        t0 = time.perf_counter()
        hist_s, stats_s = r.accumulate_striped(0.2, seed=2,
                                               n_stripes=n_stripes)
        striped_wall = time.perf_counter() - t0
        mass_s = float(np.asarray(hist_s[:-1, 3]).sum())
        print(json.dumps({"mode": "striped", "n_stripes": n_stripes,
                          "quality": args.quality,
                          "wall_s": round(striped_wall, 1),
                          "samples_per_sec":
                              round(stats_s.samples_per_sec / 1e6, 1),
                          "mass": mass_s}), flush=True)
        print(json.dumps({"speedup_whole_vs_striped":
                          round(striped_wall / full_wall, 2),
                          "mass_ratio":
                          round(full_mass / max(mass_s, 1e-9), 6)}),
              flush=True)


if __name__ == "__main__":
    main()
