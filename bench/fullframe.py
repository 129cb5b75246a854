#!/usr/bin/env python
"""Whole-frame vs striped accumulation at >1.5M bins (round-3 probe).

Striping exists because the dev worker died on "1080p-class programs"
(round 2, blamed on ~2M-bin histograms).  Round 3 established the true
killer is LONG SINGLE EXECUTIONS, not bin count (CLAUDE.md) — which
predicts whole-frame accumulation at 1080p+ works fine when split into
short dispatches via dispatch_iter_cap, removing striping's n_stripes x
iterate replay (config 3 pays 2x, config 4 pays 6x).

This probe renders the config-3 genome at TRUE 1920x1080 both ways at
matched quality and compares wall clock and histogram mass.  Escalates
quality only after the small run survives, so a worker crash costs one
short program, not the suite.

Usage: python -u bench/fullframe.py [--quality Q] [--cap ITERS]
       [--skip-striped]
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
    ap.add_argument("--quality", type=int, default=300)
    ap.add_argument("--cap", type=int, default=600_000_000,
                    help="dispatch_iter_cap (iters per device call)")
    ap.add_argument("--skip-striped", action="store_true")
    ap.add_argument("--probe-quality", type=int, default=20,
                    help="tiny survival probe before the real run")
    ap.add_argument("--ipc", type=int, default=32,
                    help="iters_per_chunk: records per flush = "
                         "batch * ipc; HBM-tiled histograms amortize "
                         "row-block traffic with bigger flushes")
    args = ap.parse_args()

    from cuburn_tpu.models import full_feature
    from cuburn_tpu.profile import RenderProfile
    from cuburn_tpu.render import Renderer
    from cuburn_tpu.utils.timing import hard_sync

    on_tpu = jax.default_backend() == "tpu"
    g = full_feature()
    B = 1 << 15 if on_tpu else 1 << 12

    def prof(quality):
        return RenderProfile(width=1920, height=1080, quality=quality,
                             de_enabled=False, batch=B,
                             iters_per_chunk=args.ipc, fuse=32,
                             hist_backend="auto",
                             dispatch_iter_cap=args.cap)

    # --- survival probe: one short whole-frame program ------------------
    r0 = Renderer(g, prof(args.probe_quality))
    print(json.dumps({"probe": "whole-frame", "n_bins": r0.cam.n_bins,
                      "backend": r0.backend, "cap": args.cap}),
          flush=True)
    t0 = time.perf_counter()
    hist, stats = r0.accumulate(0.2, seed=1)
    probe_mass = float(np.asarray(hist[:-1, 3]).sum())
    print(json.dumps({"probe_wall_s": round(time.perf_counter() - t0, 1),
                      "probe_mass": probe_mass,
                      "probe_plotted": stats.plotted_samples}),
          flush=True)

    # --- full whole-frame run ------------------------------------------
    r = Renderer(g, prof(args.quality))
    t0 = time.perf_counter()
    hist, stats = r.accumulate(0.2, seed=2)
    full_wall = time.perf_counter() - t0
    full_mass = float(np.asarray(hist[:-1, 3]).sum())
    rec = {"mode": "whole-frame", "quality": args.quality,
           "wall_s": round(full_wall, 1),
           "samples_per_sec": round(stats.samples_per_sec / 1e6, 1),
           "plotted": stats.plotted_samples, "mass": full_mass}
    print(json.dumps(rec), flush=True)
    del hist

    # --- striped comparison (current configs.py path) -------------------
    if not args.skip_striped:
        n_stripes = max(2, -(-r.cam.n_bins // 1_500_000))
        t0 = time.perf_counter()
        hist_s, stats_s = r.accumulate_striped(0.2, seed=2,
                                               n_stripes=n_stripes)
        striped_wall = time.perf_counter() - t0
        mass_s = float(np.asarray(hist_s[:-1, 3]).sum())
        rec_s = {"mode": "striped", "n_stripes": n_stripes,
                 "quality": args.quality,
                 "wall_s": round(striped_wall, 1),
                 "samples_per_sec":
                     round(stats_s.samples_per_sec / 1e6, 1),
                 "plotted": stats_s.plotted_samples, "mass": mass_s}
        print(json.dumps(rec_s), flush=True)
        print(json.dumps({
            "speedup_whole_vs_striped":
                round(striped_wall / full_wall, 2),
            "mass_ratio": round(full_mass / max(mass_s, 1e-9), 6)}),
            flush=True)


if __name__ == "__main__":
    main()
