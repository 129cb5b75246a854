#!/usr/bin/env python
"""n_bands x skip_empty sweep of finalize_frame_banded at binding size.

VERDICT round-3 weak #7 / next-round #6: the banded filter's band
count was caller-chosen (default 4, benches used 6) with no measured
sweep at 8.6 M bins, and skip_empty shipped untimed.  This races the
REAL config-4 flow — device-resident histogram, one
_filter_banded_device dispatch, u8 rgb readback — across n_bands and
skip_empty on the current chip, plus the whole-frame
finalize_frame_device path as the n_bands=1 contender (banding exists
for program-size safety, not speed; if the whole-frame program
survives on this chip it skips all margin-overlap recompute).

Each n_bands is a new program shape (band_rows changes): expect one
cold compile per row the first time, cached afterwards
(JAX_COMPILATION_CACHE_DIR).

Usage: python -u bench/bandsweep.py [--bands 2,3,4,6,8] [--skip-best]
           [--no-whole] [--iters 3] [--dims WxH] [--ss N] [--cpu]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import jax as _jax
_jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    _jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    argv = sys.argv[1:]
    bands = [int(b) for b in (
        argv[argv.index("--bands") + 1] if "--bands" in argv
        else "2,3,4,6,8").split(",")]
    iters = int(argv[argv.index("--iters") + 1]) \
        if "--iters" in argv else 3
    whole = "--no-whole" not in argv
    skip_best = "--skip-best" in argv
    W, H = (tuple(int(v) for v in
                  argv[argv.index("--dims") + 1].split("x"))
            if "--dims" in argv else (1920, 1080))
    ss = int(argv[argv.index("--ss") + 1]) if "--ss" in argv else 2

    from cuburn_tpu.models import full_feature
    from cuburn_tpu.profile import RenderProfile
    from cuburn_tpu.render import Renderer
    from cuburn_tpu.utils.timing import hard_sync

    g = full_feature()
    prof = RenderProfile(width=W, height=H, ss=ss, quality=2000)
    r = Renderer(g, prof)
    n_bins = r.cam.n_bins
    print(json.dumps({"probe": "bandsweep", "n_bins": n_bins,
                      "acc": [r.cam.acc_height, r.cam.acc_width],
                      "bands": bands, "whole": whole}))

    # synthetic histogram with realistic sparsity (filterprof's recipe)
    rng = np.random.default_rng(0)
    dens = np.exp(rng.normal(3.0, 2.0, (n_bins,))).astype(np.float32)
    dens *= rng.random(n_bins) < 0.7
    hist_np = np.zeros((n_bins + 1, 4), np.float32)
    hist_np[:n_bins] = dens[:, None] * \
        rng.random((n_bins, 4)).astype(np.float32)
    hist_np[:n_bins, 3] = dens
    hist_dev = jnp.asarray(hist_np)
    hard_sync(hist_dev)

    results = {}

    def race(label, fn):
        # warm compile
        t0 = time.perf_counter()
        out = fn(hist_dev)
        compile_s = time.perf_counter() - t0
        times = []
        for it in range(iters):
            # chain + pre-sync: the tunnel caches identical executions
            hd = hist_dev + np.float32(
                (it + 1) * 1e-30 + out.ravel()[0] * 1e-38)
            hard_sync(hd)
            t0 = time.perf_counter()
            out = fn(hd)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        results[label] = dt
        print(json.dumps({"variant": label, "s": round(dt, 3),
                          "compile_s": round(compile_s, 1),
                          "all_s": [round(t, 3) for t in times]}))
        return dt

    for nb in bands:
        race(f"banded_{nb}", lambda h, nb=nb:
             r.finalize_frame_banded(h, 0.0, n_bands=nb))
    if whole:
        try:
            race("whole_frame", lambda h:
                 np.asarray(r.finalize_frame_device(h, 0.0)))
        except Exception as e:
            print(json.dumps({"variant": "whole_frame",
                              "error": f"{type(e).__name__}: {e}"[:200]}))

    banded = {k: v for k, v in results.items()
              if k.startswith("banded_")}
    best = min(banded, key=banded.get)
    best_nb = int(best.split("_")[1])
    if not skip_best:
        for se in (True,):
            race(f"banded_{best_nb}_skip_empty", lambda h:
                 r.finalize_frame_banded(h, 0.0, n_bands=best_nb,
                                         skip_empty=True))
    print(json.dumps({
        "best_banded": best, "s": round(results[best], 3),
        "whole_frame_s": round(results["whole_frame"], 3)
        if "whole_frame" in results else None,
        "skip_empty_s": round(
            results.get(f"banded_{best_nb}_skip_empty", -1), 3),
    }))


if __name__ == "__main__":
    main()
