#!/usr/bin/env python
"""Benchmark suite: the five binding configurations of BASELINE.md.

Runs each config end-to-end (accumulate + filters) with hard-sync
timing and prints one JSON record per config plus a summary line.
Sizes scale down automatically off-TPU (CI smoke).

  1. sierpinski 512^2, 1M samples, log tonemap (affine-only)
  2. classic variations + palette + gamma/vibrancy, 720p
  3. full variation set + parametric + final xform + xaos, 1080p
  4. adaptive DE + 2x supersampling at quality 2000
  5. animated spline sequence with temporal-sample motion blur

Usage: python bench/configs.py [--quick] [--config N]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import jax as _jax
_jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")


def run_config(idx, quick):
    import jax
    from cuburn_tpu.models import (animated_spark, classic_swirl,
                                   full_feature, sierpinski)
    from cuburn_tpu.profile import RenderProfile
    from cuburn_tpu.render import Renderer
    from cuburn_tpu.utils.timing import hard_sync

    on_tpu = jax.default_backend() == "tpu"
    scale = 1.0 if (on_tpu and not quick) else 0.1
    # the dev-environment TPU worker crashes on 1080p-class programs
    # (see CLAUDE.md); cap accumulator dims there.  Real-silicon runs
    # can raise this via the env var, or by a retune --probe-dims tune
    # record (cuburn_tpu.retune writes dim_cap; consumed here)
    dim_cap_env = os.environ.get("CUBURN_BENCH_DIM_CAP")
    if dim_cap_env:
        dim_cap = int(dim_cap_env)
    else:
        from cuburn_tpu.render import _load_tune
        dim_cap = int(_load_tune().get("dim_cap") or 1280)

    def sz(x, lo=64):
        return max(lo, min(int(x * (scale ** 0.5)), dim_cap) // 16 * 16)

    B = 1 << 15 if on_tpu else 1 << 12
    # dispatch cap: the dev worker kills single executions much past
    # ~2 min; ~1.2G iters ≈ 40-60 s per call at measured rates
    # iters_per_chunk=0: auto — the Renderer scales the flush size
    # with histogram HBM tiling (render._resolve_iters_per_chunk);
    # measured 2.4x at config-4 density (bench/fullframe4.py K sweep)
    common = dict(batch=B, iters_per_chunk=0, fuse=32,
                  hist_backend="auto",
                  dispatch_iter_cap=(1_200_000_000 if on_tpu
                                     else None))

    if idx == 1:
        g = sierpinski()
        prof = RenderProfile(width=sz(512), height=sz(512),
                             quality=max(4, int(1_000_000 * scale)
                                         // (sz(512) ** 2) + 1),
                             de_enabled=False, **common)
    elif idx == 2:
        g = classic_swirl()
        prof = RenderProfile(width=sz(1280), height=sz(720),
                             quality=max(8, int(500 * scale)),
                             de_enabled=False, **common)
    elif idx == 3:
        g = full_feature()
        prof = RenderProfile(width=sz(1920), height=sz(1080),
                             quality=max(8, int(1000 * scale)),
                             de_enabled=False, **common)
    elif idx == 4:
        g = classic_swirl()
        prof = RenderProfile(width=sz(1920), height=sz(1080), ss=2,
                             quality=max(8, int(2000 * scale)),
                             de_enabled=True, **common)
    elif idx == 5:
        g = animated_spark()
        prof = RenderProfile(width=sz(1280), height=sz(720),
                             quality=max(8, int(200 * scale)),
                             temporal_samples=4, de_enabled=False,
                             **common)
    else:
        raise ValueError(idx)

    # Binding configs 3/4 demand TRUE 1080p.  Round-3 follow-up
    # (bench/fullframe*.py): whole-frame accumulation at 2.1M and
    # 8.6M bins SURVIVES the dev worker when split into short
    # dispatches (dispatch_iter_cap) — the round-2 crash was long
    # single executions, not bin count — and is 2.5x faster than the
    # striped path (which replays iterate per stripe).  Render whole
    # frame by default; CUBURN_BENCH_STRIPED=1 restores the striped
    # comparison path (and remains the fallback if a chip's worker
    # dies on large-histogram programs).
    stripes = 0
    if idx in (3, 4) and on_tpu and not quick:
        import dataclasses
        prof = dataclasses.replace(prof, width=1920, height=1080)
        r = Renderer(g, prof)
        striped = os.environ.get("CUBURN_BENCH_STRIPED", "0") == "1"
        if striped:
            stripes = max(2, -(-r.cam.n_bins // 1_500_000))
        warm = dataclasses.replace(prof, quality=1)
        rw = Renderer(g, warm)
        if striped:
            hw, sw = rw.accumulate_striped(0.2, 1, n_stripes=stripes)
        else:
            hw, sw = rw.accumulate(0.2, 1)
        # warm the filter program too — its first-call compile costs
        # minutes over the tunnel and is not what this suite measures.
        # Round-4 bandsweep (bench/bandsweep.py, 8.6 M bins): the
        # WHOLE-frame filter program survives this chip and beats the
        # best banded split (0.53 s vs 0.563 s at n_bands=4, vs
        # round-3's 0.80 s at 6) — banding stays the fallback for
        # workers that die on full-frame filter programs
        # (CUBURN_BENCH_BANDS=1, or any explicit band count).
        nb_warm = (max(2, -(-r.cam.n_bins // 1_500_000))
                   if os.environ.get("CUBURN_BENCH_BANDS") == "1"
                   else 1)
        try:
            if nb_warm > 1:
                rw.finalize_frame_banded(hw, 0.2, sw, n_bands=nb_warm)
            else:
                rw.finalize_frame(hw, 0.2, sw)
        except Exception:
            pass
        del hw
        # Multiple timed shots, report the LAST: the tunnel worker's
        # state swings single shots up to 4x (bench.py measured 47.6
        # then 195.6 M samples/s back-to-back on the SAME q1000 1080p
        # program — worker warm-up, not startup amortization).  The
        # first shot absorbs worker slowness; all shots are recorded.
        shots = int(os.environ.get("CUBURN_BENCH_SHOTS", "2"))
        shot_rates = []
        for shot in range(shots):
            t0 = time.perf_counter()
            if striped:
                hist, stats = r.accumulate_striped(0.2, seed=2 + shot,
                                                   n_stripes=stripes)
            else:
                hist, stats = r.accumulate(0.2, seed=2 + shot)
            try:
                n_bands = nb_warm
                if n_bands > 1:
                    img = r.finalize_frame_banded(hist, 0.2, stats,
                                                  n_bands=n_bands)
                else:
                    img = r.finalize_frame(hist, 0.2, stats)
            except Exception as e:
                print(json.dumps({"config": idx, "finalize_error":
                                  f"{type(e).__name__}: {e}"[:160]}))
            wall = time.perf_counter() - t0
            shot_rates.append(round(stats.samples_per_sec, 1))
    else:
        r = Renderer(g, prof)
        # warm compile
        img, _ = r.render_frame(0.2, seed=1)
        shots = int(os.environ.get("CUBURN_BENCH_SHOTS", "2"))
        shot_rates = []
        for shot in range(shots):
            t0 = time.perf_counter()
            img, stats = r.render_frame(0.2, seed=2 + shot)
            wall = time.perf_counter() - t0
            shot_rates.append(round(stats.samples_per_sec, 1))
    rec = {
        "config": idx, "genome": g.name,
        "size": f"{prof.width}x{prof.height}", "ss": prof.ss,
        "quality": prof.quality,
        "temporal_samples": prof.temporal_samples,
        "plotted_samples": stats.plotted_samples,
        "samples_per_sec": round(stats.samples_per_sec, 1),
        "retention": round(stats.retention, 3),
        "iterate_ms": round(stats.iterate_s * 1e3, 1),
        "filter_ms": round(stats.filter_s * 1e3, 1),
        "frame_wall_s": round(wall, 2),
        "backend": r.backend,
        "stripes": stripes,
    }
    if len(shot_rates) > 1:
        rec["samples_per_sec_shots"] = shot_rates
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small sizes even on TPU")
    ap.add_argument("--config", type=int,
                    help="run only config N (1-5)")
    args = ap.parse_args()
    if args.config:
        try:
            run_config(args.config, args.quick)
        except Exception as e:
            print(json.dumps({"config": args.config, "error":
                              f"{type(e).__name__}: {e}"[:200]}))
            sys.exit(1)
        return

    # Each config runs in its own subprocess: a TPU-worker crash (the
    # dev environment dies on large programs, see CLAUDE.md) poisons
    # the whole JAX backend in-process, but the next config gets a
    # fresh one.
    import subprocess
    recs = []
    for i in (1, 2, 3, 4, 5):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--config", str(i)]
        if args.quick:
            cmd.append("--quick")
        # Per-config wall cap: a hung tunnel (dead worker + no RPC
        # timeout) must not eat the rest of the suite.  The slowest
        # legitimate config (4: q2000 ss2 1080p, two shots + compile)
        # finishes well inside 20 min warm-cache.
        cap = int(os.environ.get("CUBURN_BENCH_CONFIG_TIMEOUT", "1500"))
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=cap)
        except subprocess.TimeoutExpired:
            print(json.dumps({"config": i,
                              "error": f"timeout after {cap}s "
                                       "(hung tunnel/worker?)"}))
            time.sleep(120)  # let the TPU worker come back
            continue
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                rec = json.loads(line)
                if "samples_per_sec" in rec:
                    recs.append(rec)
        if out.returncode:
            time.sleep(60)   # let the TPU worker come back
    best = max((r["samples_per_sec"] for r in recs), default=0)
    print(json.dumps({"summary": "best_samples_per_sec", "value": best,
                      "completed": [r["config"] for r in recs]}))


if __name__ == "__main__":
    main()
