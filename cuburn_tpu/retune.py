#!/usr/bin/env python
"""Re-tune the renderer's chip-dependent choices on the CURRENT chip.

The dev environment is an emulator-class tunnel whose op economics do
not extrapolate (CLAUDE.md); this script makes the first hour on real
silicon executable instead of a manual checklist (docs/ROADMAP.md):

  1. races histogram backends (scatter / scatter_sorted / pallas_win)
     in-loop, chained, at two flush densities (512² and 720p-bins)
  2. sweeps the segmented sub-sort width S for the pallas_win flush
  3. sweeps the flush chunk size K (records per sort+flush = B*K)
  4. optionally probes the max safe accumulator dimension
     (--probe-dims; off by default — a failed probe crashes the TPU
     worker for ~2 min on fragile environments)

and writes a JSON tune record that Renderer consumes automatically:
CUBURN_TUNE_FILE env var, or ./cuburn_tune.json in the working
directory.  Delete the file to return to built-in defaults.

Usage: cuburn-tpu-retune [--out cuburn_tune.json] [--quick]
                         [--probe-dims]
(or python bench/retune.py from a repo checkout)
"""

import argparse
import json
import os

import jax as _jax
# persistent compile cache: a retune pass compiles many program shapes
if "JAX_COMPILATION_CACHE_DIR" in os.environ:
    _jax.config.update("jax_compilation_cache_dir",
                       os.environ["JAX_COMPILATION_CACHE_DIR"])
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax
import jax.numpy as jnp
import numpy as np


def race(key, cam, params, cdf, ppu, backend, B, K, n_chunks,
         sort_segments=1, iters=1):
    """Chained in-loop measurement via the shared timing harness
    (utils.timing.time_fn: warmup + state-chained timed calls, one
    hard sync — the protocol that defeats the tunnel's execution
    cache).  `iters` > 1 additionally averages per-dispatch jitter;
    the default stays at one timed call so a full sweep fits the dev
    tunnel's budget (raise it on real silicon).  Returns M iters/s."""
    from cuburn_tpu.ops.iterate import (hist_alloc_for, init_state,
                                        iterate_accumulate)
    from cuburn_tpu.utils.timing import time_fn
    hist = hist_alloc_for(backend, cam.n_bins)
    state = init_state(jax.random.PRNGKey(0), B)
    kw = ({"sort_segments": sort_segments}
          if backend in ("pallas_win", "pallas_rgb16") else {})

    def fn(st):
        return iterate_accumulate(key, cam, backend, params, cdf, st,
                                  hist, ppu, jnp.int32(n_chunks), K,
                                  32, **kw)

    dt, _ = time_fn(fn, state, warmup=1, iters=iters,
                    chain=lambda out, _args: (out[0],))
    return n_chunks * B * K / dt / 1e6


RGB16_PROMOTE_MARGIN = 1.05


def pick_tiled_backend(m: dict, candidates) -> str:
    """Per-geometry tiled-backend choice from the race measurements.

    The exact-f32 winner among `candidates` takes the slot unless
    pallas_rgb16 (bf16 color planes — a per-flush rounding envelope
    traded for halved tiled reload bytes) beats it by more than
    RGB16_PROMOTE_MARGIN: exactness is only traded for a real
    margin.  Unit-tested with a synthetic winning record
    (tests/test_render.py) — the promotion branch had never executed
    on a chip where rgb16 wins."""
    best = max(candidates, key=lambda b: m[f"{b}@720p"])
    rgb16 = m.get("pallas_rgb16@720p")
    if isinstance(rgb16, (int, float)) \
            and rgb16 > RGB16_PROMOTE_MARGIN * m[f"{best}@720p"]:
        return "pallas_rgb16"
    return best


def stamp(tune: dict) -> dict:
    """Timestamp + code-rev stamp (round-5 verdict: the round-3->4
    segment reversal proved records go stale on the same chip;
    render._load_tune warns when consuming a dated/foreign-rev
    record)."""
    import datetime
    tune["timestamp"] = datetime.datetime.now(
        datetime.timezone.utc).isoformat(timespec="seconds")
    from cuburn_tpu.render import _current_git_rev
    rev = _current_git_rev()
    if rev:
        tune["git_rev"] = rev
    return tune


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.environ.get(
        "CUBURN_TUNE_FILE", "cuburn_tune.json"))
    ap.add_argument("--quick", action="store_true",
                    help="fewer sweep points")
    ap.add_argument("--probe-dims", action="store_true",
                    help="probe max accumulator dim (may crash "
                         "fragile TPU workers for ~2 min)")
    args = ap.parse_args()

    from cuburn_tpu.models import full_feature
    from cuburn_tpu.ops.camera import CameraSpec
    from cuburn_tpu.ops.iterate import xform_cdf_rows

    g = full_feature()
    key = g.structure_key()
    params = jax.tree_util.tree_map(jnp.asarray, g.eval_at(0.0))
    cdf = xform_cdf_rows(params)
    # sweep sizes: env overrides exist so the tool itself can be
    # exercised end-to-end in CI at toy sizes (the measured VALUES are
    # then meaningless — only the default sizes produce a real tune)
    B = int(os.environ.get("CUBURN_RETUNE_BATCH", 1 << 15))
    n_chunks = int(os.environ.get("CUBURN_RETUNE_CHUNKS",
                                  8 if args.quick else 16))

    tune = {"device": str(jax.devices()[0]),
            "jax_backend": jax.default_backend(),
            "measurements": {}}
    m = tune["measurements"]

    def cam_for(W, H):
        return CameraSpec(W, H, 1), \
            params.ppu * jnp.float32(W / g.size[0])

    # 1. backend race at two densities (scatter_sorted: same sort the
    # pallas_win flush pays, but a monotone XLA scatter — untried on
    # real silicon, exact by construction; pallas_rgb16 — bf16 color
    # planes halve tiled reload bytes — only makes sense tiled, where
    # the flush is row-block-reload-bound)
    CANDIDATES = ("scatter", "scatter_sorted", "pallas_win")
    TILED_CANDIDATES = CANDIDATES + ("pallas_rgb16",)
    for label, (W, H) in {"512": (512, 512),
                          "720p": (1280, 720)}.items():
        cam, ppu = cam_for(W, H)
        for backend in (TILED_CANDIDATES if label == "720p"
                        else CANDIDATES):
            r = race(key, cam, params, cdf, ppu, backend, B, 64,
                     n_chunks)
            m[f"{backend}@{label}"] = round(r, 1)
            print(json.dumps({"race": f"{backend}@{label}",
                              "M_iters_per_s": round(r, 1)}))
    # per-GEOMETRY backend choice: the backends diverge most exactly
    # where histograms go HBM-tiled, so a single global winner is
    # wrong on chips where they split (Renderer picks
    # hist_backend_tiled for tiled geometries, hist_backend otherwise)
    tune["hist_backend"] = max(
        CANDIDATES, key=lambda b: m[f"{b}@512"])
    # rgb16 stores color bf16 (inside a per-flush rounding envelope,
    # vs the exact f32 paths): only worth trading exactness for a
    # real margin (pick_tiled_backend, unit-tested)
    tune["hist_backend_tiled"] = pick_tiled_backend(m, CANDIDATES)

    # 2. segmented sub-sort width (pallas_win only)
    cam, ppu = cam_for(512, 512)
    s_list = (1, 4, 16) if args.quick else (1, 2, 4, 8, 16, 32)
    best_s, best_r = 1, 0.0
    for s in s_list:
        r = race(key, cam, params, cdf, ppu, "pallas_win", B, 64,
                 n_chunks, sort_segments=s)
        m[f"sort_segments={s}"] = round(r, 1)
        print(json.dumps({"sort_segments": s,
                          "M_iters_per_s": round(r, 1)}))
        if r > best_r:
            best_s, best_r = s, r
    tune["sort_segments"] = best_s

    # 2b. segmented sub-sort at HBM-TILED density — the optimum flips
    # hard across the tiling boundary (dev chip: S=4 won 512² by 10%
    # while S=1 ran 1.62x S=4 at tiled 1080p-ss2 — wider windows drop
    # flush tiers at ~1-record/bin and straddle slots scale with S),
    # so the Renderer consumes a separate per-geometry key
    cam, ppu = cam_for(1280, 720)
    st_list = (1, 4) if args.quick else (1, 2, 4, 8)
    best_st, best_tr0 = 1, 0.0
    for s in st_list:
        r = race(key, cam, params, cdf, ppu, "pallas_win", B, 64,
                 n_chunks, sort_segments=s)
        m[f"sort_segments_tiled={s}"] = round(r, 1)
        print(json.dumps({"sort_segments_tiled": s,
                          "M_iters_per_s": round(r, 1)}))
        if r > best_tr0:
            best_st, best_tr0 = s, r
    tune["sort_segments_tiled"] = best_st

    # 2c. sort implementation (bitonic network vs lax.sort).  The two
    # produce IDENTICAL sorted streams, so the end-to-end delta IS the
    # sort-stage delta — a standalone chained sort race is a valid
    # proxy.  PER-GEOMETRY (round-5 lesson: lax.sort won 2^22 by ~17%
    # end-to-end while the tiled 1080p probe HALVED under a global lax
    # choice): raced at the 512² flush size on the tuned S ->
    # `sort_impl`, and at the tiled flush size on the tuned tiled S ->
    # `sort_impl_tiled`; Renderer threads the per-geometry winner as a
    # static arg through iterate_accumulate (render.py).  Round-5 dev
    # chip: lax.sort 9.87 ms vs bitonic-S1 11.92 ms at 2^22 — a
    # chip-drift reversal of the round-2 bitonic win (CLAUDE.md),
    # which is why this is re-raced per chip.
    from cuburn_tpu.ops.sort import sort_records
    from cuburn_tpu.utils.timing import time_fn

    def race_sort(n_sort, segs, label):
        recs0 = jax.random.randint(
            jax.random.PRNGKey(1), (n_sort,), 0,
            np.int64(1) << 32, jnp.uint32)
        best_impl, best_ms = "bitonic", float("inf")
        for impl in ("bitonic", "lax"):
            def fs(r, _impl=impl):
                return sort_records(r, segments=segs, impl=_impl)
            dt, _ = time_fn(
                fs, recs0, warmup=1, iters=4,
                chain=lambda out, _args: (
                    out[:n_sort] ^ jnp.uint32(1),))
            ms = dt * 1e3      # time_fn returns seconds PER CALL
            m[f"{label}={impl}"] = round(ms, 2)
            print(json.dumps({label: impl, "ms": round(ms, 2)}))
            if ms < best_ms:
                best_impl, best_ms = impl, ms
        return best_impl

    tune["sort_impl"] = race_sort(
        B * 64, tune["sort_segments"], "sort_impl")
    # tiled flush size: the standing 2^23 optimum (CLAUDE.md ladder);
    # section 3b's K sweep may move tiled_flush_records, but 2^23
    # stays representative of the tiled regime's sort economics
    tune["sort_impl_tiled"] = race_sort(
        1 << 23, tune["sort_segments_tiled"], "sort_impl_tiled")

    # 3. flush chunk size K — recorded as RECORDS per flush (B*K):
    # the tuned quantity is batch-independent, and the Renderer
    # divides by the profile's own batch (storing the raw K silently
    # mis-tuned any profile whose batch differs from the sweep's B).
    # Measured at the UNTILED geometry (512²): section 2b left the
    # tiled 720p camera active, so flush_records — the untiled key —
    # was being tuned on the wrong geometry (round-5 fix); the tiled
    # key gets its own sweep in 3b.
    cam, ppu = cam_for(512, 512)
    k_list = (32, 64) if args.quick else (16, 32, 64, 128, 256)
    best_k, best_r = 64, 0.0
    for k in k_list:
        nc = max(1, n_chunks * 64 // k)
        r = race(key, cam, params, cdf, ppu, "pallas_win", B, k, nc,
                 sort_segments=tune["sort_segments"])
        m[f"K={k}"] = round(r, 1)
        print(json.dumps({"K": k, "M_iters_per_s": round(r, 1)}))
        if r > best_r:
            best_k, best_r = k, r
    tune["flush_records"] = B * best_k

    # 3b. flush size at HBM-tiled density (720p bins = 8 row blocks):
    # a sorted flush reloads every row block it touches regardless of
    # record count, so bigger flushes amortize — on the dev chip the
    # gain rises monotonically to the Mosaic scoped-VMEM compile cap
    # (BASELINE.md K sweeps).  Record the best records-per-flush;
    # Renderer's auto mode divides by the profile batch.
    cam, ppu = cam_for(1280, 720)
    k_tiled = (64, 256) if args.quick else (32, 64, 128, 256, 512)
    best_tk, best_tr = None, 0.0
    for k in k_tiled:
        nc = max(1, n_chunks * 64 // k)
        try:
            r = race(key, cam, params, cdf, ppu, "pallas_win", B, k,
                     nc, sort_segments=tune["sort_segments"])
        except Exception as e:
            # expected past the scoped-VMEM cap (2^23 records at
            # BLOCK_ROWS=4096) — record and stop escalating
            m[f"K_tiled={k}"] = f"compile failed: {str(e)[:80]}"
            print(json.dumps({"K_tiled": k, "ok": False}))
            break
        m[f"K_tiled={k}"] = round(r, 1)
        print(json.dumps({"K_tiled": k, "M_iters_per_s": round(r, 1)}))
        if r > best_tr:
            best_tk, best_tr = k, r
    if best_tk is not None:
        tune["tiled_flush_records"] = B * best_tk
    # (no measured candidate — leave the key out so the Renderer's
    # auto mode keeps its built-in default instead of an unmeasured
    # value)

    # 4. optional dim probe
    if args.probe_dims:
        from cuburn_tpu.ops.iterate import (hist_alloc_for, init_state,
                                            iterate_accumulate)
        from cuburn_tpu.utils.timing import hard_sync
        safe = 0
        for dim in (1280, 1920, 2560, 3840):
            try:
                cam, ppu = cam_for(dim, dim * 9 // 16)
                hist = hist_alloc_for(tune["hist_backend"], cam.n_bins)
                state = init_state(jax.random.PRNGKey(0), B)
                out = iterate_accumulate(
                    key, cam, tune["hist_backend"], params, cdf,
                    state, hist, ppu, jnp.int32(1), 16, 32)
                hard_sync(out)
                safe = dim
                print(json.dumps({"dim_probe": dim, "ok": True}))
            except Exception as e:
                print(json.dumps({"dim_probe": dim, "ok": False,
                                  "error": str(e)[:200]}))
                break
        tune["dim_cap"] = safe or None

    stamp(tune)
    with open(args.out, "w") as f:
        json.dump(tune, f, indent=1)
    print(json.dumps({"tune_written": args.out,
                      "hist_backend": tune["hist_backend"],
                      "hist_backend_tiled": tune["hist_backend_tiled"],
                      "sort_segments": tune["sort_segments"],
                      "sort_impl": tune["sort_impl"],
                      "sort_impl_tiled": tune["sort_impl_tiled"],
                      "flush_records": tune["flush_records"],
                      "tiled_flush_records":
                          tune.get("tiled_flush_records")}))


if __name__ == "__main__":
    main()
