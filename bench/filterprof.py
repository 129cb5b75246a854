#!/usr/bin/env python
"""Per-stage cost breakdown of the filter pipeline at binding size.

VERDICT round-2 weak #2: DE+colorize at 8.5 M bins reported 13.4 s
with no attribution.  This times each stage of _filter_band (logscale,
banded DE convs, spatial downsample, colorclip) separately on a
config-4-shaped band block, chained + hard-synced, plus the full
fused _filter_band program and the true end-to-end
finalize_frame_banded (host assembly + H2D + 6 band programs + D2H).

Round-3 finding (dev chip): the fused band program is ~67 ms/band
(~0.4 s device compute for all 6 bands of a 1080p ss2 frame); the
rest of the old 13.4 s was host-side block assembly, H2D/D2H over the
tunnel, and per-dispatch latency — NOT DE compute.  Per-stage numbers
are each ~30-40 ms, i.e. dominated by the dev chip's fixed dispatch
overhead; the fused program amortizes it.

Usage: python bench/filterprof.py [n_bands=6] [width=1920] [height=1080] [ss=2]
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


def main():
    n_bands = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    ss = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from functools import partial

    from cuburn_tpu.models import full_feature
    from cuburn_tpu.ops import de as de_mod
    from cuburn_tpu.ops.filtering import (colorclip, downsample,
                                          logscale)
    from cuburn_tpu.render import _filter_band
    from cuburn_tpu.utils.timing import hard_sync

    # config-4 geometry (render.py finalize_frame_banded)
    de_r = 9.0 * ss
    gutter = int(np.ceil(1.5 * min(de_r, de_mod.MAX_RADIUS_CAP)))
    acc_w = W * ss + 2 * gutter
    h_band = -(-H // n_bands)
    band_rows = h_band * ss
    margin = ss * int(np.ceil(
        (np.ceil(1.5 * min(de_r, de_mod.MAX_RADIUS_CAP)) + 1) / ss))
    bh = band_rows + 2 * margin
    print(f"band block {bh} x {acc_w} x 4 "
          f"({bh * acc_w * 16 / 1e6:.0f} MB f32) x {n_bands} bands; "
          f"full acc {H * ss + 2 * gutter} x {acc_w} "
          f"({(H * ss + 2 * gutter) * acc_w / 1e6:.1f} M bins)")

    rng = np.random.default_rng(0)
    dens = np.exp(rng.normal(3.0, 2.0, (bh, acc_w))).astype(np.float32)
    dens *= rng.random((bh, acc_w)) < 0.7
    img_np = np.repeat(dens[..., None], 4, axis=2) * \
        rng.random((bh, acc_w, 4)).astype(np.float32)
    img = jnp.asarray(img_np)
    dens_j = jnp.asarray(dens)

    results = {}

    def bench(label, fn, chain_img, iters=2):
        out = fn(chain_img)
        hard_sync(out)
        times = []
        for _ in range(iters):
            # chain the input through the previous output, and SYNC
            # the chained input before the timer starts
            chained = chain_img + \
                out.reshape(-1)[0].astype(chain_img.dtype) * 1e-30
            hard_sync(chained)
            t0 = time.perf_counter()
            out = fn(chained)
            hard_sync(out)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        results[label] = round(dt * 1e3, 1)
        print(json.dumps({"stage": label,
                          "ms_per_band": round(dt * 1e3, 1),
                          "s_all_bands": round(dt * n_bands, 3)}))

    q = jnp.float32(2000.0 * 1.0 / (ss * ss))
    bright = jnp.float32(4.0)

    bench("logscale", jax.jit(
        lambda x: logscale(x, bright, q)), img)
    bench("de_banded", jax.jit(lambda x: de_mod.density_filter(
        x, dens_j, jnp.float32(de_r), jnp.float32(0.0),
        jnp.float32(0.4), static_max_radius=de_r)), img)
    bench("de_banded_skip_empty", jax.jit(
        lambda x: de_mod.density_filter(
            x, dens_j, jnp.float32(de_r), jnp.float32(0.0),
            jnp.float32(0.4), static_max_radius=de_r,
            skip_empty=True)), img)
    bench("downsample+spatial", jax.jit(
        lambda x: downsample(x, ss, 1.0, "gaussian",
                             gutter=(margin, gutter))), img)
    small = jnp.asarray(img_np[:h_band, :W])
    bench("colorclip (out-res)", jax.jit(lambda x: colorclip(
        x, jnp.float32(4.0), jnp.float32(1.0), jnp.float32(1.0),
        jnp.float32(0.01), jnp.zeros(3, jnp.float32), False)), small)

    g = full_feature()
    params = jax.tree_util.tree_map(jnp.asarray, g.eval_at(0.0))
    bench("FUSED _filter_band", lambda x: _filter_band(
        x, params, q, ss, margin, gutter, False, True, de_r, 1.0,
        "gaussian").astype(jnp.float32), img)

    print(json.dumps({"per_stage_sum_ms": round(
        sum(v for k, v in results.items()
            if k not in ("FUSED _filter_band",
                         "de_banded_skip_empty")), 1),
        "fused_ms": results.get("FUSED _filter_band"),
        "note": "per-stage numbers carry one ~30-40 ms dispatch "
                "overhead EACH on the dev tunnel; the fused program "
                "pays it once"}))

    # true end-to-end: host assembly + transfers + n_bands programs
    from cuburn_tpu.profile import RenderProfile
    from cuburn_tpu.render import Renderer
    prof = RenderProfile(width=W, height=H, ss=ss, quality=2000)
    r = Renderer(g, prof)
    hist = np.zeros((r.cam.n_bins + 1, 4), np.float32)
    row = np.resize(img_np.reshape(-1, 4), (r.cam.n_bins, 4))
    hist[:r.cam.n_bins] = row
    for it in range(2):
        hist[0, 3] += np.float32(it) * 1e-30   # defeat exec cache
        t0 = time.perf_counter()
        r.finalize_frame_banded(hist, 0.0, n_bands=n_bands)
        dt = time.perf_counter() - t0
        print(json.dumps({"stage": "finalize_frame_banded e2e "
                                   "(host-resident hist)",
                          "iter": it, "s": round(dt, 2)}))
    # the REAL config-4 flow: accumulate_striped keeps the histogram
    # on device, so finalize never pays the H2D
    hist_dev = jnp.asarray(hist)
    hard_sync(hist_dev)
    for se in (False, True):
        for it in range(2):
            hd = hist_dev + np.float32(it + se) * 1e-30  # defeat cache
            hard_sync(hd)
            t0 = time.perf_counter()
            r.finalize_frame_banded(hd, 0.0, n_bands=n_bands,
                                    skip_empty=se)
            dt = time.perf_counter() - t0
            print(json.dumps({"stage": "finalize_frame_banded e2e "
                                       "(device-resident hist)",
                              "skip_empty": se,
                              "iter": it, "s": round(dt, 2)}))

    # isolate the final u8 D2H: read back a bands-shaped u8 array that
    # is already materialized on device (chained through a trivial add
    # so the tunnel's execution cache can't serve it)
    h_band_out = -(-H // n_bands)
    u8 = jnp.zeros((n_bands, h_band_out, W, 3), jnp.uint8)
    hard_sync(u8)
    for it in range(3):
        u8 = (u8 + jnp.uint8(1))
        hard_sync(u8.ravel()[0])           # dispatch done, data on dev
        t0 = time.perf_counter()
        _ = np.asarray(u8)
        dt = time.perf_counter() - t0
        mb = u8.size / 1e6
        print(json.dumps({"stage": "u8 D2H only (rgb bands)",
                          "iter": it, "s": round(dt, 3),
                          "MB": round(mb, 1),
                          "MB_per_s": round(mb / dt, 1)}))


if __name__ == "__main__":
    main()
