#!/usr/bin/env python
"""Per-stage cost breakdown of the filter pipeline at binding size.

VERDICT round-2 weak #2: DE+colorize at 8.5 M bins measured 13.4 s
with no attribution.  This times each stage of _filter_band (logscale,
banded DE convs, spatial downsample, colorclip) separately on a
config-4-shaped band block, chained + hard-synced, so optimization
goes where the time is.  Also measures the skip_empty DE variant on a
realistic (heavy-tailed) density field.

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

    from cuburn_tpu.ops import de as de_mod
    from cuburn_tpu.ops.filtering import (colorclip, downsample,
                                          logscale)
    from cuburn_tpu.utils.timing import hard_sync, time_fn

    # config-4 geometry (render.py finalize_frame_banded)
    de_r = 9.0 * ss
    gutter = int(np.ceil(1.5 * min(de_r, de_mod.MAX_RADIUS_CAP)))
    acc_w = W * ss + 2 * gutter
    h_band = -(-H // n_bands)
    band_rows = h_band * ss
    margin = ss * int(np.ceil(
        (np.ceil(1.5 * min(de_r, de_mod.MAX_RADIUS_CAP)) + 1) / ss))
    bh = band_rows + 2 * margin
    n_px = bh * acc_w
    print(f"band block {bh} x {acc_w} x 4 "
          f"({n_px * 16 / 1e6:.0f} MB f32) x {n_bands} bands; "
          f"full acc {H * ss + 2 * gutter} x {acc_w} "
          f"({(H * ss + 2 * gutter) * acc_w / 1e6:.1f} M bins)")

    # realistic heavy-tailed density: lognormal + empty gutter
    rng = np.random.default_rng(0)
    dens = np.exp(rng.normal(3.0, 2.0, (bh, acc_w))).astype(np.float32)
    dens *= rng.random((bh, acc_w)) < 0.7     # 30% empty cells
    img4 = np.repeat(dens[..., None], 4, axis=2) * \
        rng.random((bh, acc_w, 4)).astype(np.float32)
    img = jnp.asarray(img4)
    dens_j = jnp.asarray(dens)

    results = {}

    def bench(label, fn, *args, scale=n_bands):
        # chain by feeding the previous output's first element back
        def chained(prev, a):
            return (a[0] + prev.reshape(-1)[0] * 1e-30,) + a[1:]
        dt, _ = time_fn(fn, *args, warmup=1, iters=2, chain=chained)
        results[label] = round(dt * scale, 3)
        print(json.dumps({"stage": label,
                          "ms_per_band": round(dt * 1e3, 1),
                          "s_all_bands": round(dt * scale, 3)}))
        return dt

    q = jnp.float32(2000.0 / (ss * ss))
    bright = jnp.float32(4.0)

    ls = jax.jit(lambda x, d: logscale(
        jnp.concatenate([x[..., :3], d[..., None]], -1), bright, q))
    bench("logscale", ls, img, dens_j)

    de = jax.jit(partial(de_mod.density_filter, static_max_radius=de_r))
    bench("de_banded", de, img, dens_j, jnp.float32(de_r),
          jnp.float32(0.0), jnp.float32(0.4))

    de_skip = jax.jit(partial(de_mod.density_filter,
                              static_max_radius=de_r, skip_empty=True))
    bench("de_banded_skip_empty", de_skip, img, dens_j,
          jnp.float32(de_r), jnp.float32(0.0), jnp.float32(0.4))

    dsf = jax.jit(lambda x: downsample(x, ss, 1.0, "gaussian",
                                       gutter=(margin, gutter)))
    bench("downsample+spatial", dsf, img)

    small = jnp.asarray(img4[:h_band, :W])
    cc = jax.jit(lambda x: colorclip(
        x, jnp.float32(4.0), jnp.float32(1.0), jnp.float32(1.0),
        jnp.float32(0.01), jnp.zeros(3, jnp.float32), False))
    bench("colorclip (out-res)", cc, small)

    total = sum(results.values())
    print(json.dumps({"total_s_est": round(total, 2),
                      "breakdown": results}))


if __name__ == "__main__":
    main()
