#!/usr/bin/env python
"""Per-bin on-device differential at HBM-TILED density.

bench.py's scatter-vs-pallas_win per-bin check runs at 512²
(VMEM-resident, one block).  This probe runs the SAME differential at
720p-bins density, where the windowed kernel exercises everything the
512² run cannot: the tiled row-block walk (4 x TILED_BLOCK_ROWS
blocks), the straddle side-scatter, the block-order group permutation,
and the in-kernel base/tier derivation — on the real Mosaic lowering,
not interpret mode (which has diverged from silicon twice: bf16 matmul
default, OOB block aliasing — CLAUDE.md).

Density must be bit-exact per bin (integer counts, any accumulation
order); rgb compared relative to local density (different palette
quantization widths between the backends).

Usage: python -u bench/tileddiff.py [--ipc 256] [--chunks 4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ipc", type=int, default=256,
                    help="iters per chunk (records/flush = batch*ipc)")
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    args = ap.parse_args()

    from cuburn_tpu.models import full_feature
    from cuburn_tpu.ops.camera import CameraSpec
    from cuburn_tpu.ops.iterate import (hist_alloc_for, hist_to_logical,
                                        init_state, iterate_accumulate,
                                        xform_cdf_rows)
    from cuburn_tpu.ops.pallas_hist import BLOCK_ROWS, planes_rows
    from cuburn_tpu.utils.timing import hard_sync

    on_tpu = jax.default_backend() == "tpu"
    g = full_feature()
    key = g.structure_key()
    params = jax.tree_util.tree_map(jnp.asarray, g.eval_at(0.0))
    cdf = xform_cdf_rows(params)
    B = 1 << 15 if on_tpu else 1 << 11
    cam = CameraSpec(args.width, args.height, 1)
    ppu = params.ppu * jnp.float32(args.width / g.size[0])
    rows = planes_rows(cam.n_bins)
    print(json.dumps({"probe": "tiled-per-bin-differential",
                      "n_bins": cam.n_bins, "rows": rows,
                      "tiled": rows > BLOCK_ROWS, "B": B,
                      "ipc": args.ipc, "chunks": args.chunks}))
    assert rows > BLOCK_ROWS, "geometry not HBM-tiled; raise dims"

    logical = {}
    for backend in ("scatter", "pallas_win"):
        state = init_state(jax.random.PRNGKey(0), B)
        hist = hist_alloc_for(backend, cam.n_bins)
        state, hist, n = iterate_accumulate(
            key, cam, backend, params, cdf, state, hist, ppu,
            jnp.int32(args.chunks), args.ipc, 32)
        hard_sync(hist)
        logical[backend] = hist_to_logical(backend, hist,
                                           cam.n_bins)[:-1]
        print(json.dumps({"backend": backend, "plotted": int(n)}))

    s, w = logical["scatter"], logical["pallas_win"]
    dens_err = float(jnp.max(jnp.abs(s[:, 3] - w[:, 3])))
    rgb_rel = float(jnp.max(jnp.abs(s[:, :3] - w[:, :3])
                            / jnp.maximum(s[:, 3:4], 1.0)))
    mass = float(jnp.sum(s[:, 3]))
    out = {"mass": mass,
           "mass_parity": round(float(jnp.sum(w[:, 3])) / max(mass, 1e-9),
                                6),
           "max_bin_err_density": dens_err,
           "max_bin_err_rgb_rel": round(rgb_rel, 6),
           "ok": dens_err == 0.0 and rgb_rel < 0.02}
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
