#!/usr/bin/env python
"""ONE real rgb16 flush from a nonzero starting histogram, on silicon.

Discriminates the rgb16race failure mode: if the rgb error after a
single flush is ~the starting rgb mass, the first-visit copy-in (or
the aliased buffer hand-off) is dropping prior mass; if it's within
one bf16 ulp of the running value, the error is accumulation-of-
rounding and the race's envelope math was wrong.

--chain N runs N chained flushes (hist carried through) of the SAME
record stream so bin values GROW — the race chains 13 flushes and
only then diverges; --segs S exercises the segmented sort's extra
straddle slots; --hot concentrates 20%% of records on 1024 bins so
running values reach the race's magnitudes.

Usage: python -u bench/rgb16single.py [--tiled] [--cpu] [--chain N]
           [--segs S] [--hot]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def main():
    from cuburn_tpu.ops import pallas_hist as ph
    from cuburn_tpu.ops.iterate import expand_palette, pack_records

    argv = sys.argv[1:]
    tiled = "--tiled" in argv
    hot = "--hot" in argv
    chain = int(argv[argv.index("--chain") + 1]) \
        if "--chain" in argv else 1
    segs = int(argv[argv.index("--segs") + 1]) \
        if "--segs" in argv else 1
    interpret = jax.default_backend() != "tpu"
    # tiled: past BLOCK_ROWS so the multi-block walk runs; resident
    # otherwise.  8 bits keeps the palette one-hot the production wide.
    n_bins = (ph.TILED_BLOCK_ROWS * 128 * 4 if tiled
              else 100_000)
    cbits = 8
    M = 1 << 16
    rng = np.random.RandomState(7)
    addr_np = rng.randint(0, n_bins, M)
    if hot:
        # 20% of records on 1024 bins placed WITHIN 512 bins of a
        # row-block boundary (the race's worst bins all sat there —
        # the straddle-diversion feeding zone); running values reach
        # the race's ~1200 over a 13-flush chain
        bs = ph.TILED_BLOCK_ROWS * 128
        nb = max(n_bins // bs, 1)
        hot_bins = (rng.randint(1, nb, 1024) * bs
                    + rng.randint(-512, 512, 1024)) % n_bins
        sel = rng.rand(M) < 0.2
        addr_np[sel] = hot_bins[rng.randint(0, 1024, int(sel.sum()))]
    addr = jnp.asarray(addr_np, jnp.int32)
    color = jnp.asarray(rng.rand(M).astype(np.float32))
    palette = jnp.asarray(rng.rand(256, 3).astype(np.float32))
    pal_hi = expand_palette(palette, cbits)
    packed = pack_records(cbits, addr, color)

    start = rng.rand(n_bins + 1, 4).astype(np.float32)
    start[:, 3] = rng.randint(0, 1000, n_bins + 1).astype(np.float32)
    start_l = jnp.asarray(start)

    d_new, r_new = ph.to_split_layout(start_l)
    want_pl = ph.to_planes_layout(start_l)
    # exact XLA scatter ground truth (judges BOTH pallas paths)
    q_np = (np.asarray(packed) & ((1 << cbits) - 1)).astype(np.int64)
    pal4 = np.asarray(ph._pal4(pal_hi))
    upd = jnp.asarray(pal4[q_np])                      # (M, 4)
    truth = jnp.asarray(start)
    for _ in range(chain):
        d_new, r_new = ph.accumulate_windowed_pallas_rgb16(
            (d_new, r_new), packed, pal_hi, n_bins, cbits,
            interpret=interpret, sort_segments=segs)
        want_pl = ph.accumulate_windowed_pallas(
            want_pl, packed, pal_hi, n_bins, cbits,
            interpret=interpret, sort_segments=segs)
        truth = truth.at[addr].add(upd)
    got = np.asarray(ph.from_split_layout(d_new, r_new, n_bins))
    want = np.asarray(ph.from_planes_layout(want_pl, n_bins))
    truth = np.asarray(truth)

    dens_err = float(np.abs(got[:-1, 3] - want[:-1, 3]).max())
    scale = np.maximum(np.abs(want[:-1, :3]), 1.0)
    rel = np.abs(got[:-1, :3] - want[:-1, :3]) / scale
    rgb_rel = float(rel.max())
    worst = int(np.unravel_index(rel.argmax(), rel.shape)[0])
    # judge both pallas paths against the exact scatter truth
    tscale = np.maximum(np.abs(truth[:-1, :3]), 1.0)
    f32_vs_truth = float((np.abs(want[:-1, :3] - truth[:-1, :3])
                          / tscale).max())
    r16_vs_truth = float((np.abs(got[:-1, :3] - truth[:-1, :3])
                          / tscale).max())
    f32_dens_vs_truth = float(
        np.abs(want[:-1, 3] - truth[:-1, 3]).max())
    # where is the error concentrated?  compare got-rgb against the
    # hypothesis "prior mass dropped": flush-only result
    zeros = ph.to_split_layout(jnp.zeros_like(start_l))
    d0, r0 = ph.accumulate_windowed_pallas_rgb16(
        zeros, packed, pal_hi, n_bins, cbits, interpret=interpret,
        sort_segments=segs)
    flush_only = np.asarray(ph.from_split_layout(d0, r0, n_bins))
    drop_rel = float((np.abs(got[:-1, :3] - flush_only[:-1, :3])
                      / scale).max())
    env = (chain + 1.5) * 2.0 ** -8
    print(json.dumps({
        "probe": "rgb16-single-flush", "tiled": tiled, "hot": hot,
        "chain": chain, "segs": segs, "n_bins": n_bins,
        "dens_err": dens_err,
        "rgb_rel_err_vs_f32path": round(rgb_rel, 6),
        "rgb_rel_if_prior_mass_dropped": round(drop_rel, 6),
        "worst_bin": worst,
        "worst_bin_mod_block": worst % (ph.TILED_BLOCK_ROWS * 128),
        "want_rgba_worst": [round(float(v), 3) for v in want[worst]],
        "got_rgb_worst": [round(float(v), 3) for v in got[worst, :3]],
        "truth_rgb_worst": [round(float(v), 3)
                            for v in truth[worst, :3]],
        "f32_rgb_vs_truth": round(f32_vs_truth, 6),
        "rgb16_vs_truth": round(r16_vs_truth, 6),
        "f32_dens_vs_truth": f32_dens_vs_truth,
        "envelope": round(env, 6),
        "ok": dens_err == 0.0 and rgb_rel <= env}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
