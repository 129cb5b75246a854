#!/usr/bin/env python
"""Histogram-backend benchmark + validator.

Parity with the reference's sortbench.py (SURVEY.md §2b "Sort
benchmark"): where cuburn validated its custom radix sort against numpy
argsort and reported throughput, this validates every histogram
accumulation backend against a numpy ground-truth bincount and reports
records/sec — the metric that decides the deferred-writeback design.

Usage: python sortbench.py [n_records_log2=21] [n_bins_log2=18]
"""

import sys
import time

import numpy as np


def main():
    n_log = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    b_log = int(sys.argv[2]) if len(sys.argv) > 2 else 18

    import jax
    import jax.numpy as jnp
    from cuburn_tpu.ops import histogram as hm
    from cuburn_tpu.ops import pallas_hist as ph
    from cuburn_tpu.ops.camera import CameraSpec
    from cuburn_tpu.ops.iterate import expand_palette, pack_records
    from cuburn_tpu.utils.timing import hard_sync

    M, n_bins = 1 << n_log, 1 << b_log
    print(f"backend={jax.default_backend()} records={M} bins={n_bins}")

    rng = np.random.RandomState(0)
    # flame-like skewed address distribution: mix of uniform + hotspots
    hot = rng.randint(0, n_bins, 64)
    mix = rng.rand(M) < 0.3
    addr_np = np.where(mix, hot[rng.randint(0, 64, M)],
                       rng.randint(0, n_bins, M)).astype(np.int32)
    rgba_np = rng.rand(M, 4).astype(np.float32)

    # ground truth via numpy
    truth = np.zeros((n_bins + 1, 4), np.float32)
    for c in range(4):
        truth[:, c] = np.bincount(addr_np, rgba_np[:, c],
                                  minlength=n_bins + 1)

    addr = jnp.asarray(addr_np)
    rgba = jnp.asarray(rgba_np)

    def run(name, fn, *args, validate=None):
        out = fn(*args)
        hard_sync(out)
        t0 = time.perf_counter()
        out = fn(*args)
        hard_sync(out)
        dt = time.perf_counter() - t0
        ok = ""
        if validate is not None:
            err = validate(out)
            ok = f"  max_err={err:.3g} {'OK' if err < 0.5 else 'FAIL'}"
        print(f"{name:<24} {dt * 1e3:8.1f} ms  "
              f"{M / dt / 1e6:8.1f} M rec/s{ok}")

    h0 = hm.alloc(n_bins)
    val = lambda out: float(np.abs(
        np.asarray(out)[:n_bins] - truth[:n_bins]).max())
    run("scatter", jax.jit(hm.accumulate_scatter), h0, addr, rgba,
        validate=val)
    run("sortcum", jax.jit(hm.accumulate_sortcum), h0, addr, rgba,
        validate=val)

    # pallas path takes packed records
    cbits = 10
    color = jnp.asarray(rng.rand(M).astype(np.float32))
    cam = CameraSpec(1 << (b_log // 2), 1 << (b_log - b_log // 2), 1)
    packed = pack_records(cam, cbits, addr, color)
    pal_hi = expand_palette(jnp.asarray(
        rng.rand(256, 3).astype(np.float32)), cbits)
    hp = ph.to_packed_layout(h0)
    interp = jax.default_backend() != "tpu"
    run("pallas", lambda *a: ph.accumulate_packed_pallas(
        *a, n_bins, cbits, interpret=interp), hp, packed, pal_hi)
    run("pallas_merged", lambda *a: ph.accumulate_merged_pallas(
        *a, n_bins, cbits, interpret=interp), hp, packed, pal_hi)

    # raw sort primitives (the reference's sortbench.py measured its
    # radix sort; ours compares lax.sort vs the roll-based bitonic)
    from cuburn_tpu.ops.sort import bitonic_sort_u32
    u32 = packed.reshape(-1)
    run("lax.sort keys", jax.jit(jax.lax.sort), u32,
        validate=lambda out: float(
            (np.asarray(out) != np.sort(np.asarray(u32))).mean()))
    run("bitonic (roll)", jax.jit(bitonic_sort_u32), u32,
        validate=lambda out: float(
            (np.asarray(out) != np.sort(np.asarray(u32))).mean()))


if __name__ == "__main__":
    main()
