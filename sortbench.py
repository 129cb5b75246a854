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

    def run(name, fn, first, *args, validate=None, chain=None):
        """Validate on the warm first call; time a CHAINED second call
        (its input data-depends on the first output, so the tunnel's
        execution cache cannot serve it — see CLAUDE.md timing note)."""
        out = fn(first, *args)
        hard_sync(out)
        ok = ""
        if validate is not None:
            err = validate(out)
            exact = name.startswith(("lax.sort", "bitonic"))
            thresh = 0.0 if exact else 0.5
            ok = (f"  max_err={err:.3g} "
                  f"{'OK' if err <= thresh else 'FAIL'}")
        nxt = chain(out) if chain is not None else out
        # materialize the chained input BEFORE the timer starts, or
        # its construction (an elementwise pass over the whole array)
        # lands inside the timed window (bench.py's rule)
        hard_sync(nxt)
        t0 = time.perf_counter()
        out2 = fn(nxt, *args)
        hard_sync(out2)
        dt = time.perf_counter() - t0
        print(f"{name:<24} {dt * 1e3:8.1f} ms  "
              f"{M / dt / 1e6:8.1f} M rec/s{ok}")

    h0 = hm.alloc(n_bins)
    val = lambda out: float(np.abs(
        np.asarray(out)[:n_bins] - truth[:n_bins]).max())
    run("scatter", jax.jit(hm.accumulate_scatter), h0, addr, rgba,
        validate=val)
    run("scatter_sorted", jax.jit(hm.accumulate_scatter_sorted), h0,
        addr, rgba, validate=val)
    run("sortcum", jax.jit(hm.accumulate_sortcum), h0, addr, rgba,
        validate=val)

    # pallas path takes packed records; derive the color depth the
    # library itself would use so large n_bins_log2 can't overflow the
    # u32 record (addr << cbits must fit 32 bits)
    from cuburn_tpu.ops.iterate import color_bits_for
    cbits = color_bits_for(n_bins)
    if not cbits:
        raise SystemExit(f"n_bins_log2={b_log} too large for packed "
                         "records (color_bits_for == 0)")
    color = jnp.asarray(rng.rand(M).astype(np.float32))
    packed = pack_records(cbits, addr, color)
    pal_hi = expand_palette(jnp.asarray(
        rng.rand(256, 3).astype(np.float32)), cbits)
    hp = ph.to_packed_layout(h0)
    interp = jax.default_backend() != "tpu"
    # packed-record ground truth (palette-resolved)
    from cuburn_tpu.ops.iterate import unpack_records
    a_np, rgba_p = unpack_records(cbits, pal_hi, packed)
    truth_p = np.zeros((n_bins + 1, 4), np.float32)
    an, rn = np.asarray(a_np), np.asarray(rgba_p)
    for c in range(4):
        truth_p[:, c] = np.bincount(an, rn[:, c], minlength=n_bins + 1)
    val_packed = lambda out: float(np.abs(np.asarray(
        ph.from_packed_layout(out, n_bins))[:n_bins]
        - truth_p[:n_bins]).max())

    run("pallas", lambda *a: ph.accumulate_packed_pallas(
        *a, n_bins, cbits, interpret=interp), hp, packed, pal_hi,
        validate=val_packed)
    run("pallas_merged", lambda *a: ph.accumulate_merged_pallas(
        *a, n_bins, cbits, interpret=interp), hp, packed, pal_hi,
        validate=val_packed)

    # windowed kernel: 8 color bits (flam3 palette resolution), with
    # and without the run-merge pass
    def win_setup(addr_, color_, bins_):
        p8 = pack_records(8, addr_, color_)
        ph8 = expand_palette(jnp.asarray(palette), 8)
        a8, r8 = unpack_records(8, ph8, p8)
        t8 = np.zeros((bins_ + 1, 4), np.float32)
        an8, rn8 = np.asarray(a8), np.asarray(r8)
        for c in range(4):
            t8[:, c] = np.bincount(an8, rn8[:, c], minlength=bins_ + 1)
        v8 = lambda out: float(np.abs(np.asarray(
            ph.from_planes_layout(out, bins_))[:bins_]
            - t8[:bins_]).max())
        return p8, ph8, v8

    palette = rng.rand(256, 3).astype(np.float32)
    p8, pal8, v8 = win_setup(addr, color, n_bins)
    hpl = ph.to_planes_layout(h0)
    run("pallas_win", lambda *a: ph.accumulate_windowed_pallas(
        *a, n_bins, 8, interpret=interp), hpl, p8, pal8, validate=v8)
    run("pallas_win_merge", lambda *a: ph.accumulate_windowed_pallas(
        *a, n_bins, 8, interpret=interp, merge=True), hpl, p8, pal8,
        validate=v8)

    # dense flush (deep-accumulation regime: ~64 hits/bin, e.g. a
    # small-frame high-quality still): where the windowed MXU path
    # should shine vs per-update scatter
    bins_d = max(M // 64, 1 << 10)
    addr_d = jnp.asarray(np.where(
        mix, hot[rng.randint(0, 64, M)] % bins_d,
        rng.randint(0, bins_d, M)).astype(np.int32))
    rgba_d = jnp.asarray(rng.rand(M, 4).astype(np.float32))
    h0d = hm.alloc(bins_d)
    print(f"-- dense distribution: {M} records over {bins_d} bins --")
    run("scatter (dense)", jax.jit(hm.accumulate_scatter), h0d,
        addr_d, rgba_d)
    run("scatter_sorted (dense)",
        jax.jit(hm.accumulate_scatter_sorted), h0d, addr_d, rgba_d)
    p8d = pack_records(8, addr_d, color)
    hpld = ph.to_planes_layout(h0d)
    run("pallas_win (dense)", lambda *a: ph.accumulate_windowed_pallas(
        *a, bins_d, 8, interpret=interp), hpld, p8d, pal8)
    run("pallas_win_m (dense)", lambda *a: ph.accumulate_windowed_pallas(
        *a, bins_d, 8, interpret=interp, merge=True), hpld, p8d, pal8)

    # raw sort primitives (the reference's sortbench.py measured its
    # radix sort; ours compares lax.sort vs the roll-based bitonic)
    from cuburn_tpu.ops.sort import bitonic_sort_u32
    u32 = packed.reshape(-1)
    unsort = lambda out: out ^ jnp.uint32(0x55555555)
    run("lax.sort keys", jax.jit(jax.lax.sort), u32,
        validate=lambda out: float(
            (np.asarray(out) != np.sort(np.asarray(u32))).mean()),
        chain=unsort)
    run("bitonic (roll)", jax.jit(bitonic_sort_u32), u32,
        validate=lambda out: float(
            (np.asarray(out) != np.sort(np.asarray(u32))).mean()),
        chain=unsort)


if __name__ == "__main__":
    main()
