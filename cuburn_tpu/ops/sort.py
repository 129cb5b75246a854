"""Vectorized bitonic sort for packed log records.

TPU-native replacement for the reference's custom GPU radix sort
(cuburn/code/sort.py, SURVEY.md §2b): cuburn sorted writeback-log keys
so its write kernel could aggregate runs; here a roll-based bitonic
network sorts packed u32 records so the histogram flush can merge
duplicate records (hot pixels — the exact contention the reference
engineered against) before touching memory.

Why not `jax.lax.sort`?  Chained round-2 remeasurement (CLAUDE.md;
the round-1 ~2 M elem/s figure was execution-cache-tainted) puts it at
~25-30 M rec/s on the dev chip vs this network's ~35-58 M — a real but
modest edge here; re-race both on real silicon (docs/ROADMAP.md).
The XOR-partner bitonic network below uses only `jnp.roll`,
compares and selects (~14 element-ops per substage), runs entirely on
vector lanes, and the identical code works inside Pallas kernels (roll
and select are Mosaic-supported), which is where round-2's fully fused
iterate+sort+flush kernel will host it.

The XOR-partner trick: for power-of-two stride k, element i's partner
is i^k.  For the half with (i & k) == 0 the partner sits at i + k =
roll(-k); for the other half at i - k = roll(+k); adding k to an index
whose k-bit is clear never carries past higher bits, so the circular
wrap of roll never lies.

Keys only — the histogram use packs everything (address + quantized
palette coordinate) into one u32, so records that compare equal are
identical and no payload permutation is needed.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Which sort network backs sort_records: "bitonic" (the roll-based
# XOR-partner network below) or "lax" (jax.lax.sort).  The two produce
# IDENTICAL outputs (same multiset, ascending), so this is purely a
# perf choice that drifts with chip economics: round-2 chained
# measurements had the bitonic ~1.5-2x ahead, the round-5 chip put
# lax.sort ~17% ahead at 2^22 (bench/sortrace.py) — race per round via
# bench/retune.py, which writes `sort_impl` into the tune record.
# Read at TRACE time (env CUBURN_SORT_IMPL > set_sort_impl > default):
# flipping it after a program is jit-cached does not retrace, which is
# benign for output (identical sorts) but matters when benchmarking —
# flip BEFORE the first trace.
_SORT_IMPL = None


def set_sort_impl(impl: str | None):
    """Set the process-default sort implementation (None = built-in
    default).  Called by the Renderer when a tune record carries
    `sort_impl`; the env var CUBURN_SORT_IMPL still wins."""
    global _SORT_IMPL
    if impl is not None and impl not in ("bitonic", "lax"):
        raise ValueError(f"unknown sort impl {impl!r}")
    _SORT_IMPL = impl


def _resolve_impl(impl: str | None) -> str:
    v = (os.environ.get("CUBURN_SORT_IMPL") or impl
         or _SORT_IMPL or "bitonic")
    if v not in ("bitonic", "lax"):
        raise ValueError(f"unknown sort impl {v!r}")
    return v


def bitonic_sort_u32(keys: jnp.ndarray,
                     seg_len: int = None) -> jnp.ndarray:
    """Ascending sort of a (N,) or (S, L) uint32 array along the LAST
    axis (each of the S rows sorted independently, in lockstep on the
    same vector ops).  The sorted length must be a power of two.

    The log L (log L + 1)/2 substages run in ONE fori_loop whose body
    reads its (block size, stride) pair from a precomputed schedule —
    all shifts are traced, so the program holds a single substage
    instead of ~230 unrolled copies (the unrolled version took minutes
    per remote compile and overflowed the dev environment's compile
    helper inside full render programs).

    `seg_len` (a power of two dividing N, 1-D input) sorts each
    contiguous seg_len-segment of the FLAT array independently — the
    SEGMENTED sub-sort.  On the XOR-partner network this is literally
    the same substage body with the schedule truncated to stages
    <= log seg_len: a partner index i^k with k < seg_len never crosses
    a seg_len boundary (adding k to an index whose k-bit is clear
    cannot carry past bit log2(seg_len)), so no reshape, no extra
    masking, no relayout — e.g. 16 segments of 2^17 inside a flat 2^21
    run 153 substages vs the full sort's 231 (~1.5x sort savings).
    The windowed histogram flush needs no global order across segments
    (each window's segment sum is independent), which is what makes
    the decomposition free of any merge pass."""
    n = keys.shape[-1]
    if n & (n - 1):
        raise ValueError(f"N must be a power of two, got {n}")
    sort_n = n
    if seg_len is not None:
        if keys.ndim != 1:
            raise ValueError("seg_len applies to 1-D input")
        if seg_len & (seg_len - 1) or n % seg_len:
            raise ValueError(
                f"seg_len must be a power of two dividing {n}, "
                f"got {seg_len}")
        sort_n = seg_len
    log_n = sort_n.bit_length() - 1
    idx = jnp.arange(n, dtype=jnp.uint32)
    if sort_n != n:
        # direction bits come from the WITHIN-segment index: at the
        # final stage (size == seg_len) a flat idx & size would flag
        # every odd segment as a descending block
        idx = idx & jnp.uint32(sort_n - 1)
    sched = [(1 << stage, 1 << sub)
             for stage in range(1, log_n + 1)
             for sub in range(stage - 1, -1, -1)]
    if not sched:
        return keys.astype(jnp.uint32)
    sizes = jnp.asarray([s for s, _ in sched], jnp.uint32)
    strides = jnp.asarray([k for _, k in sched], jnp.uint32)
    axis = keys.ndim - 1

    def substage(i, x):
        size = sizes[i]
        k = strides[i]
        # descending blocks where (i & size) != 0 — after the final
        # stage each sorted span has a single ascending block
        desc = (idx & size) != 0
        bit = (idx & k) != 0
        kk = k.astype(jnp.int32)
        partner = jnp.where(bit, jnp.roll(x, kk, axis=axis),
                            jnp.roll(x, -kk, axis=axis))
        lo = jnp.minimum(x, partner)
        hi = jnp.maximum(x, partner)
        return jnp.where(bit ^ desc, hi, lo)

    return jax.lax.fori_loop(0, len(sched), substage,
                             keys.astype(jnp.uint32))


def sort_records(records: jnp.ndarray, segments: int = 1,
                 impl: str = None) -> jnp.ndarray:
    """Sort a flat array of packed u32 records (any length: pads to the
    next power of two with 0xFFFFFFFF sentinels that sort to the end;
    the caller slices them off or lets them land in the junk bin).

    `segments` > 1 sorts that many equal contiguous sub-arrays
    independently (fewer bitonic substages over the same data — see
    bitonic_sort_u32); the result is ascending WITHIN each segment
    only.  Requires segments to divide the padded power-of-two length;
    falls back to fewer segments if it can't keep each one >= 2
    elements.

    `impl` picks the network ("bitonic"/"lax", identical outputs —
    see _SORT_IMPL above); None defers to CUBURN_SORT_IMPL /
    set_sort_impl / "bitonic"."""
    flat = records.reshape(-1).astype(jnp.uint32)
    n = flat.shape[0]
    pow2 = 1 << (n - 1).bit_length()
    if pow2 != n:
        flat = jnp.concatenate(
            [flat, jnp.full((pow2 - n,), 0xFFFFFFFF, jnp.uint32)])
    if segments > 1:
        if segments & (segments - 1):
            raise ValueError(f"segments must be a power of two, "
                             f"got {segments}")
        segments = max(1, min(segments, pow2 // 2))
    if _resolve_impl(impl) == "lax":
        if segments > 1:
            # same segment semantics: rows sorted independently (the
            # flat reshape keeps each contiguous segment one row)
            return jnp.sort(
                flat.reshape(segments, pow2 // segments),
                axis=-1).reshape(-1)
        return jnp.sort(flat)
    if segments > 1:
        return bitonic_sort_u32(flat, seg_len=pow2 // segments)
    return bitonic_sort_u32(flat)


def merge_sorted_records(sorted_recs: jnp.ndarray, junk_record):
    """Run-length merge of a SORTED record stream.

    Returns (unique_records (N,), counts (N,) int32) where the first U
    positions hold each distinct record with its multiplicity and the
    remainder are `junk_record` with count 0 — fixed shapes, no
    dynamic sizes, scatter-free (gather at prefix-sum positions).

    This is the segment-sum half of the reference's sorted-writeback
    design: duplicate (pixel, color) hits — the hot-spot contention
    case — collapse into one weighted update."""
    n = sorted_recs.shape[0]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_recs[1:] != sorted_recs[:-1]])
    seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1   # (N,)
    # first position of each segment, gathered at segment rank
    positions = jnp.arange(n, dtype=jnp.int32)
    # compact: for each output slot u, find the u-th run start via
    # searchsorted over seg_id (monotone), then counts by difference
    starts = jnp.searchsorted(seg_id, positions)          # (N,)
    valid = positions < seg_id[-1] + 1
    uniq = jnp.where(valid,
                     jnp.take(sorted_recs, jnp.minimum(starts, n - 1)),
                     junk_record)
    next_start = jnp.concatenate(
        [starts[1:], jnp.full((1,), n, jnp.int32)])
    counts = jnp.where(valid, next_start - starts, 0)
    return uniq, counts.astype(jnp.int32)
