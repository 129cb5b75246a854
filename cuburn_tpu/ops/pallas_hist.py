"""Pallas TPU histogram-accumulation kernel.

The performance-path accumulator named by BASELINE.json ("tile-local
VMEM accumulation ... flushes inside a Pallas kernel") and the
TPU-native equivalent of the reference's write kernel (cuburn's sorted
deferred writeback consumer, cuburn/code/sort.py + write kernel,
SURVEY.md §2b item 3).

Design:
  * The iterate loop (XLA) emits cuburn-style packed u32 log records
    (address + quantized palette coordinate, ops/iterate.py
    pack_records).
  * This kernel consumes the log with a grid over record blocks.  Each
    block is pipelined into SMEM by Pallas (so the scalar core can read
    individual records — the TPU analog of cuburn's warp reading its
    sorted log run), while the full histogram stays resident in VMEM
    across the whole grid (constant output index map).
  * The histogram uses a lane-packed layout: 32 bins x 4 channels per
    128-lane row, i.e. bin b lives at [b >> 5, 4*(b & 31) : +4].  A
    (bins, 4) layout would waste 124 of 128 lanes per VMEM tile.
  * Per record: read packed u32 from SMEM, unpack, fetch the palette
    rgba row (dynamic sublane index into a VMEM palette expanded to
    2^color_bits entries with density=1 appended), rotate it into the
    bin's lane slot with a dynamic lane-roll, and read-modify-write one
    histogram row.  No sort needed: VMEM random access replaces
    cuburn's radix-sort-for-locality.

Accumulation is exact (pure f32 adds, no prefix-sum roundoff), unlike
the sortcum backend.

Layout helpers convert between the lane-packed device layout and the
logical (bins+1, 4) histogram the rest of the pipeline uses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BINS_PER_ROW = 32
BLOCK = 1024          # log records per grid step (SMEM block)


def packed_rows(n_bins: int) -> int:
    """VMEM rows for n_bins + junk, padded to a sublane multiple."""
    rows = -(-(n_bins + 1) // BINS_PER_ROW)
    return -(-rows // 8) * 8


def to_packed_layout(hist: jnp.ndarray) -> jnp.ndarray:
    """(bins+1, 4) logical -> (rows, 128) lane-packed."""
    n = hist.shape[0]
    rows = packed_rows(n - 1)
    flat = jnp.zeros((rows * BINS_PER_ROW, 4), hist.dtype)
    flat = flat.at[:n].set(hist)
    return flat.reshape(rows, BINS_PER_ROW * 4)


def from_packed_layout(packed: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """(rows, 128) lane-packed -> (bins+1, 4) logical."""
    flat = packed.reshape(-1, 4)
    return flat[:n_bins + 1]


def _hist_kernel(log_ref, pal_ref, hist_ref):
    """Grid step: accumulate BLOCK packed records into the resident
    histogram.  log_ref: (BLOCK,) int32 in SMEM; pal_ref: (2^cbits,
    128) f32 in VMEM (rgba+density at lanes 0..3); hist_ref: (rows,
    128) f32 in VMEM, revisited across the grid."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        hist_ref[:] = jnp.zeros_like(hist_ref)

    cbits = int(np.log2(pal_ref.shape[0]))
    cmask = (1 << cbits) - 1

    n_rows = hist_ref.shape[0]

    def body(i, _):
        rec = log_ref[i]
        addr = jax.lax.shift_right_logical(rec, cbits)
        cq = rec & cmask
        # bounds guard: a malformed record must never write past VMEM
        row = jnp.minimum(addr // BINS_PER_ROW, n_rows - 1)
        slot = (addr % BINS_PER_ROW) * 4
        add = pltpu.roll(pal_ref[pl.ds(cq, 1), :], slot, axis=1)
        hist_ref[pl.ds(row, 1), :] = hist_ref[pl.ds(row, 1), :] + add
        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)


def _hist_kernel_counted(log_ref, cnt_ref, pal_ref, hist_ref):
    """Like _hist_kernel but each record carries a multiplicity
    (the merged-run flush: cuburn's sorted segmented write).  Records
    with count 0 are skipped via predication."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        hist_ref[:] = jnp.zeros_like(hist_ref)

    cbits = int(np.log2(pal_ref.shape[0]))
    cmask = (1 << cbits) - 1

    def body(i, _):
        rec = log_ref[i]
        cnt = cnt_ref[i]

        @pl.when(cnt > 0)
        def _():
            addr = jax.lax.shift_right_logical(rec, cbits)
            cq = rec & cmask
            # bounds guard: never write past the VMEM histogram
            row = jnp.minimum(addr // BINS_PER_ROW,
                              hist_ref.shape[0] - 1)
            slot = (addr % BINS_PER_ROW) * 4
            add = pltpu.roll(
                pal_ref[pl.ds(cq, 1), :] * cnt.astype(jnp.float32),
                slot, axis=1)
            hist_ref[pl.ds(row, 1), :] = \
                hist_ref[pl.ds(row, 1), :] + add
        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("n_bins", "color_bits", "interpret"))
def accumulate_merged_pallas(hist_packed, packed_records, palette_hi,
                             n_bins: int, color_bits: int,
                             interpret: bool = False, weight=None):
    """Sort + run-merge + count-weighted Pallas flush: the full
    'key-sort + segment-sum flushes' design named by BASELINE.json.

    Duplicate records (hot pixels hit repeatedly with the same palette
    coordinate — the heavy tail of flame density distributions)
    collapse into one weighted VMEM update each."""
    from cuburn_tpu.ops.sort import merge_sorted_records, sort_records

    rows = hist_packed.shape[0]
    junk_rec = jnp.uint32(n_bins << color_bits)
    sorted_recs = sort_records(packed_records)
    uniq, counts = merge_sorted_records(sorted_recs, junk_rec)
    # sort_records pads to a power of two with 0xFFFFFFFF sentinels;
    # after merging they surface as one unique record with a nonzero
    # count whose unpacked address is far out of range (an OOB VMEM
    # write on real silicon).  0xFFFFFFFF is never a valid record:
    # color_bits_for guarantees (n_bins << cbits) | cmask < 2^32 - 1.
    counts = jnp.where(uniq == jnp.uint32(0xFFFFFFFF), 0, counts)
    m = uniq.shape[0]
    n_blocks = -(-m // BLOCK)
    pad = n_blocks * BLOCK - m
    if pad:
        uniq = jnp.concatenate(
            [uniq, jnp.full((pad,), junk_rec, jnp.uint32)])
        counts = jnp.concatenate(
            [counts, jnp.zeros((pad,), jnp.int32)])

    pal128 = _pal128(palette_hi)
    delta = pl.pallas_call(
        _hist_kernel_counted,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((palette_hi.shape[0], 128),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        interpret=interpret,
    )(uniq.astype(jnp.int32), counts, pal128)
    if weight is not None:
        delta = delta * weight
    return hist_packed + delta


def _pal128(palette_hi):
    """Palette rows with density=1 appended, padded to 128 lanes."""
    pal = jnp.concatenate(
        [palette_hi, jnp.ones((palette_hi.shape[0], 1),
                              palette_hi.dtype)], axis=1)
    pal128 = jnp.zeros((palette_hi.shape[0], 128), jnp.float32)
    return pal128.at[:, :4].set(pal)


@functools.partial(jax.jit,
                   static_argnames=("n_bins", "color_bits", "interpret"))
def accumulate_packed_pallas(hist_packed, packed_records, palette_hi,
                             n_bins: int, color_bits: int,
                             interpret: bool = False, weight=None):
    """Accumulate packed u32 log records into a lane-packed histogram.

    hist_packed: (rows, 128) from to_packed_layout (or zeros)
    packed_records: (M,) or any shape, flattened; M padded to BLOCK by
                    the caller (pad with junk-bin records)
    palette_hi: (2^color_bits, 3) palette (expand_palette output)
    Returns the updated (rows, 128) histogram.
    """
    rows = hist_packed.shape[0]
    recs = packed_records.reshape(-1).astype(jnp.int32)
    m = recs.shape[0]
    n_blocks = -(-m // BLOCK)
    pad = n_blocks * BLOCK - m
    if pad:
        junk_rec = jnp.int32(n_bins << color_bits)
        recs = jnp.concatenate(
            [recs, jnp.full((pad,), junk_rec, jnp.int32)])

    pal128 = _pal128(palette_hi)
    delta = pl.pallas_call(
        _hist_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((palette_hi.shape[0], 128),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        interpret=interpret,
    )(recs, pal128)
    if weight is not None:
        delta = delta * weight
    return hist_packed + delta
