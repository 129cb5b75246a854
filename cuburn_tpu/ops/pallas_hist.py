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


def _pal4(palette_hi):
    """Palette rows as (K, 4): a 3-column palette gets density 1
    appended; a 4-column one (opacity-extended) is used as-is."""
    if palette_hi.shape[1] == 4:
        return palette_hi
    return jnp.concatenate(
        [palette_hi, jnp.ones((palette_hi.shape[0], 1),
                              palette_hi.dtype)], axis=1)


def _pal128(palette_hi):
    """Palette rows with the density column, padded to 128 lanes."""
    pal = _pal4(palette_hi)
    pal128 = jnp.zeros((palette_hi.shape[0], 128), jnp.float32)
    return pal128.at[:, :4].set(pal)


# ---------------------------------------------------------------------------
# Windowed one-hot-matmul flush (the segment-sum design from
# docs/KERNEL_DESIGN.md §5b): after key-sort + run-merge, 128
# consecutive unique records usually span < 128 bins, so the whole
# window's segment sum is TWO small MXU matmuls instead of 128 scalar
# read-modify-writes:
#
#   R[k, r]  = [q_r == k] * count_r          (K x 128 one-hot build, VPU)
#   WT       = palT (4, K) @ R               -> per-record weighted rgba
#   P[r, b]  = [addr_r - base == b]          (128 x 128 one-hot, VPU)
#   out      = WT (4, 128) @ P               -> per-bin channel sums
#   hist[:, base>>7, :] += out               (one dynamic-sublane RMW)
#
# This uses a CHANNEL-PLANES histogram layout (4, rows, 128) with bin b
# at [c, b >> 7, b & 127]: 128 aligned consecutive bins fill exactly one
# lane row per channel plane, so the matmul output lands without any
# in-kernel transpose or reshape (neither lowers well in Mosaic).
# Windows spanning >= 128 bins (sparse flushes) fall back to a
# roll-based per-record loop in the same kernel.
# ---------------------------------------------------------------------------

WIN = 128
# rows per VMEM-resident histogram block: 4 ch x 4096 x 128 x 4B = 8.4 MB.
# Histograms larger than this are HBM-resident and flushed block-by-block
# (KERNEL_DESIGN.md §6): the grid walks sorted windows, the output
# BlockSpec's index map reads the per-window row-block from a prefetched
# scalar array, so each block is fetched into VMEM once, accumulated
# over its contiguous run of windows, and written back — the 1080p ss2
# (8.6 M bin) configs ride the same kernel as 512².
import os as _os

# CUBURN_BLOCK_ROWS: histograms up to this many lane rows stay
# VMEM-resident for the whole flush (one block, no HBM walk).
# CUBURN_TILED_BLOCK_ROWS: the row-block size once HBM-tiled.  Smaller
# tiled blocks shrink the kernel's scoped-VMEM footprint (the histogram
# block is its largest term) at the cost of more block transitions +
# boundary straddles — measured ~2% at matched flush size — and that
# VMEM headroom is what unlocks LARGER flushes, which dominate: a
# sorted flush reloads every row block it touches ~independent of
# record count, so records/flush is the single biggest tiled-density
# lever (2^22 -> 2^24 records measured 60 -> 82+ M samples/s at 8.6 M
# bins; BASELINE.md).  At 4096 a 2^23-record flush is scoped-VMEM OOM
# by 8 KB.  Read once at import; a tune record cannot change them
# mid-process.
BLOCK_ROWS = int(_os.environ.get("CUBURN_BLOCK_ROWS", "4096"))
TILED_BLOCK_ROWS = min(BLOCK_ROWS, int(_os.environ.get(
    "CUBURN_TILED_BLOCK_ROWS", "2048")))


def planes_rows(n_bins: int) -> int:
    """Lane rows per channel plane for n_bins + junk: sublane-padded,
    and padded to a whole number of TILED_BLOCK_ROWS blocks when
    HBM-tiled (rows > BLOCK_ROWS)."""
    rows = -(-(n_bins + 1) // 128)
    rows = -(-rows // 8) * 8
    if rows > BLOCK_ROWS:
        rows = -(-rows // TILED_BLOCK_ROWS) * TILED_BLOCK_ROWS
    return rows


def to_planes_layout(hist: jnp.ndarray) -> jnp.ndarray:
    """(bins+1, 4) logical -> (4, rows, 128) channel planes."""
    n = hist.shape[0]
    rows = planes_rows(n - 1)
    flat = jnp.zeros((rows * 128, 4), hist.dtype)
    flat = flat.at[:n].set(hist)
    return flat.T.reshape(4, rows, 128)


def from_planes_layout(planes: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """(4, rows, 128) channel planes -> (bins+1, 4) logical."""
    flat = planes.reshape(4, -1).T
    return flat[:n_bins + 1]


def to_split_layout(hist: jnp.ndarray):
    """(bins+1, 4) logical -> (dens (1, rows, 128) f32,
    rgb (3, rows, 128) bf16): the rgb16 tiled-flush HBM layout —
    density keeps full f32 (counts are the exactness contract), the
    three color planes store bf16 to halve their reload bytes."""
    planes = to_planes_layout(hist)
    return planes[3:4], planes[0:3].astype(jnp.bfloat16)


def from_split_layout(dens: jnp.ndarray, rgb16: jnp.ndarray,
                      n_bins: int) -> jnp.ndarray:
    """Inverse of to_split_layout -> (bins+1, 4) logical f32."""
    planes = jnp.concatenate(
        [rgb16.astype(jnp.float32), dens.astype(jnp.float32)], axis=0)
    return from_planes_layout(planes, n_bins)


GROUP = 8     # windows per grid step (Mosaic needs 8-divisible sublanes)

# Group-mid tier span cap (rows): grid steps whose GROUP*WIN records
# span [2, GMID_ROWS] 128-lane bin rows run whole-group chunk dots
# (one (4, GW) @ (GW, 128) MXU contraction + one RMW per touched row)
# instead of the per-window path.  Static at trace time; 0 disables.
GMID_ROWS = int(_os.environ.get("CUBURN_GMID_ROWS", "8"))


def _make_win_kernel(block_rows: int, mxu_precision,
                     inplace: bool = False,
                     mode: str = None):
    """`mxu_precision` is the segment-sum matmul precision.

    HIGHEST is required for EXACTNESS only when some matmul input is
    not bf16-representable: merged-run counts (arbitrary ints) or an
    opacity-extended palette (arbitrary f32 density column).  On the
    default fast path (merge off, 3-col palette) every count weight is
    exactly 0/1 and the density column exactly 1.0 — both bf16-exact —
    so per-bin DENSITY stays bit-exact at DEFAULT, and the rgb rounding
    (~2^-9 relative, from the palette values themselves) sits below
    the 8-bit palette quantization the packed record already accepts.
    Measured on the dev chip: DEFAULT is 11.7% faster END TO END
    (140.9 vs 126.2 M samples/s at 512²).

    `inplace` (round 4): the kernel receives the CURRENT histogram as
    an extra input left in ANY memory space (HBM — aliased to the
    output buffer via input_output_aliases) plus the temporal-filter
    weight as an SMEM scalar; on each block's first visit it DMAs the
    block straight from HBM into the output window and accumulates on
    top — the caller's separate delta buffer and its full
    read-read-write `hist + delta` pass disappear, ~halving per-flush
    HBM traffic.  ANY (manual DMA) rather than a pipelined VMEM input
    window because Mosaic double-buffers every pipelined window: a
    second br-row window blows the 16 MB scoped-VMEM limit at both
    render geometries (measured 16.06M at rows=2056, 16.01M at
    br=2048 tiled).  The weight multiplies each window's f32
    segment-sum OUTPUT (not the matmul inputs), so the
    precision-by-contract argument above is untouched: at weight==1.0
    per-bin density stays bit-exact at DEFAULT precision.

    `mode="rgb16"` (round 4, VERDICT item 5): HBM stores the three RGB
    planes bf16 (half the reload bytes on 3/4 planes) while density
    stays f32 (exactness contract) — accumulation is STILL full f32 in
    a (4, br, 128) VMEM scratch; rounding to bf16 happens only at each
    block's LAST visit, when the scratch DMAs back out.  In and out
    both live in ANY space (manual DMA), aliased in↔out, so unvisited
    blocks keep their mass for free and nothing is double-buffered."""
    mode = mode or ("inplace" if inplace else "delta")
    rgb16 = mode == "rgb16"
    inplace = mode == "inplace"

    def _win_kernel(perm_ref, rbg_ref, addr_s_ref,
                    addr_f_ref, q_f_ref, cnt_f_ref, palF_ref,
                    *rest_refs):
        if rgb16:
            (dens_in_ref, rgb_in_ref, w_ref, dens_out_ref,
             rgb_out_ref, acc_ref, stage_ref, copy_sem) = rest_refs
            out_ref = acc_ref          # all window RMWs hit the f32
        elif inplace:                  # VMEM scratch in rgb16 mode
            hist_in_ref, w_ref, out_ref, copy_sem = rest_refs
        else:
            (out_ref,) = rest_refs
        """One grid step = GROUP windows of WIN sorted unique records.

        Scalar-prefetch refs (full SMEM arrays): perm_ref — grid step
        i processes LOGICAL group perm[i]; the permutation orders
        groups by row block so each block's visits are contiguous even
        with a segmented sort (whose per-segment block walks would
        otherwise interleave and re-trigger the first-visit zeroing).
        rbg_ref — per logical GROUP, the histogram row block it lands
        in (windows not fitting their group's block were diverted to
        the XLA side-scatter upstream).
        Each window's 128-aligned base bin and flush tier are computed
        IN-KERNEL from addr_s (first/last record of the sorted window)
        rather than prefetched: per-window s32[n_win] SMEM arrays were
        the binding constraint on flush size (2 x 512 KB of the 1 MB
        SMEM at 2^24 records — BASELINE.md flush-size ladder).  Tiers:
        span < 128 — all records inside [base, base+128) (one matmul);
        span < 8*128 — chunked matmuls (one per touched lane row);
        else — per-record roll fallback.
        addr_s_ref: (GROUP, WIN) SMEM int32 (scalar reads).
        addr_f_ref/q_f_ref/cnt_f_ref: (1, 1, GROUP*WIN) VMEM int32/
        int32/float32 — the grid step's records FLAT along the lane
        axis
        (same memory order as the (GROUP, WIN) view; window j is the
        static lane slice [j*WIN, (j+1)*WIN)), block-fetched through
        the same perm[i] index map.  The flat layout lets the palette
        weighting stage run ONCE per grid step — one (4*KH, KL) @
        (KL, GROUP*WIN) matmul feeding every window — and the
        group-dense fast path contract all GROUP*WIN records in ONE
        MXU dot instead of GROUP, cutting the kernel's matmul issue
        count ~8x (round 5; the per-step overheads, not the
        arithmetic, dominated at 512²-class densities).
        palF_ref: (4*KH, KL) VMEM — palette^T with the density row,
        factored for the two-level one-hot (see _window).
        out_ref: (4, block_rows, 128) — the group's row block,
        VMEM-resident across its contiguous run of groups.
        """
        gi = pl.program_id(0)
        lg = perm_ref[gi]
        rb = rbg_ref[lg]
        prev_rb = rbg_ref[perm_ref[jnp.maximum(gi - 1, 0)]]

        @pl.when(jnp.logical_or(gi == 0, rb != prev_rb))
        def _first_visit():
            if rgb16:
                # split-plane load: density f32 block straight into
                # the scratch's density channel; rgb bf16 block via a
                # bf16 staging buffer, upcast into the scratch — from
                # here on the whole block accumulates in f32
                cp = pltpu.make_async_copy(
                    dens_in_ref.at[:, pl.ds(rb * block_rows,
                                            block_rows), :],
                    acc_ref.at[pl.ds(3, 1)], copy_sem)
                cp.start()
                cp.wait()
                cp2 = pltpu.make_async_copy(
                    rgb_in_ref.at[:, pl.ds(rb * block_rows,
                                           block_rows), :],
                    stage_ref, copy_sem)
                cp2.start()
                cp2.wait()
                acc_ref[pl.ds(0, 3)] = \
                    stage_ref[:].astype(jnp.float32)
            elif inplace:
                # DMA the running histogram block from HBM into the
                # output window; new mass accumulates ON TOP and the
                # block writes back in place of the caller's
                # hist+delta pass.  Safe with the aliased buffer:
                # the group permutation guarantees one contiguous run
                # per block, so block b is never read here after its
                # own write-back.
                cp = pltpu.make_async_copy(
                    hist_in_ref.at[:, pl.ds(rb * block_rows,
                                            block_rows), :],
                    out_ref, copy_sem)
                cp.start()
                cp.wait()
            else:
                out_ref[:] = jnp.zeros_like(out_ref)

        w_t = (w_ref[0, 0] if (inplace or rgb16)
               else np.float32(1.0))

        row_off = rb * block_rows
        kh = palF_ref.shape[0] // 4       # palette factored KH x KL
        kl = palF_ref.shape[1]
        GW = GROUP * WIN
        biota = jax.lax.broadcasted_iota(jnp.int32, (128, WIN), 0)
        liota = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)

        # ---- shared palette weighting, ONCE per grid step ----
        # WT_all[c, n] = cnt_n * pal[c, q_n] for every record of the
        # grid step at once, via the two-level one-hot (q = kl*qh +
        # ql; building (KH,GW)+(KL,GW) one-hots costs K/KH + K/KL of
        # the flat (K,GW) build): ONE (4KH, KL) @ (KL, GW) matmul +
        # one (KH, GW) mask-reduce instead of GROUP copies of each —
        # the flat lane-major record layout exists for exactly this.
        # HIGHEST precision when any input is not bf16-representable:
        # default MXU precision mangles count-weighted sums (measured
        # max_err ~1 at 2M records); exactness vs scatter is the
        # contract (precision-by-contract, see docstring).
        q_all = q_f_ref[0]                          # (1, GW)
        cnt_all = cnt_f_ref[0]                      # (1, GW)
        addr_all = addr_f_ref[0]                    # (1, GW)
        lio_f = jax.lax.broadcasted_iota(jnp.int32, (kl, GW), 0)
        hio_f = jax.lax.broadcasted_iota(jnp.int32, (kh, GW), 0)
        L = jnp.where(q_all % kl == lio_f, cnt_all, np.float32(0.0))
        H = (q_all // kl == hio_f).astype(jnp.float32)
        T1 = jnp.dot(palF_ref[:, :], L,
                     preferred_element_type=jnp.float32,
                     precision=mxu_precision)       # (4KH, GW)
        WT_all = jnp.sum(T1.reshape(4, kh, GW) * H[None], axis=1)

        # ---- group-dense fast path (round 5) ----
        # At >= a few records/bin (the 512²-class hot case) 128 sorted
        # records span only a handful of bins, so the WHOLE grid
        # step's GROUP*WIN records usually live inside one 128-lane
        # bin row.  ONE (4, GW) @ (GW, 128) MXU contraction + ONE row
        # RMW replaces GROUP branchy windows with a dynamic-slice RMW
        # each (the per-window overheads measured ~5x the arithmetic,
        # bench/flushprof.py).  Exactness contract unchanged: same
        # products, same precision, f32 adds of integer-count
        # densities in a different order.
        first_g = addr_s_ref[0, 0]
        last_g = addr_s_ref[GROUP - 1, WIN - 1]
        base_g = (first_g // 128) * 128
        span_g = last_g - base_g
        # clamp: an all-sentinel pad group (zero counts everywhere)
        # can land here with span < 128 but a row far outside the
        # block — its adds are zero, the RMW address just must not
        # alias out of bounds (Mosaic OOB indices alias real data)
        rg = jnp.clip(base_g // 128 - row_off, 0, block_rows - 1)

        @pl.when(span_g < 128)
        def _group_dense():
            bio_f = jax.lax.broadcasted_iota(jnp.int32, (128, GW), 0)
            Pt = (addr_all - base_g == bio_f).astype(jnp.float32)
            acc = jax.lax.dot_general(
                WT_all, Pt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu_precision)            # (4, 128)
            if inplace or rgb16:
                acc = acc * w_t
            out_ref[:, pl.ds(rg, 1), :] = \
                out_ref[:, pl.ds(rg, 1), :] + acc[:, None, :]

        # ---- group-mid tier (round 5 follow-up) ----
        # A grid step that just straddles a row boundary (span 2..
        # GMID_ROWS rows — ~25% of groups at 512²-class density, where
        # GW sorted records cover ~GW/16 bins) previously fell all the
        # way to the per-window path, whose branchy overheads measured
        # ~5x its arithmetic.  Run the SAME whole-group contraction as
        # group-dense once per touched row instead: records outside
        # row chunk c simply miss its one-hot.  Traced trip count from
        # the group's true span, mirroring the window mid tier.
        # Exactness contract unchanged (same products, f32 adds of
        # integer-count densities in a different order).
        if GMID_ROWS >= 2:
            @pl.when(jnp.logical_and(span_g >= 128,
                                     span_g < GMID_ROWS * 128))
            def _group_mid():
                bio_f = jax.lax.broadcasted_iota(
                    jnp.int32, (128, GW), 0)

                def chunk(c, _):
                    Pt = (addr_all - (base_g + 128 * c)
                          == bio_f).astype(jnp.float32)
                    acc = jax.lax.dot_general(
                        WT_all, Pt, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mxu_precision)    # (4, 128)
                    if inplace or rgb16:
                        acc = acc * w_t
                    # rows past the block end only ever receive zero
                    # one-hots (block straddles are diverted
                    # upstream); clamp so the RMW stays in bounds
                    rc = jnp.clip(base_g // 128 - row_off + c, 0,
                                  block_rows - 1)
                    out_ref[:, pl.ds(rc, 1), :] = \
                        out_ref[:, pl.ds(rc, 1), :] + acc[:, None, :]
                    return 0

                nc = jnp.clip(span_g // 128 + 1, 2, GMID_ROWS)
                jax.lax.fori_loop(0, nc, chunk, 0)

        def window(j):
            # window j of the grid step: STATIC lane slices of the
            # flat records / shared WT_all (j is a Python int — the
            # per-window path is statically unrolled)
            lo, hi = j * WIN, (j + 1) * WIN
            cnt_row = cnt_all[:, lo:hi]             # (1, WIN)
            total = jnp.sum(cnt_row)

            @pl.when(total > 0)
            def _window():
                WT = WT_all[:, lo:hi]               # (4, WIN)
                addr_row = addr_all[:, lo:hi]       # (1, WIN)
                # base + tier from the sorted window's first/last
                # record (SMEM scalar reads) — no prefetch arrays
                first = addr_s_ref[j, 0]
                last = addr_s_ref[j, WIN - 1]
                base = (first // 128) * 128
                span = last - base
                r0 = base // 128 - row_off

                @pl.when(span < 128)
                def _dense():
                    # all records inside [base, base+128): ONE matmul
                    Pt = (addr_row - base
                          == biota).astype(jnp.float32)  # (128, WIN)
                    out = jax.lax.dot_general(
                        WT, Pt, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mxu_precision)  # (4,128)
                    if inplace or rgb16:
                        out = out * w_t
                    out_ref[:, pl.ds(r0, 1), :] = \
                        out_ref[:, pl.ds(r0, 1), :] + out[:, None, :]

                @pl.when(jnp.logical_and(span >= 128, span < 8 * 128))
                def _mid():
                    # span < 8*128 bins (sparse flushes, ~0.1-1
                    # records/bin): chunked matmuls, one per lane row
                    # the window actually touches — records outside
                    # chunk c just miss its one-hot.  The trip count
                    # is TRACED from the window's true span (last
                    # record's row - base row + 1): a window spanning
                    # 2 lane rows costs 2 matmuls, not a fixed 8 —
                    # this is what makes ~1-record/bin flush densities
                    # (720p/1080p configs) cheap.  fori (not
                    # unrolled): the unrolled version blew the remote
                    # compile helper's limits inside full render
                    # programs.
                    def chunk(c, _):
                        Pt = (addr_row
                              - (base + 128 * c)
                              == biota).astype(jnp.float32)
                        out = jax.lax.dot_general(
                            WT, Pt, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=mxu_precision)
                        if inplace or rgb16:
                            out = out * w_t
                        # rows past the block end only ever receive
                        # zero one-hots (block straddles are diverted
                        # upstream); clamp so the RMW stays in bounds
                        rc = jnp.minimum(r0 + c, block_rows - 1)
                        out_ref[:, pl.ds(rc, 1), :] = \
                            out_ref[:, pl.ds(rc, 1), :] \
                            + out[:, None, :]
                        return 0

                    nc = jnp.clip(span // 128 + 1, 1, 8)
                    jax.lax.fori_loop(0, nc, chunk, 0)

                @pl.when(span >= 8 * 128)
                def _sparse():
                    def body(k, _):
                        a = addr_s_ref[j, k]
                        lane = a % 128
                        # rotate record k's column to its bin lane
                        add = pltpu.roll(WT, lane - k, axis=1) \
                            * (liota == lane).astype(jnp.float32)
                        if inplace or rgb16:
                            add = add * w_t
                        row = jnp.clip(a // 128 - row_off, 0,
                                       block_rows - 1)
                        out_ref[:, pl.ds(row, 1), :] = \
                            out_ref[:, pl.ds(row, 1), :] \
                            + add[:, None, :]
                        return 0

                    jax.lax.fori_loop(0, WIN, body, 0)

        @pl.when(span_g >= max(GMID_ROWS, 1) * 128)
        def _per_window():
            for j in range(GROUP):        # static unroll
                window(j)

        if rgb16:
            # block complete?  (the group permutation makes each
            # block's visits one contiguous run, so "next grid step is
            # a different block" == last visit) — round rgb to bf16
            # and DMA the scratch back out; density stays f32
            ng = pl.num_programs(0)
            nxt_rb = rbg_ref[perm_ref[jnp.minimum(gi + 1, ng - 1)]]

            @pl.when(jnp.logical_or(gi == ng - 1, rb != nxt_rb))
            def _last_visit():
                stage_ref[:] = acc_ref[pl.ds(0, 3)].astype(
                    jnp.bfloat16)
                cp = pltpu.make_async_copy(
                    stage_ref,
                    rgb_out_ref.at[:, pl.ds(rb * block_rows,
                                            block_rows), :],
                    copy_sem)
                cp.start()
                cp.wait()
                cp2 = pltpu.make_async_copy(
                    acc_ref.at[pl.ds(3, 1)],
                    dens_out_ref.at[:, pl.ds(rb * block_rows,
                                             block_rows), :],
                    copy_sem)
                cp2.start()
                cp2.wait()

    return _win_kernel


INPLACE_FLUSH = _os.environ.get("CUBURN_INPLACE_FLUSH", "1") != "0"


def _prep_windows(packed_records, palette_hi, n_bins,
                  color_bits, merge, sort_segments,
                  br, n_blocks, sort_impl=None):
    """Shared record prep for the windowed flush family:
    key-sort (optionally segmented), optional run-merge,
    window reshapes, per-group row-block ids + the block-
    contiguity permutation, boundary-straddle diversion, the
    factored palette and the precision-by-contract choice.
    Returns a dict consumed by accumulate_windowed_pallas and
    accumulate_windowed_pallas_rgb16."""
    from cuburn_tpu.ops.sort import (merge_sorted_records,
                                     sort_records)

    junk_rec = jnp.uint32(n_bins << color_bits)
    cmask = np.uint32((1 << color_bits) - 1)
    nrec = int(np.prod(packed_records.shape))
    pow2 = 1 << (nrec - 1).bit_length()
    # each segment must hold a whole number of GROUP*WIN-record groups
    # (otherwise a window could straddle a segment boundary and its
    # records would not be sorted relative to each other)
    segs = min(sort_segments, max(pow2 // (GROUP * WIN), 1))
    if merge and segs > 1:
        # run-merge compacts each segment's uniques front-to-back, so
        # a flush window can contain records from two segments with
        # DESCENDING addresses — the tier selection's monotonicity
        # assumption breaks and mass silently vanishes.  Merge needs a
        # globally sorted stream.
        raise ValueError("merge=True requires sort_segments == 1 "
                         "(per-segment runs break window-local "
                         "monotonicity after compaction)")
    sorted_recs = sort_records(packed_records, segments=segs,
                               impl=sort_impl)
    if merge:
        # run-merge collapses duplicates into counts (fewer active
        # windows on hot-pixel distributions), at the cost of a
        # searchsorted + gather pass over the whole log
        uniq, counts = merge_sorted_records(sorted_recs, junk_rec)
    else:
        # merge-free: duplicates just land in the same one-hot column
        # of their window's segment-sum matmul
        uniq = sorted_recs
        counts = jnp.ones(uniq.shape, jnp.int32)
    counts = jnp.where(uniq == jnp.uint32(0xFFFFFFFF), 0, counts)
    m = uniq.shape[0]
    n_grp = -(-m // (GROUP * WIN))
    n_win = n_grp * GROUP
    pad = n_win * WIN - m
    if pad:
        uniq = jnp.concatenate(
            [uniq, jnp.full((pad,), junk_rec, jnp.uint32)])
        counts = jnp.concatenate([counts, jnp.zeros((pad,), jnp.int32)])

    addr = (uniq >> np.uint32(color_bits)).astype(jnp.int32)
    q = (uniq & cmask).astype(jnp.int32)
    addr_w = addr.reshape(n_win, WIN)
    q_w = q.reshape(n_win, WIN)
    cnt_w = counts.astype(jnp.float32).reshape(n_win, WIN)
    base = addr_w[:, 0] & ~np.int32(127)
    # (the per-window flush tier — dense / chunked-mid / per-record —
    # is derived IN-KERNEL from the window's first/last sorted record;
    # prefetching it cost 2 x 4B/window of SMEM, the binding constraint
    # on flush size past 2^22 records)
    # clamp: zero-count sentinel-tail windows carry huge addresses; an
    # out-of-range block index would alias onto a real block and its
    # first-visit zeroing would erase real accumulation
    rb = jnp.minimum((base // 128) // br, n_blocks - 1)
    rbg = rb.reshape(n_grp, GROUP)[:, 0]     # per group
    if n_blocks > 1 and segs > 1:
        # segmented sort: each segment walks the blocks 0..n_blocks-1
        # on its own, so grid-order block visits interleave; process
        # groups in block order instead (stable argsort keeps each
        # block's per-segment runs intact).  n_grp is a few thousand —
        # the argsort is trivial, and the reorder itself costs nothing:
        # the BlockSpec index maps fetch group perm[i] directly.
        perm = jnp.argsort(rbg, stable=True).astype(jnp.int32)
    else:
        # fully sorted records already visit blocks contiguously
        perm = jnp.arange(n_grp, dtype=jnp.int32)
    if n_blocks > 1:
        # windows whose rows don't all fit their GROUP's row block:
        # divert to an exact side-scatter (fixed capacity; at most one
        # group per block boundary can straddle it — PER SORTED
        # SEGMENT, since each segment's ascending walk crosses every
        # boundary once)
        grp_of_win = jnp.repeat(rbg, GROUP)
        last_rb = jnp.minimum((addr_w[:, -1] // 128) // br,
                              n_blocks - 1)
        straddle = (rb != grp_of_win) | (last_rb != grp_of_win)
        sc = GROUP * (n_blocks * segs + 1)
        rank = jnp.cumsum(straddle.astype(jnp.int32)) - 1
        slot = jnp.where(straddle, rank, sc)
        winp1 = jnp.zeros((sc,), jnp.int32).at[slot].set(
            jnp.arange(n_win, dtype=jnp.int32) + 1, mode="drop")
        sel = jnp.maximum(winp1 - 1, 0)
        valid = (winp1 > 0).astype(jnp.float32)
        s_addr = addr_w[sel].reshape(-1)
        s_q = q_w[sel].reshape(-1)
        s_cnt = (cnt_w[sel] * valid[:, None]).reshape(-1)
        s_rgba = jnp.take(_pal4(palette_hi), s_q, axis=0) \
            * s_cnt[:, None]
        cnt_w = jnp.where(straddle[:, None], 0.0, cnt_w)

    k = palette_hi.shape[0]
    kl = 16 if k % 16 == 0 else 1
    palT = _pal4(palette_hi).T                    # (4, K)
    palF = palT.reshape(4, k // kl, kl).reshape(4 * (k // kl), kl)

    # precision by exactness contract (see _make_win_kernel): the
    # default fast path (no merge, 3-col palette -> all matmul count/
    # density weights exactly bf16-representable) runs the MXU at
    # DEFAULT (+11.7% end-to-end); merged counts or opacity-extended
    # palettes keep HIGHEST so per-bin density stays exact.
    exact_at_default = (not merge) and palette_hi.shape[1] == 3
    mxu_precision = (jax.lax.Precision.DEFAULT if exact_at_default
                     else jax.lax.Precision.HIGHEST)

    # flat lane-major views for the kernel's VMEM record inputs: the
    # SAME memory order as the (n_win, WIN) window view, reshaped so a
    # grid step's GROUP*WIN records ride in as ONE (1, GROUP*WIN) row
    # — the kernel's shared palette stage and group-dense contraction
    # each become a single wide matmul (see _make_win_kernel).  The
    # arrays are 3-D (n_grp, 1, GW) with the grid-step axis LEADING:
    # Mosaic requires a block's last two dims divisible by (8, 128) or
    # equal to the array's — (1, GW) == the trailing dims exactly, so
    # the unit-sublane row is legal (a (1, GW) block with array shape
    # (n_grp, GW) is rejected on real TPU; interpret mode accepts it).
    addr_f = addr_w.reshape(n_grp, 1, GROUP * WIN)
    q_f = q_w.reshape(n_grp, 1, GROUP * WIN)
    cnt_f = cnt_w.reshape(n_grp, 1, GROUP * WIN)

    rec_specs = [
        pl.BlockSpec((GROUP, WIN),
                     lambda i, p, rbg: (p[i], 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, GROUP * WIN),
                     lambda i, p, rbg: (p[i], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, GROUP * WIN),
                     lambda i, p, rbg: (p[i], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, GROUP * WIN),
                     lambda i, p, rbg: (p[i], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(palF.shape, lambda i, p, rbg: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return dict(perm=perm, rbg=rbg, addr_w=addr_w,
                addr_f=addr_f, q_f=q_f, cnt_f=cnt_f, palF=palF,
                mxu_precision=mxu_precision, n_grp=n_grp,
                s_addr=s_addr if n_blocks > 1 else None,
                s_rgba=s_rgba if n_blocks > 1 else None,
                rec_specs=rec_specs)


@functools.partial(jax.jit,
                   static_argnames=("n_bins", "color_bits", "interpret",
                                    "merge", "sort_segments", "inplace",
                                    "sort_impl"))
def accumulate_windowed_pallas(hist_planes, packed_records, palette_hi,
                               n_bins: int, color_bits: int,
                               interpret: bool = False, weight=None,
                               merge: bool = False,
                               sort_segments: int = 1,
                               inplace: bool = INPLACE_FLUSH,
                               sort_impl: str = None):
    """Key-sort + run-merge + windowed one-hot-matmul Pallas flush —
    the full 'tile-local VMEM accumulation with key-sort + segment-sum
    flushes' design named by BASELINE.json, with the segment sums on
    the MXU (TPU-native recast of the reference's radix sort + write
    kernel, cuburn/code/sort.py + iter.py write kernel, SURVEY.md §1).

    Histograms up to BLOCK_ROWS lane rows (~2 M bins) stay VMEM-resident
    for the whole flush; larger ones (1080p ss2 = 8.6 M bins) are HBM-
    resident and walked in row blocks via the prefetched block index;
    a group permutation (perm, also prefetched and consumed by the
    BlockSpec index maps — no data gather) keeps every block's visits
    contiguous.  Windows whose sparse fallback would cross a block
    boundary (at most ~2 per boundary) are diverted to an exact XLA
    side-scatter.

    `sort_segments` > 1 runs the SEGMENTED sub-sort: S independent
    contiguous sub-sorts instead of one full bitonic network (~1.5x
    fewer substages at S=16 on 2^21 records).  Windows never straddle
    segment boundaries (segment length is a multiple of GROUP*WIN) and
    each window's segment sum is order-independent, so no merge pass
    exists — the decomposition the full-network rejection in
    docs/KERNEL_DESIGN.md does NOT cover.  The trade: each segment
    spreads the same bin range over 1/S the records, so windows span
    ~S x more bins and can drop a flush tier; measure end-to-end
    (bench/segsweep.py) before changing the default.

    hist_planes: (4, rows, 128) from to_planes_layout."""
    from cuburn_tpu.ops.sort import merge_sorted_records, sort_records

    rows = hist_planes.shape[1]
    br = rows if rows <= BLOCK_ROWS else TILED_BLOCK_ROWS
    n_blocks = rows // br
    p_ = _prep_windows(packed_records, palette_hi, n_bins,
                       color_bits, merge, sort_segments,
                       br, n_blocks, sort_impl=sort_impl)
    (perm, rbg, addr_w, addr_f, q_f, cnt_f, palF, mxu_precision,
     n_grp, s_addr, s_rgba, rec_specs) = (
        p_["perm"], p_["rbg"], p_["addr_w"], p_["addr_f"],
        p_["q_f"], p_["cnt_f"], p_["palF"], p_["mxu_precision"],
        p_["n_grp"], p_["s_addr"], p_["s_rgba"],
        p_["rec_specs"])
    out_spec = pl.BlockSpec((4, br, 128),
                            lambda i, p, rbg: (0, rbg[p[i]], 0),
                            memory_space=pltpu.VMEM)
    if inplace:
        # round-4 in-place flush: the histogram itself rides in as an
        # input ALIASED to the output buffer — each row block is
        # DMA'd in once at first visit, accumulated over its
        # contiguous run of groups, and written back, replacing the
        # old separate-delta design (delta write + full hist+delta
        # read-read-write add = ~2x the HBM traffic of this).  Safe
        # because the group permutation guarantees every block is
        # visited in ONE contiguous run: the aliased buffer's block b
        # is never read after block b's write-back.
        w_arr = jnp.full((1, 1), 1.0 if weight is None else weight,
                         jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_grp,),
            in_specs=rec_specs + [
                # ANY = stays in HBM, manually DMA'd at first visit;
                # a pipelined VMEM window here would be
                # double-buffered and blow scoped VMEM (see kernel
                # docstring)
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, 1), lambda i, p, rbg: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=out_spec,
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )
        result = pl.pallas_call(
            _make_win_kernel(br, mxu_precision, inplace=True),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((4, rows, 128), jnp.float32),
            # operand index counts the 2 scalar-prefetch args first,
            # then the 7 inputs: hist_planes is operand 2+5=7
            input_output_aliases={7: 0},
            interpret=interpret,
        )(perm, rbg, addr_w, addr_f, q_f, cnt_f, palF,
          hist_planes, w_arr)
        if n_blocks > 1:
            # diverted straddle windows: exact in-place scatter-add on
            # the result (small index set; no full-histogram pass)
            sw = s_rgba if weight is None else s_rgba * weight
            result = result.reshape(4, rows * 128).at[:, s_addr].add(
                sw.T).reshape(4, rows, 128)
        return result

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_grp,),
        in_specs=rec_specs,
        out_specs=out_spec,
    )
    delta = pl.pallas_call(
        _make_win_kernel(br, mxu_precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, rows, 128), jnp.float32),
        interpret=interpret,
    )(perm, rbg, addr_w, addr_f, q_f, cnt_f, palF)

    if n_blocks > 1:
        # unvisited blocks hold uninitialized memory: mask them out
        visited = jnp.zeros((n_blocks,), jnp.int32).at[rbg].set(
            1, mode="drop")
        delta = jnp.where(
            (visited > 0)[None, :, None, None],
            delta.reshape(4, n_blocks, br, 128),
            np.float32(0.0)).reshape(4, rows, 128)
        # scatter the (at most ~GROUP*(n_blocks+1)*WIN) diverted
        # straddle updates directly into delta: a dense zeros+add
        # temporary here costs two full passes over the (up to 143 MB)
        # tiled histogram per flush
        delta = delta.reshape(4, rows * 128).at[:, s_addr].add(
            s_rgba.T).reshape(4, rows, 128)
    if weight is not None:
        delta = delta * weight
    return hist_planes + delta


@functools.partial(jax.jit,
                   static_argnames=("n_bins", "color_bits", "interpret",
                                    "sort_segments", "sort_impl"))
def accumulate_windowed_pallas_rgb16(hist_split, packed_records,
                                     palette_hi, n_bins: int,
                                     color_bits: int,
                                     interpret: bool = False,
                                     weight=None,
                                     sort_segments: int = 1,
                                     sort_impl: str = None):
    """Windowed flush over the SPLIT bf16-rgb histogram layout
    (VERDICT round-4 item 5: tiled-histogram traffic compression).

    hist_split: (dens (1, rows, 128) f32, rgb (3, rows, 128) bf16)
    from to_split_layout.  HBM stores rgb bf16 (their reload+writeback
    bytes halve — at tiled densities the flush is row-block-reload
    bound, ~the histogram's own size per flush); accumulation is STILL
    exact f32 in a VMEM scratch, with rgb rounded to bf16 only once
    per block per flush at write-back.  Density never leaves f32, so
    per-bin counts keep the bit-exactness contract.  In/out buffers
    are aliased and manually DMA'd (ANY space) — unvisited blocks keep
    their mass for free and nothing is double-buffered.

    No merge support (merged counts need the HIGHEST-precision path
    whose win profile is different; rgb16 targets the default fast
    path).  Returns the updated (dens, rgb) pair."""
    dens, rgb = hist_split
    rows = dens.shape[1]
    br = rows if rows <= BLOCK_ROWS else TILED_BLOCK_ROWS
    n_blocks = rows // br
    p_ = _prep_windows(packed_records, palette_hi, n_bins,
                       color_bits, False, sort_segments,
                       br, n_blocks, sort_impl=sort_impl)
    (perm, rbg, addr_w, addr_f, q_f, cnt_f, palF, mxu_precision,
     n_grp, s_addr, s_rgba, rec_specs) = (
        p_["perm"], p_["rbg"], p_["addr_w"], p_["addr_f"],
        p_["q_f"], p_["cnt_f"], p_["palF"], p_["mxu_precision"],
        p_["n_grp"], p_["s_addr"], p_["s_rgba"],
        p_["rec_specs"])

    w_arr = jnp.full((1, 1), 1.0 if weight is None else weight,
                     jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_grp,),
        in_specs=rec_specs + [
            pl.BlockSpec(memory_space=pltpu.ANY),   # dens (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),   # rgb16 (HBM)
            pl.BlockSpec((1, 1), lambda i, p, rbg: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # dens out
            pl.BlockSpec(memory_space=pltpu.ANY),   # rgb16 out
        ],
        scratch_shapes=[
            pltpu.VMEM((4, br, 128), jnp.float32),     # f32 acc
            pltpu.VMEM((3, br, 128), jnp.bfloat16),    # bf16 stage
            pltpu.SemaphoreType.DMA,
        ],
    )
    dens_new, rgb_new = pl.pallas_call(
        _make_win_kernel(br, mxu_precision, mode="rgb16"),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((3, rows, 128), jnp.bfloat16),
        ],
        # operands: 2 scalar-prefetch + 5 record/palette inputs, then
        # dens at 7, rgb at 8 — aliased onto outputs 0 and 1
        input_output_aliases={7: 0, 8: 1},
        interpret=interpret,
    )(perm, rbg, addr_w, addr_f, q_f, cnt_f, palF, dens, rgb, w_arr)
    if n_blocks > 1:
        # diverted straddle windows: density scatter-adds exact (f32)
        sw = s_rgba if weight is None else s_rgba * weight
        dens_new = dens_new.reshape(rows * 128).at[s_addr].add(
            sw[:, 3]).reshape(1, rows, 128)
        # rgb CANNOT use a plain bf16 .add: on real Mosaic the scatter
        # applies its (heavily duplicated) updates serially in bf16,
        # so one record's sub-ulp color increment absorbs once a bin
        # grows — measured: hot boundary bins hard-cap at EXACTLY
        # 256.0 (where color < ulp/2 = 1) and the race's worst bin had
        # lost 2/3 of its color at density 1201 while the f32 path
        # matched the scatter truth to 0.004 (bench/rgb16single.py
        # --hot; interpret mode combines in f32 and never showed it).
        # Combine per unique address in f32 first (sort + segment
        # sum over the ~sc*WIN straddle slots), then ONE rounded bf16
        # add per touched bin — restoring the one-rounding-per-flush
        # envelope the split-plane design promises.
        order = jnp.argsort(s_addr)
        sa = s_addr[order]
        sv = sw[order, :3]
        seg = jnp.cumsum(jnp.concatenate(
            [jnp.ones((1,), jnp.int32),
             (sa[1:] != sa[:-1]).astype(jnp.int32)])) - 1
        tot = jax.ops.segment_sum(sv, seg,
                                  num_segments=sa.shape[0])
        # representative flat address per segment; unused tail slots
        # point at the junk bin (their zero totals add exactly)
        uaddr = jnp.full((sa.shape[0],), n_bins,
                         jnp.int32).at[seg].set(sa)
        rgb_new = rgb_new.reshape(3, rows * 128).at[:, uaddr].add(
            tot.T.astype(jnp.bfloat16)).reshape(3, rows, 128)
    return dens_new, rgb_new


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
        # via uint32: for > 2^21 bins the packed junk record exceeds
        # 2^31 and a direct int32() raises OverflowError (NumPy 2)
        junk_rec = jnp.uint32(n_bins << color_bits).astype(jnp.int32)
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
