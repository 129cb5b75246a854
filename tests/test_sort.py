"""Tests: roll-based bitonic sort + run merge (ops/sort.py) — the
key-sort + segment-sum flush (cuburn's radix sort + write kernel
contract, validated the way its sortbench did: against numpy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuburn_tpu.ops.sort import (bitonic_sort_u32, merge_sorted_records,
                                 sort_records)


class TestBitonic:
    @pytest.mark.parametrize("n", [2, 8, 64, 1024, 4096])
    def test_matches_numpy(self, n):
        rng = np.random.RandomState(n)
        keys = rng.randint(0, 2**32, n, dtype=np.uint32)
        out = np.asarray(bitonic_sort_u32(jnp.asarray(keys)))
        np.testing.assert_array_equal(out, np.sort(keys))

    def test_high_bit_unsigned(self):
        """Values above 2^31 must sort as unsigned."""
        keys = np.array([0xFFFFFFFF, 0, 0x80000000, 1], np.uint32)
        out = np.asarray(bitonic_sort_u32(jnp.asarray(keys)))
        np.testing.assert_array_equal(
            out, [0, 1, 0x80000000, 0xFFFFFFFF])

    def test_duplicates_and_sorted_inputs(self):
        keys = np.array([5, 5, 5, 5, 1, 1, 9, 9], np.uint32)
        out = np.asarray(bitonic_sort_u32(jnp.asarray(keys)))
        np.testing.assert_array_equal(out, np.sort(keys))
        asc = np.arange(16, dtype=np.uint32)
        np.testing.assert_array_equal(
            np.asarray(bitonic_sort_u32(jnp.asarray(asc))), asc)
        np.testing.assert_array_equal(
            np.asarray(bitonic_sort_u32(jnp.asarray(asc[::-1].copy()))),
            asc)

    def test_pad_to_pow2(self):
        keys = np.array([7, 3, 9], np.uint32)
        out = np.asarray(sort_records(jnp.asarray(keys)))
        np.testing.assert_array_equal(out[:3], [3, 7, 9])
        assert (out[3:] == 0xFFFFFFFF).all()

    @pytest.mark.parametrize("shape", [(4, 256), (16, 64), (2, 2)])
    def test_rows_sorted_independently(self, shape):
        """(S, L) form: every row ascending, rows independent — the
        segmented sub-sort primitive."""
        rng = np.random.RandomState(shape[0])
        keys = rng.randint(0, 2**32, shape, dtype=np.uint32)
        out = np.asarray(bitonic_sort_u32(jnp.asarray(keys)))
        np.testing.assert_array_equal(out, np.sort(keys, axis=1))

    @pytest.mark.parametrize("segs", [2, 8])
    def test_segmented_sort_records(self, segs):
        rng = np.random.RandomState(segs)
        keys = rng.randint(0, 2**32, 1000, dtype=np.uint32)  # pads
        out = np.asarray(sort_records(jnp.asarray(keys),
                                      segments=segs))
        assert out.shape[0] == 1024
        for row in out.reshape(segs, -1):
            np.testing.assert_array_equal(row, np.sort(row))
        # same multiset (plus sentinels)
        np.testing.assert_array_equal(
            np.sort(out)[:1000], np.sort(keys))
        assert (np.sort(out)[1000:] == 0xFFFFFFFF).all()

    @pytest.mark.parametrize("segs", [1, 4])
    def test_lax_impl_identical(self, segs):
        """impl="lax" (jax.lax.sort) must be BIT-IDENTICAL to the
        bitonic network for any segments — the tune record flips the
        impl freely (chip-drift races, ops/sort.py), which is only
        sound because the outputs are the same array."""
        rng = np.random.RandomState(7 + segs)
        keys = rng.randint(0, 2**32, 3000, dtype=np.uint32)  # pads
        a = np.asarray(sort_records(jnp.asarray(keys), segments=segs))
        b = np.asarray(sort_records(jnp.asarray(keys), segments=segs,
                                    impl="lax"))
        np.testing.assert_array_equal(a, b)

    def test_impl_env_and_setter(self, monkeypatch):
        """Resolution order: env CUBURN_SORT_IMPL > explicit impl arg
        > set_sort_impl > default; unknown names rejected."""
        from cuburn_tpu.ops.sort import (_resolve_impl, set_sort_impl)
        set_sort_impl(None)      # another test's Renderer may have
        monkeypatch.delenv("CUBURN_SORT_IMPL", raising=False)  # set it
        assert _resolve_impl(None) == "bitonic"
        set_sort_impl("lax")
        try:
            assert _resolve_impl(None) == "lax"
            assert _resolve_impl("bitonic") == "bitonic"
            monkeypatch.setenv("CUBURN_SORT_IMPL", "bitonic")
            assert _resolve_impl("lax") == "bitonic"
        finally:
            set_sort_impl(None)
        monkeypatch.delenv("CUBURN_SORT_IMPL", raising=False)
        with pytest.raises(ValueError):
            set_sort_impl("quantum")
        with pytest.raises(ValueError):
            _resolve_impl("quantum")


class TestTiledBitonic:
    def test_matches_numpy(self):
        """VMEM-local fused bitonic phases (ops/pallas_sort.py): the
        tile-local passes must compose with the XLA global substages
        into a correct full sort, including high-bit (sign-flip) keys
        spanning multiple tiles."""
        from cuburn_tpu.ops.pallas_sort import (TILE,
                                                bitonic_sort_u32_tiled)
        rng = np.random.RandomState(2)
        n = 4 * TILE
        keys = rng.randint(0, 2**32, n, dtype=np.uint32)
        keys[:100] = 0xFFFFFFFF
        keys[100:200] = 0
        out = np.asarray(bitonic_sort_u32_tiled(
            jnp.asarray(keys), interpret=True))
        np.testing.assert_array_equal(out, np.sort(keys))

    def test_small_falls_back(self):
        from cuburn_tpu.ops.pallas_sort import bitonic_sort_u32_tiled
        keys = np.array([9, 3, 7, 1], np.uint32)
        out = np.asarray(bitonic_sort_u32_tiled(jnp.asarray(keys),
                                                interpret=True))
        np.testing.assert_array_equal(out, [1, 3, 7, 9])


class TestMerge:
    def test_counts_match_numpy_unique(self):
        rng = np.random.RandomState(0)
        keys = np.sort(rng.randint(0, 50, 256).astype(np.uint32))
        uniq, counts = merge_sorted_records(
            jnp.asarray(keys), jnp.uint32(0xFFFFFFFF))
        nu, nc = np.unique(keys, return_counts=True)
        u = np.asarray(uniq)
        c = np.asarray(counts)
        k = len(nu)
        np.testing.assert_array_equal(u[:k], nu)
        np.testing.assert_array_equal(c[:k], nc)
        assert (c[k:] == 0).all()
        assert (u[k:] == 0xFFFFFFFF).all()

    def test_mass_conserved(self):
        rng = np.random.RandomState(1)
        keys = np.sort(rng.randint(0, 9, 128).astype(np.uint32))
        _, counts = merge_sorted_records(jnp.asarray(keys),
                                         jnp.uint32(0xFFFFFFFF))
        assert int(np.asarray(counts).sum()) == 128


class TestMergedPallasFlush:
    def test_matches_plain_pallas(self):
        from cuburn_tpu.ops import histogram as hm
        from cuburn_tpu.ops import pallas_hist as ph
        from cuburn_tpu.ops.camera import CameraSpec
        from cuburn_tpu.ops.iterate import expand_palette, pack_records
        rng = np.random.RandomState(2)
        n_bins, cbits = 1000, 10
        cam = CameraSpec(50, 20, 1)
        M = 3000
        # skewed: hot pixels with repeated colors (the dedup case)
        hot = rng.randint(0, n_bins, 8)
        mix = rng.rand(M) < 0.5
        addr = np.where(mix, hot[rng.randint(0, 8, M)],
                        rng.randint(0, n_bins, M)).astype(np.int32)
        color = np.where(mix, 0.25, rng.rand(M)).astype(np.float32)
        palette = jnp.asarray(rng.rand(256, 3).astype(np.float32))
        pal_hi = expand_palette(palette, cbits)
        packed = pack_records(cbits, jnp.asarray(addr),
                              jnp.asarray(color))
        hp = ph.to_packed_layout(hm.alloc(n_bins))
        a = ph.accumulate_packed_pallas(hp, packed, pal_hi, n_bins,
                                        cbits, interpret=True)
        b = ph.accumulate_merged_pallas(hp, packed, pal_hi, n_bins,
                                        cbits, interpret=True)
        ga = np.asarray(ph.from_packed_layout(a, n_bins))[:n_bins]
        gb = np.asarray(ph.from_packed_layout(b, n_bins))[:n_bins]
        np.testing.assert_allclose(gb, ga, rtol=1e-5, atol=1e-4)

    def _scatter_reference(self, n_bins, cbits, addr, color, palette):
        """Ground truth: XLA scatter-add of the same packed records."""
        from cuburn_tpu.ops import histogram as hm
        from cuburn_tpu.ops.camera import CameraSpec
        from cuburn_tpu.ops.iterate import (expand_palette, pack_records,
                                            unpack_records)
        cam = CameraSpec(25, 20, 1)
        pal_hi = expand_palette(palette, cbits)
        packed = pack_records(cbits, jnp.asarray(addr),
                              jnp.asarray(color))
        a, rgba = unpack_records(cbits, pal_hi, packed)
        ref = hm.alloc(n_bins).at[a].add(rgba)
        return packed, pal_hi, np.asarray(ref)

    @pytest.mark.parametrize("merge", [False, True])
    @pytest.mark.parametrize("dist", ["dense", "mid", "sparse",
                                      "mixed"])
    def test_windowed_matches_scatter(self, dist, merge,
                                      sort_segments=1):
        """accumulate_windowed_pallas must reproduce scatter exactly
        across all three flush tiers: 'dense' the single window matmul
        (clustered addresses), 'mid' the 8-chunk path (window spans in
        the hundreds of bins), 'sparse' the per-record roll fallback
        (spans >= 1024 bins), 'mixed' everything plus junk records and
        a non-pow2 count."""
        from cuburn_tpu.ops import histogram as hm
        from cuburn_tpu.ops import pallas_hist as ph
        # deterministic across processes (hash() is salted per run)
        import zlib
        rng = np.random.RandomState(zlib.crc32(dist.encode()))
        n_bins, cbits = 4000, 10
        M = 3000   # non-power-of-two
        if dist == "dense":
            addr = (rng.randint(0, 20, M) +
                    rng.choice([0, 256, 1024], M)).astype(np.int32)
        elif dist == "mid":
            addr = rng.randint(0, n_bins, M).astype(np.int32)
        elif dist == "sparse":
            n_bins = 60000   # ~window spans >> 1024 bins
            addr = rng.randint(0, n_bins, M).astype(np.int32)
        else:
            addr = np.where(rng.rand(M) < 0.5,
                            rng.randint(0, n_bins, M),
                            rng.randint(0, 16, M)).astype(np.int32)
            addr[:7] = n_bins   # explicit junk records
        color = rng.rand(M).astype(np.float32)
        palette = jnp.asarray(rng.rand(256, 3).astype(np.float32))
        packed, pal_hi, ref = self._scatter_reference(
            n_bins, cbits, addr, color, palette)
        hp = ph.to_planes_layout(hm.alloc(n_bins))
        out = ph.accumulate_windowed_pallas(
            hp, packed, pal_hi, n_bins, cbits, interpret=True,
            merge=merge, sort_segments=sort_segments)
        got = np.asarray(ph.from_planes_layout(out, n_bins))
        # density channel counts integers -> exact in any add order
        np.testing.assert_array_equal(got[:n_bins, 3], ref[:n_bins, 3])
        np.testing.assert_allclose(got[:n_bins], ref[:n_bins],
                                   rtol=1e-5, atol=1e-5)
        # total mass conserved, nothing beyond the junk bin
        assert np.asarray(out).reshape(4, -1)[3].sum() \
            == pytest.approx(M)

    @pytest.mark.parametrize("segs", [2, 4, 16])
    @pytest.mark.parametrize("dist", ["dense", "mixed"])
    def test_windowed_segmented_matches_scatter(self, dist, segs):
        """The segmented sub-sort (S independent sub-sorts per flush,
        no merge — ops/pallas_hist.py sort_segments) must stay exactly
        scatter-equivalent: windows never straddle segment boundaries
        and each window's segment sum is order-independent."""
        self.test_windowed_matches_scatter(dist, merge=False,
                                           sort_segments=segs)

    def test_planes_rows_two_level_tiling(self):
        """VMEM-resident histograms (≤ BLOCK_ROWS lane rows) keep
        sublane padding only; HBM-tiled ones pad to whole
        TILED_BLOCK_ROWS blocks (the smaller tiled block is what
        frees scoped VMEM for 2^23-record flushes — BASELINE.md)."""
        from cuburn_tpu.ops import pallas_hist as ph
        assert ph.TILED_BLOCK_ROWS <= ph.BLOCK_ROWS
        # resident: 8-padded, NOT block-padded
        assert ph.planes_rows(1000 * 128 - 1) == 1000
        assert ph.planes_rows(ph.BLOCK_ROWS * 128 - 1) == ph.BLOCK_ROWS
        # one row past the threshold: tiled, padded to tile multiples
        r = ph.planes_rows(ph.BLOCK_ROWS * 128 + 1)
        assert r % ph.TILED_BLOCK_ROWS == 0 and r > ph.BLOCK_ROWS

    def test_windowed_tiled_odd_boundary_straddle(self):
        """Straddle diversion at an ODD tiled-block boundary (one that
        is NOT a multiple of the old single BLOCK_ROWS constant):
        windows crossing TILED_BLOCK_ROWS*128 must divert exactly."""
        from cuburn_tpu.ops import histogram as hm
        from cuburn_tpu.ops import pallas_hist as ph
        rng = np.random.RandomState(29)
        n_bins = ph.BLOCK_ROWS * 128 + ph.TILED_BLOCK_ROWS * 128 - 77
        cbits = 10
        M = 1200
        bdry = ph.TILED_BLOCK_ROWS * 128   # odd boundary when < BLOCK
        addr = np.concatenate([
            rng.randint(0, n_bins, M - 400),
            rng.randint(bdry - 30, bdry + 30, 300),   # straddle it
            np.full(100, n_bins),                     # junk
        ]).astype(np.int32)
        color = rng.rand(M).astype(np.float32)
        palette = jnp.asarray(rng.rand(256, 3).astype(np.float32))
        packed, pal_hi, ref = self._scatter_reference(
            n_bins, cbits, addr, color, palette)
        hp = ph.to_planes_layout(hm.alloc(n_bins))
        assert hp.shape[1] % ph.TILED_BLOCK_ROWS == 0
        out = ph.accumulate_windowed_pallas(
            hp, packed, pal_hi, n_bins, cbits, interpret=True)
        got = np.asarray(ph.from_planes_layout(out, n_bins))
        np.testing.assert_array_equal(got[:n_bins, 3], ref[:n_bins, 3])
        np.testing.assert_allclose(got[:n_bins], ref[:n_bins],
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("segs", [1, 4])
    def test_windowed_hbm_tiled_multi_block(self, segs):
        """Histograms larger than one VMEM block (> BLOCK_ROWS lane
        rows) flush through the row-block-tiled path: the prefetched
        block index walks sorted windows block by block, boundary-
        straddling windows divert to the side scatter.  Must still be
        exactly scatter-equivalent, including across block boundaries
        and in blocks that receive no records.  With a segmented sort
        (segs > 1) each segment walks every block, so the group
        permutation must keep block visits contiguous or the
        first-visit zeroing erases earlier segments' mass."""
        from cuburn_tpu.ops import histogram as hm
        from cuburn_tpu.ops import pallas_hist as ph
        rng = np.random.RandomState(13)
        n_bins = 3 * ph.BLOCK_ROWS * 128 - 500   # 3 row blocks
        cbits = 10
        M = 2000
        bdry = ph.BLOCK_ROWS * 128
        addr = np.concatenate([
            rng.randint(0, n_bins, M - 600),          # all blocks
            rng.randint(bdry - 40, bdry + 40, 200),   # straddle bdry 1
            rng.randint(2 * bdry - 40, 2 * bdry + 40, 200),
            np.full(200, n_bins),                     # junk records
        ]).astype(np.int32)
        color = rng.rand(M).astype(np.float32)
        palette = jnp.asarray(rng.rand(256, 3).astype(np.float32))
        packed, pal_hi, ref = self._scatter_reference(
            n_bins, cbits, addr, color, palette)
        hp = ph.to_planes_layout(hm.alloc(n_bins))
        assert hp.shape[1] == 3 * ph.BLOCK_ROWS
        out = ph.accumulate_windowed_pallas(
            hp, packed, pal_hi, n_bins, cbits, interpret=True,
            sort_segments=segs)
        got = np.asarray(ph.from_planes_layout(out, n_bins))
        np.testing.assert_array_equal(got[:n_bins, 3], ref[:n_bins, 3])
        np.testing.assert_allclose(got[:n_bins], ref[:n_bins],
                                   rtol=1e-5, atol=1e-5)
        assert np.asarray(out).reshape(4, -1)[3].sum() \
            == pytest.approx(M)

    @pytest.mark.parametrize("segs", [1, 8])
    def test_windowed_hbm_tiled_boundary_saturation(self, segs):
        """Adversarial: thousands of records packed tightly around
        EVERY row-block boundary (max pressure on the side-scatter's
        fixed diversion capacity — which must scale with the segment
        count: every sorted segment crosses every boundary) plus empty
        blocks — still exactly scatter-equivalent."""
        from cuburn_tpu.ops import histogram as hm
        from cuburn_tpu.ops import pallas_hist as ph
        rng = np.random.RandomState(17)
        n_bins = 4 * ph.BLOCK_ROWS * 128 - 100   # 4 row blocks
        cbits = 10
        bdry = ph.BLOCK_ROWS * 128
        addr = np.concatenate([
            rng.randint(b - 3, b + 3, 1200)      # dense straddles
            for b in (bdry, 2 * bdry, 3 * bdry)
        ] + [rng.randint(0, 40, 500)]).astype(np.int32)
        color = rng.rand(addr.shape[0]).astype(np.float32)
        palette = jnp.asarray(rng.rand(256, 3).astype(np.float32))
        packed, pal_hi, ref = self._scatter_reference(
            n_bins, cbits, addr, color, palette)
        hp = ph.to_planes_layout(hm.alloc(n_bins))
        out = ph.accumulate_windowed_pallas(
            hp, packed, pal_hi, n_bins, cbits, interpret=True,
            sort_segments=segs)
        got = np.asarray(ph.from_planes_layout(out, n_bins))
        np.testing.assert_array_equal(got[:n_bins, 3], ref[:n_bins, 3])
        np.testing.assert_allclose(got[:n_bins], ref[:n_bins],
                                   rtol=1e-5, atol=1e-5)
        assert np.asarray(out).reshape(4, -1)[3].sum() \
            == pytest.approx(addr.shape[0])

    @pytest.mark.parametrize("weight", [None, 0.25])
    def test_windowed_inplace_matches_delta_path(self, weight):
        """Round-4 in-place flush (histogram aliased into the kernel,
        first-visit copy-in, weight applied to each window's f32
        segment-sum output) must agree with the old separate-delta
        path — bit-exactly on the density channel at weight=None
        (integer adds in either order), and to f32 rounding with a
        temporal weight — INCLUDING from a non-zero starting histogram
        (the new behavior: old path never saw hist inside the
        kernel)."""
        from cuburn_tpu.ops import histogram as hm
        from cuburn_tpu.ops import pallas_hist as ph
        rng = np.random.RandomState(41)
        n_bins, cbits = 5000, 10
        addr = rng.randint(0, n_bins, 2048).astype(np.int32)
        color = rng.rand(2048).astype(np.float32)
        palette = jnp.asarray(rng.rand(256, 3).astype(np.float32))
        packed, pal_hi, _ = self._scatter_reference(
            n_bins, cbits, addr, color, palette)
        # non-zero start: a prior flush's mass must survive exactly.
        # Density is integer-valued in the real pipeline (counts), so
        # integer + integer adds agree bit-exactly in EITHER order;
        # rgb starts are arbitrary f32, where the two add orders
        # (records-onto-hist vs hist-plus-delta) legitimately differ
        # by f32 rounding ulps.
        start = rng.rand(n_bins + 1, 4).astype(np.float32)
        start[:, 3] = rng.randint(0, 1000, n_bins + 1)
        hp = ph.to_planes_layout(jnp.asarray(start))
        w = None if weight is None else jnp.float32(weight)
        new = ph.accumulate_windowed_pallas(
            hp, packed, pal_hi, n_bins, cbits, interpret=True,
            weight=w, inplace=True)
        old = ph.accumulate_windowed_pallas(
            hp, packed, pal_hi, n_bins, cbits, interpret=True,
            weight=w, inplace=False)
        a = np.asarray(ph.from_planes_layout(new, n_bins))
        b = np.asarray(ph.from_planes_layout(old, n_bins))
        if weight is None:
            np.testing.assert_array_equal(a[:, 3], b[:, 3])
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    def test_windowed_inplace_tiled_nonzero_start(self):
        """In-place flush over multiple HBM row blocks from a non-zero
        histogram: unvisited blocks must keep their prior mass (the
        aliased buffer is simply never touched there), visited blocks
        must add exactly, straddle diversions included."""
        from cuburn_tpu.ops import histogram as hm
        from cuburn_tpu.ops import pallas_hist as ph
        rng = np.random.RandomState(43)
        n_bins = 3 * ph.BLOCK_ROWS * 128 - 500
        cbits = 10
        bdry = ph.BLOCK_ROWS * 128
        # records in blocks 0 and 2 only (block 1 unvisited except
        # straddles), plus boundary straddles
        addr = np.concatenate([
            rng.randint(0, 3000, 700),
            rng.randint(2 * bdry + 100, n_bins, 700),
            rng.randint(bdry - 20, bdry + 20, 100),
        ]).astype(np.int32)
        color = rng.rand(addr.shape[0]).astype(np.float32)
        palette = jnp.asarray(rng.rand(256, 3).astype(np.float32))
        packed, pal_hi, ref = self._scatter_reference(
            n_bins, cbits, addr, color, palette)
        base = rng.rand(n_bins + 1, 4).astype(np.float32)
        hp = ph.to_planes_layout(jnp.asarray(base))
        out = ph.accumulate_windowed_pallas(
            hp, packed, pal_hi, n_bins, cbits, interpret=True,
            inplace=True)
        got = np.asarray(ph.from_planes_layout(out, n_bins))
        want = base[:n_bins] + ref[:n_bins]
        np.testing.assert_allclose(got[:n_bins], want,
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("dist", ["dense", "sparse", "mixed"])
    def test_windowed_rgb16_matches_f32(self, dist):
        """Split bf16-rgb flush (tiled traffic compression): density
        must stay BIT-EXACT vs the f32 path (it never leaves f32);
        rgb agrees within one bf16 rounding of the running value."""
        from cuburn_tpu.ops import pallas_hist as ph
        rng = np.random.RandomState(47)
        n_bins, cbits = 6000, 10
        n = 3000
        if dist == "dense":
            addr = rng.randint(0, 128, n).astype(np.int32)
        elif dist == "sparse":
            addr = rng.randint(0, n_bins, n).astype(np.int32)
        else:
            addr = np.concatenate([
                rng.randint(0, 64, n // 2),
                rng.randint(0, n_bins, n // 2)]).astype(np.int32)
        color = rng.rand(n).astype(np.float32)
        palette = jnp.asarray(rng.rand(256, 3).astype(np.float32))
        packed, pal_hi, _ = self._scatter_reference(
            n_bins, cbits, addr, color, palette)
        start = rng.rand(n_bins + 1, 4).astype(np.float32)
        start[:, 3] = rng.randint(0, 1000, n_bins + 1)
        hp = ph.to_planes_layout(jnp.asarray(start))
        split = ph.to_split_layout(jnp.asarray(start))
        f32 = ph.accumulate_windowed_pallas(
            hp, packed, pal_hi, n_bins, cbits, interpret=True,
            inplace=True)
        d16, r16 = ph.accumulate_windowed_pallas_rgb16(
            split, packed, pal_hi, n_bins, cbits, interpret=True)
        a = np.asarray(ph.from_split_layout(d16, r16, n_bins))
        b = np.asarray(ph.from_planes_layout(f32, n_bins))
        np.testing.assert_array_equal(a[:, 3], b[:, 3])
        # rgb: starting values rounded to bf16 once + one write-back
        # round — tolerance is a couple of bf16 ulps of the magnitude
        scale = np.maximum(np.abs(b[:, :3]), 1.0)
        np.testing.assert_allclose(a[:, :3], b[:, :3],
                                   atol=float((scale * 2 ** -7).max()))

    def test_windowed_rgb16_tiled_nonzero_start(self):
        """rgb16 over multiple HBM row blocks: unvisited blocks keep
        their mass (aliased, never touched), visited blocks add with
        density exact; straddle diversions included."""
        from cuburn_tpu.ops import pallas_hist as ph
        rng = np.random.RandomState(53)
        n_bins = 3 * ph.BLOCK_ROWS * 128 - 500
        cbits = 10
        bdry = ph.BLOCK_ROWS * 128
        addr = np.concatenate([
            rng.randint(0, 3000, 700),
            rng.randint(2 * bdry + 100, n_bins, 700),
            rng.randint(bdry - 20, bdry + 20, 100),
        ]).astype(np.int32)
        color = rng.rand(addr.shape[0]).astype(np.float32)
        palette = jnp.asarray(rng.rand(256, 3).astype(np.float32))
        packed, pal_hi, ref = self._scatter_reference(
            n_bins, cbits, addr, color, palette)
        base = rng.rand(n_bins + 1, 4).astype(np.float32)
        base[:, 3] = rng.randint(0, 1000, n_bins + 1)
        split = ph.to_split_layout(jnp.asarray(base))
        base16 = np.asarray(ph.from_split_layout(*split, n_bins))
        d16, r16 = ph.accumulate_windowed_pallas_rgb16(
            split, packed, pal_hi, n_bins, cbits, interpret=True)
        got = np.asarray(ph.from_split_layout(d16, r16, n_bins))
        want = base16[:n_bins] + ref[:n_bins]
        np.testing.assert_array_equal(got[:n_bins, 3], want[:, 3])
        scale = np.maximum(np.abs(want[:, :3]), 1.0)
        np.testing.assert_allclose(got[:n_bins, :3], want[:, :3],
                                   atol=float((scale * 2 ** -7).max()))

    def test_windowed_weight_scales(self):
        from cuburn_tpu.ops import histogram as hm
        from cuburn_tpu.ops import pallas_hist as ph
        rng = np.random.RandomState(3)
        n_bins, cbits = 1000, 10
        addr = rng.randint(0, n_bins, 512).astype(np.int32)
        color = rng.rand(512).astype(np.float32)
        palette = jnp.asarray(rng.rand(256, 3).astype(np.float32))
        packed, pal_hi, _ = self._scatter_reference(
            n_bins, cbits, addr, color, palette)
        hp = ph.to_planes_layout(hm.alloc(n_bins))
        a = ph.accumulate_windowed_pallas(hp, packed, pal_hi, n_bins,
                                          cbits, interpret=True)
        b = ph.accumulate_windowed_pallas(hp, packed, pal_hi, n_bins,
                                          cbits, interpret=True,
                                          weight=jnp.float32(0.5))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a) * 0.5,
                                   rtol=1e-6)

    def test_planes_layout_roundtrip(self):
        from cuburn_tpu.ops import pallas_hist as ph
        rng = np.random.RandomState(4)
        h = rng.rand(777 + 1, 4).astype(np.float32)
        back = np.asarray(ph.from_planes_layout(
            ph.to_planes_layout(jnp.asarray(h)), 777))
        np.testing.assert_array_equal(back, h)

    def test_sentinel_padding_adds_no_mass(self):
        """sort_records pads non-power-of-two record counts with
        0xFFFFFFFF sentinels; the merged flush must drop them entirely
        — every unit of density in the WHOLE packed buffer (real bins,
        junk bin, and layout padding rows) must come from a real
        record.  Regression for the round-1 advisor finding (sentinel
        mass written out of range)."""
        from cuburn_tpu.ops import histogram as hm
        from cuburn_tpu.ops import pallas_hist as ph
        from cuburn_tpu.ops.camera import CameraSpec
        from cuburn_tpu.ops.iterate import expand_palette, pack_records
        rng = np.random.RandomState(7)
        n_bins, cbits = 500, 10
        cam = CameraSpec(25, 20, 1)
        M = 1000   # NOT a power of two: 24 sentinels after padding
        addr = rng.randint(0, n_bins, M).astype(np.int32)
        color = rng.rand(M).astype(np.float32)
        palette = jnp.asarray(rng.rand(256, 3).astype(np.float32))
        pal_hi = expand_palette(palette, cbits)
        packed = pack_records(cbits, jnp.asarray(addr),
                              jnp.asarray(color))
        hp = ph.to_packed_layout(hm.alloc(n_bins))
        out = ph.accumulate_merged_pallas(hp, packed, pal_hi, n_bins,
                                          cbits, interpret=True)
        flat = np.asarray(out).reshape(-1, 4)
        # density channel: exactly one unit per real record, nowhere else
        assert flat[:, 3].sum() == pytest.approx(M)
        assert (flat[n_bins + 1:] == 0).all()   # padding rows untouched


def test_merge_rejects_segments():
    """merge=True needs a globally sorted stream: per-segment runs
    break window-local monotonicity after compaction and mass would
    silently vanish — the combination must raise, not corrupt."""
    from cuburn_tpu.ops import histogram as hm
    from cuburn_tpu.ops import pallas_hist as ph
    hp = ph.to_planes_layout(hm.alloc(4096))
    recs = jnp.zeros((ph.GROUP * 128 * 4,), jnp.uint32)
    pal = jnp.ones((256, 3), jnp.float32)
    from cuburn_tpu.ops.iterate import expand_palette
    with pytest.raises(ValueError, match="sort_segments == 1"):
        ph.accumulate_windowed_pallas(
            hp, recs, expand_palette(pal, 10), 4096, 10,
            interpret=True, merge=True, sort_segments=4)
