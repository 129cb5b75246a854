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
        packed = pack_records(cam, cbits, jnp.asarray(addr),
                              jnp.asarray(color))
        hp = ph.to_packed_layout(hm.alloc(n_bins))
        a = ph.accumulate_packed_pallas(hp, packed, pal_hi, n_bins,
                                        cbits, interpret=True)
        b = ph.accumulate_merged_pallas(hp, packed, pal_hi, n_bins,
                                        cbits, interpret=True)
        ga = np.asarray(ph.from_packed_layout(a, n_bins))[:n_bins]
        gb = np.asarray(ph.from_packed_layout(b, n_bins))[:n_bins]
        np.testing.assert_allclose(gb, ga, rtol=1e-5, atol=1e-4)

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
        packed = pack_records(cam, cbits, jnp.asarray(addr),
                              jnp.asarray(color))
        hp = ph.to_packed_layout(hm.alloc(n_bins))
        out = ph.accumulate_merged_pallas(hp, packed, pal_hi, n_bins,
                                          cbits, interpret=True)
        flat = np.asarray(out).reshape(-1, 4)
        # density channel: exactly one unit per real record, nowhere else
        assert flat[:, 3].sum() == pytest.approx(M)
        assert (flat[n_bins + 1:] == 0).all()   # padding rows untouched
