"""Unit tests for the tonemap/color pipeline (ops/filtering.py, ops/de.py)
against flam3's functional forms (SURVEY.md §1 steps 3-6)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuburn_tpu.ops import de as de_mod
from cuburn_tpu.ops.filtering import (_calc_alpha, _hsv_to_rgb,
                                      _rgb_to_hsv, colorclip,
                                      downsample, logscale, to_u8)


class TestLogscale:
    def test_formula(self):
        """scale = k1 * log1p(d * k2) / d (flam3 rect.c)."""
        hist = jnp.asarray(np.array(
            [[[1.0, 0.5, 0.25, 2.0]]], np.float32))
        brightness, q = 4.0, 10.0
        out = np.asarray(logscale(hist, jnp.float32(brightness),
                                  jnp.float32(q)))
        k1 = brightness * 268.0 / 256.0
        ls = k1 * np.log1p(2.0 / q) / 2.0
        np.testing.assert_allclose(out[0, 0],
                                   np.array([1, 0.5, 0.25, 2]) * ls,
                                   rtol=1e-5)

    def test_zero_density_zero_output(self):
        hist = jnp.zeros((2, 2, 4), jnp.float32)
        out = np.asarray(logscale(hist, jnp.float32(4.0),
                                  jnp.float32(5.0)))
        assert np.abs(out).max() == 0.0

    def test_monotone_compressive(self):
        """Brighter cells gain less per sample: d -> d*ls(d) is
        monotone increasing but concave (log tonemap)."""
        d = np.linspace(0.1, 100, 50).astype(np.float32)
        hist = jnp.stack([jnp.zeros_like(jnp.asarray(d))] * 3 +
                         [jnp.asarray(d)], axis=-1)[None]
        out = np.asarray(logscale(hist, jnp.float32(4.0),
                                  jnp.float32(10.0)))[0, :, 3]
        assert (np.diff(out) > 0).all()
        gain = out / d
        assert (np.diff(gain) < 0).all()


class TestCalcAlpha:
    def test_power_curve_above_threshold(self):
        d = jnp.asarray(np.array([0.5, 1.0, 2.0], np.float32))
        a = np.asarray(_calc_alpha(d, jnp.float32(0.25),
                                   jnp.float32(0.1)))
        np.testing.assert_allclose(a, np.array([0.5, 1.0, 2.0]) ** 0.25,
                                   rtol=1e-5)

    def test_linear_segment_below_threshold(self):
        """flam3's linear-below-gamma_threshold segment: continuous at
        the threshold and ~linear near zero."""
        thr = 0.1
        inv_g = 0.25
        d = jnp.asarray(np.array([1e-4, thr * 0.999, thr * 1.001],
                                 np.float32))
        a = np.asarray(_calc_alpha(d, jnp.float32(inv_g),
                                   jnp.float32(thr)))
        # continuity at threshold
        assert a[1] == pytest.approx(a[2], rel=1e-2)
        # flam3's blend: (1-frac)*d*(thr^g/thr) + frac*d^g, frac=d/thr
        dv = 1e-4
        frac = dv / thr
        expect = (1 - frac) * dv * (thr ** inv_g / thr) \
            + frac * dv ** inv_g
        assert a[0] == pytest.approx(expect, rel=0.02)

    def test_zero_is_zero(self):
        a = np.asarray(_calc_alpha(jnp.zeros(3, jnp.float32),
                                   jnp.float32(0.25), jnp.float32(0.1)))
        assert np.abs(a).max() == 0.0


class TestHsv:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        rgb = jnp.asarray(rng.rand(50, 3).astype(np.float32))
        back = np.asarray(_hsv_to_rgb(_rgb_to_hsv(rgb)))
        np.testing.assert_allclose(back, np.asarray(rgb), atol=1e-5)


class TestColorclip:
    def _px(self, rgba):
        return jnp.asarray(np.array(rgba, np.float32)[None, None])

    def test_output_clamped(self):
        img = self._px([5.0, 0.1, 0.0, 3.0])
        out = np.asarray(colorclip(
            img, jnp.float32(4.0), jnp.float32(1.0), jnp.float32(-1.0),
            jnp.float32(0.01), jnp.zeros(3, jnp.float32), False))
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_background_blend(self):
        img = self._px([0.0, 0.0, 0.0, 0.0])   # empty pixel
        bg = jnp.asarray(np.array([0.2, 0.4, 0.6], np.float32))
        out = np.asarray(colorclip(
            img, jnp.float32(4.0), jnp.float32(1.0), jnp.float32(-1.0),
            jnp.float32(0.01), bg, False))[0, 0]
        np.testing.assert_allclose(out[:3], [0.2, 0.4, 0.6], atol=1e-5)
        assert out[3] == 1.0

    def test_transparent_alpha(self):
        img = self._px([0.0, 0.0, 0.0, 0.0])
        out = np.asarray(colorclip(
            img, jnp.float32(4.0), jnp.float32(1.0), jnp.float32(-1.0),
            jnp.float32(0.01), jnp.zeros(3, jnp.float32), True))[0, 0]
        assert out[3] == 0.0

    def test_vibrancy_extremes(self):
        """vib=1: alpha-driven gamma; vib=0: per-channel gamma — they
        must differ for saturated pixels and agree for gray."""
        img = self._px([0.8, 0.1, 0.1, 0.8])
        args = (jnp.float32(4.0), jnp.float32(-1.0), jnp.float32(0.01),
                jnp.zeros(3, jnp.float32), False)
        v1 = np.asarray(colorclip(img, args[0], jnp.float32(1.0),
                                  *args[1:]))[0, 0]
        v0 = np.asarray(colorclip(img, args[0], jnp.float32(0.0),
                                  *args[1:]))[0, 0]
        assert not np.allclose(v1[:3], v0[:3], atol=1e-3)


class TestDownsample:
    def test_block_average(self):
        img = jnp.asarray(np.arange(16, dtype=np.float32)
                          .reshape(4, 4, 1))
        out = np.asarray(downsample(img, 2))
        np.testing.assert_allclose(
            out[..., 0], [[2.5, 4.5], [10.5, 12.5]])

    def test_ss1_identity(self):
        img = jnp.asarray(np.random.rand(3, 5, 4).astype(np.float32))
        assert downsample(img, 1) is img


class TestDE:
    def test_mass_conservation_interior(self):
        """The banded DE blur must conserve energy away from the image
        border.  (At the border, blurred mass clips — flam3 avoids this
        with a gutter margin; noted in PARITY.md known gaps.)"""
        rng = np.random.RandomState(0)
        img = np.zeros((96, 96, 4), np.float32)
        img[24:72, 24:72] = rng.rand(48, 48, 4).astype(np.float32)
        density = (rng.rand(96, 96) * 50).astype(np.float32)
        out = de_mod.density_filter(
            jnp.asarray(img), jnp.asarray(density), jnp.float32(9.0),
            jnp.float32(0.0), jnp.float32(0.4), static_max_radius=9.0)
        np.testing.assert_allclose(float(out.sum()), float(img.sum()),
                                   rtol=1e-3)

    def test_dense_pixels_stay_sharp(self):
        """High-density isolated pixel barely blurs; low-density one
        spreads wide (the whole point of adaptive DE)."""
        img = np.zeros((65, 65, 4), np.float32)
        img[32, 32] = 1.0
        density_hi = np.full((65, 65), 1e4, np.float32)
        density_lo = np.ones((65, 65), np.float32)
        out_hi = np.asarray(de_mod.density_filter(
            jnp.asarray(img), jnp.asarray(density_hi), jnp.float32(9.0),
            jnp.float32(0.0), jnp.float32(0.4), static_max_radius=9.0))
        out_lo = np.asarray(de_mod.density_filter(
            jnp.asarray(img), jnp.asarray(density_lo), jnp.float32(9.0),
            jnp.float32(0.0), jnp.float32(0.4), static_max_radius=9.0))
        assert out_hi[32, 32, 3] > 0.5          # sharp
        assert out_lo[32, 32, 3] < 0.1          # spread out
        assert out_lo[36, 32, 3] > 0.0          # energy moved outward

    def test_radius_formula(self):
        d = jnp.asarray(np.array([1.0, 16.0, 1e6], np.float32))
        r = np.asarray(de_mod.radius_for_density(
            d, jnp.float32(9.0), jnp.float32(0.5), jnp.float32(0.5)))
        assert r[0] == pytest.approx(9.0)
        assert r[1] == pytest.approx(9.0 / 4.0)
        assert r[2] == pytest.approx(0.5)       # clamped to minimum


class TestSpatialFilter:
    def test_gaussian_reduction_smooths(self):
        """flam3 `filter`: Gaussian pre-blur before ss decimation."""
        img = np.zeros((8, 8, 4), np.float32)
        img[4, 4] = 16.0
        box = np.asarray(downsample(jnp.asarray(img), 2, 0.0))
        gauss = np.asarray(downsample(jnp.asarray(img), 2, 0.5))
        # box: all mass in one output pixel; gauss: spread to neighbors
        assert (box > 0).sum() == 4        # one px, 4 channels
        assert (gauss > 0).sum() > 4
        np.testing.assert_allclose(gauss.sum(), box.sum(), rtol=1e-3)

    def test_flam3_filter_attr_parsed(self):
        from cuburn_tpu.genome import convert
        [g] = convert.parse_flam3(
            '<flame size="10 10" filter="0.8">'
            '<xform coefs="1 0 0 1 0 0" linear="1"/></flame>')
        assert g.spatial_filter(0) == 0.8
        xml = convert.genome_to_flame_xml(g)
        [g2] = convert.parse_flam3(xml)
        assert g2.spatial_filter(0) == 0.8
