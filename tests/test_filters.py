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
        # ... and AGREE for gray: r=g=b=alpha makes the alpha-driven
        # gamma (vib=1) identical to per-channel gamma (vib=0)
        gray = self._px([0.6, 0.6, 0.6, 0.6])
        g1 = np.asarray(colorclip(gray, args[0], jnp.float32(1.0),
                                  *args[1:]))[0, 0]
        g0 = np.asarray(colorclip(gray, args[0], jnp.float32(0.0),
                                  *args[1:]))[0, 0]
        np.testing.assert_allclose(g1[:3], g0[:3], atol=1e-5)


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


class TestSpatialFilterFamily:
    def test_taps_properties(self):
        from cuburn_tpu.ops.filtering import (SPATIAL_FILTERS,
                                              spatial_filter_taps)
        for shape in SPATIAL_FILTERS:
            t = spatial_filter_taps(shape, 0.75, 2)
            assert t.sum() == pytest.approx(1.0, abs=1e-6), shape
            np.testing.assert_allclose(t, t[::-1], atol=1e-6,
                                       err_msg=shape)  # symmetric
            assert t.shape[0] % 2 == 0, shape          # parity of ss=2

    def test_flam3_width_rule(self):
        from cuburn_tpu.ops.filtering import spatial_filter_taps
        # fw = 2*support*ss*radius = 2*1.5*2*0.5 = 3 -> 4 (ss parity)
        assert spatial_filter_taps("gaussian", 0.5, 2).shape[0] == 4
        # box support 0.5, radius 1, ss 2: fw = 2 -> int+1 = 3 ->
        # parity-matched to 4; the adjust stretch puts the two
        # round-up padding taps at +-0.75, past the box cutoff 0.5
        t = spatial_filter_taps("box", 1.0, 2)
        np.testing.assert_allclose(t, [0.0, 0.5, 0.5, 0.0])

    def test_flam3_adjust_stretch(self):
        """flam3's `adjust` rule: tap spacing is 2*support/fw per
        accumulator px, NOT 2*support/fwidth — the rounded-up window
        must not compress the kernel.  Default gaussian (radius 0.5,
        ss 1): fw = 1.5 -> fwidth 3, taps sampled at x = (-2, 0, 2)
        where exp(-2x^2) is ~3e-4 — a near-identity kernel, not a
        visible blur."""
        from cuburn_tpu.ops.filtering import spatial_filter_taps
        t = spatial_filter_taps("gaussian", 0.5, 1)
        assert t.shape[0] == 3
        assert t[1] > 0.999
        assert t[0] == t[2] < 4e-4

    def test_unknown_shape_raises(self):
        from cuburn_tpu.ops.filtering import spatial_filter_taps
        with pytest.raises(ValueError, match="unknown spatial filter"):
            spatial_filter_taps("bogus", 0.5, 2)

    def test_downsample_shapes_differ_but_preserve_flat(self):
        from cuburn_tpu.ops.filtering import downsample
        rng = np.random.RandomState(9)
        img = jnp.asarray(rng.rand(32, 32, 4).astype(np.float32))
        a = np.asarray(downsample(img, 2, 0.6, "gaussian"))
        b = np.asarray(downsample(img, 2, 0.6, "triangle"))
        c = np.asarray(downsample(img, 2, 0.6, "mitchell"))
        assert a.shape == (16, 16, 4)
        assert not np.allclose(a, b) and not np.allclose(b, c)
        # sum-normalized kernels: a constant image stays constant
        flat = jnp.ones((32, 32, 4), jnp.float32) * 0.7
        for shape in ("gaussian", "mitchell", "lanczos3", "hermite"):
            out = np.asarray(downsample(flat, 2, 0.6, shape))
            np.testing.assert_allclose(out[2:-2, 2:-2], 0.7, rtol=1e-5)

    def test_render_with_filter_shape(self):
        """filter shape selectable from the genome end-to-end."""
        from cuburn_tpu.models import sierpinski
        from cuburn_tpu.profile import RenderProfile
        from cuburn_tpu.render import Renderer
        prof = RenderProfile(width=48, height=48, ss=2, quality=40,
                             batch=2048, iters_per_chunk=8, fuse=16,
                             hist_backend="scatter", de_enabled=False)
        g1 = sierpinski()
        img_g, _ = Renderer(g1, prof).render_frame(0.0, seed=2)
        g2 = sierpinski()
        g2.spatial_filter_shape = "triangle"
        img_t, _ = Renderer(g2, prof).render_frame(0.0, seed=2)
        assert not np.array_equal(img_g, img_t)


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

    def test_de_matches_direct_exact_on_ladder(self):
        """When every source radius sits exactly on a band-ladder rung
        (curve=0 makes r(d) == max_radius everywhere == band 0), the
        banded decomposition must equal the direct per-source splat to
        float32 precision — the quantization error vanishes."""
        rng = np.random.RandomState(5)
        img = (rng.rand(32, 32, 4) * rng.binomial(1, 0.3, (32, 32, 1))
               ).astype(np.float32)
        density = (rng.rand(32, 32) * 40 + 1).astype(np.float32)
        banded = np.asarray(de_mod.density_filter(
            jnp.asarray(img), jnp.asarray(density), jnp.float32(6.0),
            jnp.float32(0.0), jnp.float32(0.0), static_max_radius=6.0))
        direct = de_mod.density_filter_direct(
            img, density, 6.0, 0.0, 0.0)
        np.testing.assert_allclose(banded, direct, rtol=1e-4,
                                   atol=1e-5)

    def test_de_matches_direct_bounded_error(self):
        """Ground-truth differential (VERDICT round-1 item 5): banded
        DE vs the direct per-source-radius splat on a random image with
        flam3-default estimator params.  With two-rung interpolation
        (round 3) the radius-quantization error is second-order in the
        ladder spacing: measured rel L2 ~0.020 (was ~0.08 with hard
        nearest-rung assignment), asserted < 0.03."""
        rng = np.random.RandomState(6)
        img = (rng.rand(32, 32, 4) * rng.binomial(1, 0.4, (32, 32, 1))
               ).astype(np.float32)
        density = np.exp(rng.rand(32, 32) * 8).astype(np.float32)
        banded = np.asarray(de_mod.density_filter(
            jnp.asarray(img), jnp.asarray(density), jnp.float32(9.0),
            jnp.float32(0.0), jnp.float32(0.4), static_max_radius=9.0))
        direct = de_mod.density_filter_direct(
            img, density, 9.0, 0.0, 0.4)
        rel_l2 = np.linalg.norm(banded - direct) / np.linalg.norm(direct)
        assert rel_l2 < 0.03, f"banded-vs-direct rel L2 {rel_l2:.3f}"
        # mass agrees too (edge clipping affects both identically
        # to within the radius interpolation)
        assert banded.sum() == pytest.approx(direct.sum(), rel=0.02)

    def test_pyramid_de_bounded_error(self, monkeypatch):
        """Round-5 pyramid DE: wide bands run at octave-downsampled
        resolution on binding-size frames (de.PYRAMID_MIN_WIDTH).
        Forced on here (width gate dropped to 0), the same
        banded-vs-direct harness must stay within the documented
        rel-L2 bound, preserve mass, and the width gate must keep
        sub-threshold frames bit-identical to the non-pyramid path."""
        monkeypatch.setattr(de_mod, "PYRAMID_MIN_WIDTH", 0)
        rng = np.random.RandomState(6)
        img = (rng.rand(32, 32, 4) * rng.binomial(1, 0.4, (32, 32, 1))
               ).astype(np.float32)
        density = np.exp(rng.rand(32, 32) * 8).astype(np.float32)
        args = (jnp.asarray(img), jnp.asarray(density),
                jnp.float32(9.0), jnp.float32(0.0), jnp.float32(0.4))
        pyr = np.asarray(de_mod.density_filter(
            *args, static_max_radius=9.0))
        direct = de_mod.density_filter_direct(
            img, density, 9.0, 0.0, 0.4)
        rel_l2 = np.linalg.norm(pyr - direct) / np.linalg.norm(direct)
        assert rel_l2 < 0.035, f"pyramid-vs-direct rel L2 {rel_l2:.3f}"
        assert pyr.sum() == pytest.approx(direct.sum(), rel=0.02)
        # skip_empty composes with the pyramid path unchanged
        pyr_skip = np.asarray(de_mod.density_filter(
            *args, static_max_radius=9.0, skip_empty=True))
        np.testing.assert_allclose(pyr, pyr_skip, rtol=1e-5, atol=1e-6)
        # gate restored: sub-threshold frames take the exact path
        monkeypatch.setattr(de_mod, "PYRAMID_MIN_WIDTH", 2048)
        exact = np.asarray(de_mod.density_filter(
            *args, static_max_radius=9.0))
        monkeypatch.setattr(de_mod, "PYRAMID_DE", False)
        off = np.asarray(de_mod.density_filter(
            *args, static_max_radius=9.0))
        np.testing.assert_array_equal(exact, off)

    def test_de_skip_empty_identical(self):
        """skip_empty=True (lax.cond per band on occupancy) must be a
        pure perf knob: outputs identical to the unconditional path."""
        rng = np.random.RandomState(7)
        img = (rng.rand(24, 24, 4) * rng.binomial(1, 0.4, (24, 24, 1))
               ).astype(np.float32)
        # constant high density: most bands empty -> conds actually
        # take the zero branch
        density = np.full((24, 24), 1e5, np.float32)
        args = (jnp.asarray(img), jnp.asarray(density),
                jnp.float32(9.0), jnp.float32(0.0), jnp.float32(0.4))
        a = np.asarray(de_mod.density_filter(
            *args, static_max_radius=9.0))
        b = np.asarray(de_mod.density_filter(
            *args, static_max_radius=9.0, skip_empty=True))
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7)

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


class TestGutterEdgeFidelity:
    """Frame-edge pixels must read REAL gutter context through the
    filtered decimation (flam3 sizes its gutter to include the filter
    half-width): a uniform field stays uniform to the border."""

    def test_downsample_uniform_stays_uniform_at_edges(self):
        from cuburn_tpu.ops.filtering import (downsample,
                                              spatial_filter_taps)
        for ss in (1, 2):
            pad = (spatial_filter_taps("gaussian", 0.5, ss).shape[0]
                   - ss) // 2
            g = pad
            img = jnp.ones((32 * ss + 2 * g, 32 * ss + 2 * g, 4))
            out = np.asarray(downsample(img, ss, 0.5, "gaussian",
                                        gutter=g))
            assert out.shape == (32, 32, 4)
            np.testing.assert_allclose(out, 1.0, rtol=1e-5,
                                       err_msg=f"ss={ss}")

    def test_downsample_zero_gutter_still_works(self):
        # shortfall (gutter < pad) zero-pads — the legacy behavior
        from cuburn_tpu.ops.filtering import downsample
        img = jnp.ones((64, 64, 4))
        out = np.asarray(downsample(img, 2, 0.5, "gaussian", gutter=0))
        assert out.shape == (32, 32, 4)
        # interior exact, edges darker (documented zero-pad fallback)
        np.testing.assert_allclose(out[2:-2, 2:-2], 1.0, rtol=1e-5)
        assert out[0, 0, 0] < 1.0

    def test_renderer_gutter_includes_filter_pad(self):
        from cuburn_tpu.models import sierpinski
        from cuburn_tpu.profile import RenderProfile
        from cuburn_tpu.render import Renderer
        prof = RenderProfile(width=64, height=64, quality=10,
                             batch=1024, iters_per_chunk=4, fuse=8,
                             hist_backend="scatter", de_enabled=False)
        r = Renderer(sierpinski(), prof)
        assert r.cam.gutter >= 1      # filter pad at ss=1, 0.5 gaussian


class TestColorPipelineAnchor:
    """Differential anchor for the tonemap/color math: a SECOND,
    independently transcribed implementation of flam3's logscale /
    calc_alpha / calc_newrgb / vibrancy pipeline (tests/reference_impl)
    must agree with ops/filtering.py on random inputs — transcription
    typos in either copy surface here."""

    def _random_hist(self, seed, n=4096):
        rng = np.random.RandomState(seed)
        d = np.exp(rng.uniform(-3, 8, n))            # heavy-tailed density
        d[rng.rand(n) < 0.2] = 0.0                   # empty bins
        c = rng.uniform(0, 1, (n, 3)) * d[:, None]   # premultiplied
        return np.concatenate([c, d[:, None]], 1).astype(np.float32)

    def test_logscale_matches(self):
        from cuburn_tpu.ops.filtering import logscale
        from tests.reference_impl import logscale_reference
        h = self._random_hist(1)
        ours = np.asarray(logscale(jnp.asarray(h), jnp.float32(4.0),
                                   jnp.float32(50.0)))
        ref = logscale_reference(h, 4.0, 50.0)
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("hp,vib,transparent", [
        (2.0, 1.0, False), (-1.0, 1.0, False), (2.0, 0.6, False),
        (-0.5, 0.8, True), (0.0, 1.0, False),
        (2.0, 0.0, False), (-1.0, 0.0, True)])  # pure per-channel gamma
    def test_colorclip_matches(self, hp, vib, transparent):
        from cuburn_tpu.ops.filtering import colorclip, logscale
        from tests.reference_impl import (colorclip_reference,
                                          logscale_reference)
        h = self._random_hist(7)
        img = logscale_reference(h, 4.0, 30.0)
        bg = (0.05, 0.0, 0.1)
        ours = np.asarray(colorclip(
            jnp.asarray(img, jnp.float32), jnp.float32(4.0),
            jnp.float32(vib), jnp.float32(hp), jnp.float32(0.01),
            jnp.asarray(bg, jnp.float32), transparent))
        ref = colorclip_reference(img, 4.0, vib, hp, 0.01, bg,
                                  transparent)
        # f32 vs f64 and HSV branch rounding: compare to 1e-3
        np.testing.assert_allclose(ours, ref.astype(np.float32),
                                   rtol=2e-3, atol=2e-3)


class TestSpatialFilterTapAnchor:
    """Second transcription of flam3's filter-row construction
    (fwidth = int(fw)+1 for fw = 2*support*ss*radius, parity matched
    to ss, samples at cell centers stretched by flam3's
    adjust = support*fwidth/fw so tap SPACING is 2*support/fw per px,
    sum-normalized) — anchors the fiddly width/parity/adjust rule
    independently.  (The original pair of transcriptions both omitted
    `adjust` — every kernel was compressed into [-support, support]
    and over-blurred; caught by review, fixed together.)"""

    @pytest.mark.parametrize("shape,support", [
        ("gaussian", 1.5), ("triangle", 1.0), ("mitchell", 2.0),
        ("box", 0.5), ("hermite", 1.0)])
    @pytest.mark.parametrize("ss", [1, 2, 3])
    def test_width_parity_and_samples(self, shape, support, ss):
        from cuburn_tpu.ops.filtering import (SPATIAL_FILTERS,
                                              spatial_filter_taps)
        radius = 0.6
        taps = spatial_filter_taps(shape, radius, ss)
        # independent width computation
        fw_cont = 2.0 * support * ss * radius
        fw = int(fw_cont) + 1
        if (fw ^ ss) & 1:
            fw += 1
        fw = max(fw, ss)
        assert taps.shape[0] == fw
        # independent sampling: cell centers of a window spanning fw
        # px, in kernel coordinates at 2*support/fw_cont per px
        _sup, fn = SPATIAL_FILTERS[shape]
        centers_px = np.arange(fw) + 0.5 - fw / 2.0
        x = centers_px * (2.0 * support / fw_cont)
        want = fn(np.abs(x))
        want = want / want.sum()
        np.testing.assert_allclose(taps, want, rtol=1e-6)
        assert taps.sum() == pytest.approx(1.0)
        # symmetric
        np.testing.assert_allclose(taps, taps[::-1], rtol=1e-6)


def test_de_matches_direct_with_minimum_radius():
    """Banded DE vs the direct splat with estimator_minimum > 0 (the
    min clamps the ladder's sharp end; previously only min=0 was
    differenced)."""
    from cuburn_tpu.ops import de as de_mod
    rng = np.random.RandomState(3)
    H = W = 24
    img = (rng.rand(H, W, 4) * (rng.rand(H, W, 1) < 0.3)) \
        .astype(np.float32)
    dens = (np.exp(rng.uniform(-1, 5, (H, W)))
            * (img[..., 3] > 0)).astype(np.float32)
    img[..., 3] = dens
    direct = de_mod.density_filter_direct(img, dens, 6.0, 2.0, 0.4)
    banded = np.asarray(de_mod.density_filter(
        jnp.asarray(img), jnp.asarray(dens), jnp.float32(6.0),
        jnp.float32(2.0), jnp.float32(0.4), static_max_radius=6.0))
    rel = np.linalg.norm(banded - direct) \
        / (np.linalg.norm(direct) + 1e-9)
    assert rel < 0.1, rel
