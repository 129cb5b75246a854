"""First-principles invariants for the filter/color stack.

Structural answer to the round-3 `adjust`-stretch lesson: the ops code
and the independent NumPy anchor were transcribed by the same author
and shared an omission, so differential tests were blind to it.  Every
assertion here is derived DIRECTLY from the flam3 paper's definitions
(logscale tonemap, gamma with linear segment, vibrancy blend, spatial
filter decimation, per-source-radius density estimation) — mathematical
properties any faithful implementation must satisfy, with no shared
code or derivation with either transcription.  A failure here is a real
bug even when ops and anchor agree.

[cuburn/code/filtering.py, flam3 rect.c/filters.c published semantics]
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cuburn_tpu.ops.filtering import (SPATIAL_FILTERS, _calc_alpha,
                                      colorclip, downsample, logscale,
                                      spatial_filter_taps)
from cuburn_tpu.ops import de as de_mod

ALL_SHAPES = sorted(SPATIAL_FILTERS)
# kernels that are non-negative everywhere on their support BY
# DEFINITION (catrom/mitchell/lanczos have negative lobes by design)
NONNEG_SHAPES = ["gaussian", "box", "triangle", "hermite", "bell",
                 "quadratic", "b_spline", "hamming", "hanning",
                 "blackman"]
RADII = [0.3, 0.5, 0.75, 1.0, 1.6]
SS = [1, 2, 4]


def _taps_or_none(shape, r, ss):
    """Tiny radii can be degenerate BY SPEC: the adjust stretch can
    push every sample of a narrow-support kernel (box at radius 0.3,
    ss 2) outside the support — flam3 errors out there too.  The
    implementation must either return a valid row or raise the
    documented ValueError; silence or NaNs are the bug."""
    try:
        return spatial_filter_taps(shape, r, ss)
    except ValueError as e:
        assert "degenerate" in str(e)
        return None


# ---------------------------------------------------------------------------
# spatial filter row construction
# ---------------------------------------------------------------------------

class TestSpatialFilterRow:
    def test_taps_sum_to_one(self):
        """The filter is a weighted average of accumulator cells: rows
        must be exactly sum-normalized or every pixel's brightness
        scales by the row sum."""
        for shape in ALL_SHAPES:
            for r in RADII:
                for ss in SS:
                    t = _taps_or_none(shape, r, ss)
                    if t is None:
                        continue
                    assert abs(float(t.sum()) - 1.0) < 1e-6, \
                        (shape, r, ss)

    def test_taps_symmetric(self):
        """All flam3 kernels are even functions sampled at cell centers
        symmetric about the window midpoint: the row must be an exact
        palindrome (any asymmetry shifts the image)."""
        for shape in ALL_SHAPES:
            for r in RADII:
                for ss in SS:
                    t = _taps_or_none(shape, r, ss)
                    if t is None:
                        continue
                    t = np.asarray(t)
                    np.testing.assert_allclose(
                        t, t[::-1], rtol=0, atol=1e-7,
                        err_msg=f"{shape} r={r} ss={ss}")

    def test_width_parity_matches_ss(self):
        """flam3 rounds the window up with parity matched to ss so
        output-pixel centers align with window centers; width below ss
        would skip accumulator cells in the decimation."""
        for shape in ALL_SHAPES:
            for r in RADII:
                for ss in SS:
                    t = _taps_or_none(shape, r, ss)
                    if t is None:
                        continue
                    n = t.shape[0]
                    assert n >= ss and (n - ss) % 2 == 0, \
                        (shape, r, ss, n)

    def test_nonnegative_kernels_stay_nonnegative(self):
        for shape in NONNEG_SHAPES:
            for r in RADII:
                for ss in SS:
                    t = _taps_or_none(shape, r, ss)
                    if t is None:
                        continue
                    t = np.asarray(t)
                    assert t.min() >= -1e-9, (shape, r, ss, t.min())

    def test_wider_radius_spreads_mass(self):
        """Monotone support: a larger filter radius must not
        concentrate MORE mass in the center tap (the kernel dilates)."""
        for shape in ["gaussian", "triangle", "b_spline"]:
            prev = None
            for r in [0.5, 1.0, 2.0]:
                t = np.asarray(spatial_filter_taps(shape, r, 2))
                peak = t.max()
                if prev is not None:
                    assert peak <= prev + 1e-9, (shape, r)
                prev = peak


class TestDownsample:
    def test_constant_field_is_preserved(self):
        """Any normalized linear decimation maps a constant field to
        the same constant — independent of kernel shape, stride
        handling, and the adjust stretch (would have caught a
        normalization or indexing bug directly)."""
        for shape in ALL_SHAPES:
            for ss in SS:
                img = jnp.full((24 * ss, 16 * ss, 3), 0.7,
                               jnp.float32)
                out = np.asarray(downsample(
                    img, ss, spatial_filter=0.8, filter_shape=shape))
                # edge pixels read the zero-padded gutter shortfall by
                # documented design (the Renderer supplies real gutter)
                # — the invariant holds on the interior
                m = 4
                np.testing.assert_allclose(
                    out[m:-m, m:-m], 0.7, rtol=0, atol=2e-5,
                    err_msg=f"{shape} ss={ss}")

    def test_box_path_preserves_mean(self):
        """The unfiltered path is a plain ss x ss average: the output
        mean equals the input mean exactly (up to f32 summation)."""
        rng = np.random.RandomState(0)
        for ss in SS:
            img = jnp.asarray(rng.rand(16 * ss, 12 * ss, 4),
                              jnp.float32)
            out = downsample(img, ss, spatial_filter=0.0)
            assert abs(float(out.mean()) - float(img.mean())) < 1e-5

    def test_translation_equivariance_at_stride(self):
        """Decimation at stride ss commutes with an ss-pixel shift of
        the accumulator: out(shift(img, ss))[y] == out(img)[y+1] on
        interior rows.  Catches any off-center window placement (the
        class of bug the adjust stretch belonged to)."""
        rng = np.random.RandomState(1)
        for shape in ["gaussian", "catrom"]:
            for ss in [2, 3]:
                base = rng.rand(30 * ss, 8 * ss, 2).astype(np.float32)
                out1 = np.asarray(downsample(
                    jnp.asarray(base[:-ss]), ss, 0.9, shape))
                out2 = np.asarray(downsample(
                    jnp.asarray(base[ss:]), ss, 0.9, shape))
                # margin: edge rows see zero-padding, not shifted data
                m = 4
                np.testing.assert_allclose(
                    out2[m:-m - 1], out1[m + 1:-m], rtol=2e-4,
                    atol=2e-5, err_msg=f"{shape} ss={ss}")


# ---------------------------------------------------------------------------
# gamma curve (flam3_calc_alpha): power law with linear toe
# ---------------------------------------------------------------------------

GAMMAS = [1.0, 2.2, 4.0]
THRESHOLDS = [0.005, 0.01, 0.1]


class TestCalcAlpha:
    def test_zero_density_is_zero(self):
        for g in GAMMAS:
            for L in THRESHOLDS:
                a = float(_calc_alpha(jnp.float32(0.0),
                                      jnp.float32(1.0 / g),
                                      jnp.float32(L)))
                assert a == 0.0

    def test_pure_power_law_above_threshold(self):
        """For d >= gamma_threshold the curve IS d^(1/gamma) — no
        blending, by definition."""
        for g in GAMMAS:
            for L in THRESHOLDS:
                d = np.linspace(L * 1.01, 2.0, 64, dtype=np.float32)
                a = np.asarray(_calc_alpha(
                    jnp.asarray(d), jnp.float32(1.0 / g),
                    jnp.float32(L)))
                np.testing.assert_allclose(a, d ** (1.0 / g),
                                           rtol=2e-5)

    def test_continuity_at_threshold(self):
        """The linear toe must meet the power curve AT the threshold
        (a jump would band every smooth gradient crossing it).  A
        discontinuity shows as a spike in the finite differences of a
        grid crossing L, far above the curve's own max slope
        (1/gamma) * d^(1/gamma - 1) on the window."""
        for g in GAMMAS:
            for L in THRESHOLDS:
                d = np.linspace(0.8 * L, 1.2 * L, 401,
                                dtype=np.float32)
                a = np.asarray(_calc_alpha(
                    jnp.asarray(d), jnp.float32(1.0 / g),
                    jnp.float32(L)))
                slope_max = (1.0 / g) * (0.8 * L) ** (1.0 / g - 1.0)
                step = float(d[1] - d[0])
                assert np.abs(np.diff(a)).max() <= \
                    3.0 * slope_max * step + 1e-6, (g, L)

    def test_monotone_in_density(self):
        """More energy must never darken a pixel: alpha is
        non-decreasing in density for any gamma >= 1."""
        for g in GAMMAS:
            for L in THRESHOLDS:
                d = np.linspace(0.0, 2.0, 512, dtype=np.float32)
                a = np.asarray(_calc_alpha(
                    jnp.asarray(d), jnp.float32(1.0 / g),
                    jnp.float32(L)))
                assert (np.diff(a) >= -1e-6).all(), (g, L)

    def test_gamma_one_is_identity(self):
        """gamma == 1: both the toe and the power curve reduce to
        alpha == d exactly (the blend is a convex combination of two
        identical functions)."""
        d = np.linspace(0.0, 1.5, 256, dtype=np.float32)
        a = np.asarray(_calc_alpha(jnp.asarray(d), jnp.float32(1.0),
                                   jnp.float32(0.01)))
        np.testing.assert_allclose(a, d, rtol=1e-5, atol=1e-7)

    def test_toe_is_subexponent_of_power_curve(self):
        """Below the threshold the blended toe must sit BELOW the pure
        power curve for gamma > 1 (the linear segment exists to darken
        the noisy low-density tail, never to brighten it)."""
        for g in [2.2, 4.0]:
            L = 0.05
            d = np.linspace(L * 1e-3, L * 0.999, 128,
                            dtype=np.float32)
            a = np.asarray(_calc_alpha(
                jnp.asarray(d), jnp.float32(1.0 / g), jnp.float32(L)))
            assert (a <= d ** (1.0 / g) + 1e-6).all(), g


# ---------------------------------------------------------------------------
# logscale tonemap
# ---------------------------------------------------------------------------

class TestLogscale:
    def _hist(self, d):
        d = np.asarray(d, np.float32)
        rgb = np.stack([0.3 * d, 0.5 * d, 0.2 * d], -1)
        return jnp.asarray(np.concatenate([rgb, d[..., None]], -1))

    def test_linear_in_brightness(self):
        h = self._hist(np.linspace(0.1, 50.0, 32))
        lo = np.asarray(logscale(h, jnp.float32(1.0),
                                 jnp.float32(10.0)))
        hi = np.asarray(logscale(h, jnp.float32(3.5),
                                 jnp.float32(10.0)))
        np.testing.assert_allclose(hi, 3.5 * lo, rtol=1e-5)

    def test_sample_count_invariance(self):
        """Doubling plotted samples AND quality together must give the
        IDENTICAL tonemapped image: ls = k1*log1p(d/q)/d, so
        (d, q) -> (s*d, s*q) leaves d*ls unchanged.  This is why a
        render's look doesn't depend on how many chunks fed it."""
        d = np.linspace(0.5, 80.0, 64)
        for s in [2.0, 8.0]:
            a = np.asarray(logscale(self._hist(d), jnp.float32(2.0),
                                    jnp.float32(25.0)))
            b = np.asarray(logscale(self._hist(d * s),
                                    jnp.float32(2.0),
                                    jnp.float32(25.0 * s)))
            np.testing.assert_allclose(b, a, rtol=1e-4)

    def test_compressive_and_monotone(self):
        """log1p tonemap: output density rises with input density but
        with non-increasing gain (that is the point of a log map)."""
        d = np.linspace(0.25, 200.0, 1024)
        out = np.asarray(logscale(self._hist(d), jnp.float32(1.0),
                                  jnp.float32(10.0)))[..., 3]
        assert (np.diff(out) > 0).all()           # monotone
        gain = out / d
        assert (np.diff(gain) <= 1e-7).all()      # compressive

    def test_low_density_limit_is_linear(self):
        """As d -> 0, log1p(d*k2)/d -> k2: the tonemap is linear with
        slope k1*k2 at the bottom (no log singularity)."""
        k1, q = 1.5, 40.0
        d = np.asarray([1e-4, 1e-3], np.float32)
        out = np.asarray(logscale(self._hist(d), jnp.float32(k1),
                                  jnp.float32(q)))[..., 3]
        np.testing.assert_allclose(out, k1 * (268.0 / 256.0) * d / q,
                                   rtol=1e-3)


# ---------------------------------------------------------------------------
# colorclip: vibrancy / highlight endpoints
# ---------------------------------------------------------------------------

def _px(rgb, d):
    """One premultiplied log-scaled pixel (1,1,4)."""
    return jnp.asarray(np.asarray(rgb + [d], np.float32)[None, None])


BLACK = jnp.zeros(3, jnp.float32)


class TestColorclipEndpoints:
    def test_vibrancy_zero_is_per_channel_gamma(self):
        """vibrancy == 0: every channel takes its OWN gamma,
        out = pow(rgb, 1/gamma) (+ background against alpha) — from
        the definition of the vibrancy blend."""
        g = 2.5
        rgb = [0.3, 0.18, 0.04]
        out = np.asarray(colorclip(
            _px(rgb, 0.4), jnp.float32(g), jnp.float32(0.0),
            jnp.float32(1.0), jnp.float32(0.01), BLACK))[0, 0]
        np.testing.assert_allclose(
            out[:3], np.asarray(rgb) ** (1.0 / g), rtol=1e-5)

    def test_vibrancy_one_is_alpha_driven(self):
        """vibrancy == 1: all channels share the ALPHA-driven scale
        alpha(d)/d — hue ratios survive exactly (that is vibrancy's
        definition: saturate by gamma-ing density, not channels)."""
        g, d = 2.5, 0.4
        rgb = np.asarray([0.3, 0.18, 0.04])
        out = np.asarray(colorclip(
            _px(list(rgb), d), jnp.float32(g), jnp.float32(1.0),
            jnp.float32(1.0), jnp.float32(0.01), BLACK))[0, 0]
        alpha = d ** (1.0 / g)
        np.testing.assert_allclose(out[:3], rgb * alpha / d,
                                   rtol=1e-5)
        # hue ratios preserved
        np.testing.assert_allclose(out[0] / out[1], rgb[0] / rgb[1],
                                   rtol=1e-5)

    def test_vibrancy_blend_is_linear(self):
        """Interior (unclipped, below-white) pixels: out(v) is the
        exact convex combination v*out(1) + (1-v)*out(0)."""
        g, d = 2.0, 0.5
        rgb = [0.25, 0.1, 0.3]
        args = (jnp.float32(g), None, jnp.float32(1.0),
                jnp.float32(0.01), BLACK)

        def run(v):
            return np.asarray(colorclip(
                _px(rgb, d), args[0], jnp.float32(v), *args[2:]
            ))[0, 0, :3]

        v = 0.35
        np.testing.assert_allclose(
            run(v), v * run(1.0) + (1 - v) * run(0.0), rtol=1e-5)

    def test_highlight_power_inert_below_white(self):
        """highlight_power only defines behavior for would-be
        superwhite pixels (max channel * scale > 1); below that the
        output must not depend on it at all."""
        outs = [np.asarray(colorclip(
            _px([0.2, 0.1, 0.05], 0.3), jnp.float32(2.0),
            jnp.float32(1.0), jnp.float32(hp), jnp.float32(0.01),
            BLACK)) for hp in (-1.0, 0.0, 2.0)]
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-7)
        np.testing.assert_allclose(outs[1], outs[2], atol=1e-7)

    def test_transparent_composites_to_opaque(self):
        """Un-premultiplied output composited over the background by
        hand must equal the opaque render: out_rgb*a + (1-a)*bg ==
        opaque_rgb (the compositing identity that DEFINES transparent
        output)."""
        bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
        px = _px([0.2, 0.12, 0.06], 0.35)
        common = (jnp.float32(2.2), jnp.float32(0.8),
                  jnp.float32(1.0), jnp.float32(0.01), bg)
        opaque = np.asarray(colorclip(px, *common))[0, 0]
        trans = np.asarray(colorclip(px, *common,
                                     transparent=True))[0, 0]
        a = trans[3]
        np.testing.assert_allclose(trans[:3] * a + (1 - a) * np.asarray(bg),
                                   opaque[:3], rtol=1e-5, atol=1e-6)

    def test_zero_pixel_is_background(self):
        bg = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)
        out = np.asarray(colorclip(
            _px([0.0, 0.0, 0.0], 0.0), jnp.float32(2.0),
            jnp.float32(0.5), jnp.float32(1.0), jnp.float32(0.01),
            bg))[0, 0]
        np.testing.assert_allclose(out[:3], np.asarray(bg), atol=1e-6)

    def test_output_bounded(self):
        """Whatever the parameters, output channels land in [0,1]."""
        rng = np.random.RandomState(7)
        img = jnp.asarray(rng.rand(8, 8, 4).astype(np.float32) * 3.0)
        for hp, v in [(-1.0, 0.3), (0.0, 1.0), (3.0, 0.0)]:
            out = np.asarray(colorclip(
                img, jnp.float32(1.5), jnp.float32(v),
                jnp.float32(hp), jnp.float32(0.02), BLACK))
            assert out.min() >= 0.0 and out.max() <= 1.0


# ---------------------------------------------------------------------------
# density estimation: per-source-radius Gaussian splat
# ---------------------------------------------------------------------------

class TestDensityEstimation:
    def test_radius_law(self):
        """r(d) = clamp(max_r / d^curve, min_r, max_r): decreasing in
        density, clamped at both ends, and curve == 0 pins r == max_r
        for every density."""
        d = jnp.asarray(np.linspace(1.0, 1e4, 256, dtype=np.float32))
        r = np.asarray(de_mod.radius_for_density(
            d, jnp.float32(9.0), jnp.float32(0.5), jnp.float32(0.6)))
        assert (np.diff(r) <= 1e-6).all()
        assert r.max() <= 9.0 + 1e-6 and r.min() >= 0.5 - 1e-6
        r0 = np.asarray(de_mod.radius_for_density(
            d, jnp.float32(9.0), jnp.float32(0.5), jnp.float32(0.0)))
        np.testing.assert_allclose(r0, 9.0, rtol=1e-6)

    def test_mass_conservation(self):
        """Each source cell splats through a NORMALIZED kernel: total
        energy is exactly preserved when no kernel support crosses the
        image edge (blur redistributes, never creates or destroys)."""
        rng = np.random.RandomState(3)
        H = W = 96
        img = np.zeros((H, W, 4), np.float32)
        core = rng.rand(32, 32, 4).astype(np.float32)
        img[32:64, 32:64] = core
        dens = np.zeros((H, W), np.float32)
        dens[32:64, 32:64] = (rng.rand(32, 32) * 50).astype(np.float32)
        out = np.asarray(de_mod.density_filter(
            jnp.asarray(img), jnp.asarray(dens), jnp.float32(9.0),
            jnp.float32(0.0), jnp.float32(0.4),
            static_max_radius=9.0))
        np.testing.assert_allclose(out.sum(axis=(0, 1)),
                                   img.sum(axis=(0, 1)), rtol=1e-4)

    def test_high_density_near_identity(self):
        """Dense regions must stay SHARP: at huge density the radius
        clamps to its minimum and the blur degenerates to (near)
        identity — the defining asymmetry of adaptive DE."""
        rng = np.random.RandomState(4)
        img = rng.rand(48, 48, 4).astype(np.float32)
        dens = np.full((48, 48), 1e6, np.float32)
        out = np.asarray(de_mod.density_filter(
            jnp.asarray(img), jnp.asarray(dens), jnp.float32(9.0),
            jnp.float32(0.0), jnp.float32(0.5),
            static_max_radius=9.0))
        np.testing.assert_allclose(out, img, atol=6e-3)

    def test_sparse_spreads_more_than_dense(self):
        """The SAME unit of energy spreads wider from a low-density
        cell than from a high-density cell: peak height of the blurred
        impulse must be strictly lower at d=1 than at d=1e6."""
        img = np.zeros((64, 64, 4), np.float32)
        img[32, 32] = 1.0

        def peak(d):
            dens = np.zeros((64, 64), np.float32)
            dens[32, 32] = d
            out = np.asarray(de_mod.density_filter(
                jnp.asarray(img), jnp.asarray(dens), jnp.float32(9.0),
                jnp.float32(0.0), jnp.float32(0.5),
                static_max_radius=9.0))
            return out[..., 3].max(), out[..., 3].sum()

        p_sparse, m_sparse = peak(1.0)
        p_dense, m_dense = peak(1e6)
        assert p_sparse < 0.25 * p_dense, (p_sparse, p_dense)
        np.testing.assert_allclose(m_sparse, 1.0, rtol=1e-4)
        np.testing.assert_allclose(m_dense, 1.0, rtol=1e-4)

    def test_skip_empty_is_exact(self):
        """The occupancy-gated variant is an optimization, not an
        approximation: same output on a mixed-band image to f32
        rounding (XLA fuses the two programs differently, so allow
        ~1 ulp; any REAL skipped mass would be off by whole band
        weights, orders of magnitude above this)."""
        rng = np.random.RandomState(5)
        img = rng.rand(40, 40, 4).astype(np.float32)
        dens = (rng.rand(40, 40) * 100).astype(np.float32)
        args = (jnp.asarray(img), jnp.asarray(dens), jnp.float32(7.0),
                jnp.float32(0.0), jnp.float32(0.6))
        a = np.asarray(de_mod.density_filter(
            *args, static_max_radius=7.0))
        b = np.asarray(de_mod.density_filter(
            *args, static_max_radius=7.0, skip_empty=True))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# earlyclip: flam3's pre-2008 pipeline order (colorclip per supersample
# bucket BEFORE the spatial filter, then clip — rect.c earlyclip block)
# ---------------------------------------------------------------------------

class TestEarlyclipOrder:
    """Pins the earlyclip ordering the same way the rest of the color
    stack is pinned (round-5 verdict item 5): by mathematical
    consequences of the published definition, with no flam3 binary
    output needed."""

    BLACK = jnp.zeros((3,), jnp.float32)

    def _both_orders(self, img, gamma, vib, ss, sf, shape):
        args = (jnp.float32(gamma), jnp.float32(vib),
                jnp.float32(1.0), jnp.float32(0.0), self.BLACK)
        early = jnp.clip(
            downsample(colorclip(img, *args), ss, sf, shape), 0.0, 1.0)
        late = colorclip(downsample(img, ss, sf, shape), *args)
        return np.asarray(early), np.asarray(late)

    def test_earlyclip_equals_lateclip_when_colorclip_linear(self):
        """gamma == 1, threshold == 0, vibrancy == 1, black
        background, every channel and density <= 1: colorclip is then
        the identity on rgb (alpha = d^(1/1) = d, scale =
        vib*alpha/d = 1, below-white so highlight inert, vibrancy
        term vanishes, compose against black adds nothing), so it
        commutes with the downsample convolution and the two orders
        MUST agree — from the definitions alone."""
        rng = np.random.RandomState(11)
        img = rng.rand(32, 32, 4).astype(np.float32) * 0.8
        img[..., :3] = np.minimum(img[..., :3],
                                  img[..., 3:4])  # premultiplied
        img = jnp.asarray(img)
        for ss, sf, shape in [(2, 0.5, "gaussian"), (1, 0.0, "box"),
                              (2, 0.6, "mitchell")]:
            early, late = self._both_orders(img, 1.0, 1.0, ss, sf,
                                            shape)
            np.testing.assert_allclose(early[..., :3], late[..., :3],
                                       atol=2e-6, err_msg=shape)

    def test_earlyclip_differs_when_gamma_bends(self):
        """gamma != 1 makes colorclip nonlinear, so filtering before
        vs after it must NOT agree on a high-contrast field — if the
        two paths coincide there, the flag is wired to nothing."""
        img = np.zeros((32, 32, 4), np.float32)
        img[8:16, 8:16] = [0.9, 0.5, 0.2, 1.0]   # hard bright edge
        img = jnp.asarray(img)
        early, late = self._both_orders(img, 4.0, 1.0, 2, 0.6,
                                        "gaussian")
        assert np.abs(early[..., :3] - late[..., :3]).max() > 0.01

    def test_earlyclip_bounds_negative_lobes(self):
        """With a negative-lobe kernel (catrom) over a superwhite
        edge, the early order clips per bucket FIRST, so its output
        after the final clip stays in [0,1] and ringing is computed
        on clipped values; both orders stay bounded (definition of
        the final clip), and the early path's pre-filter values are
        already <= 1 so its overshoot is strictly smaller."""
        img = np.zeros((32, 32, 4), np.float32)
        img[8:16, 8:16] = [40.0, 30.0, 10.0, 50.0]  # superwhite
        img = jnp.asarray(img)
        early, late = self._both_orders(img, 2.0, 1.0, 2, 0.75,
                                        "catrom")
        assert early.min() >= 0.0 and early.max() <= 1.0
        assert late.min() >= 0.0 and late.max() <= 1.0

    def test_renderer_honors_earlyclip_flag(self):
        """End-to-end: the genome flag switches the pipeline order —
        renders must differ at gamma 4 on the same seed, and the
        earlyclip render must be a valid image (the flag was
        parse-and-warn until round 4)."""
        from cuburn_tpu.models import sierpinski
        from cuburn_tpu.profile import RenderProfile
        from cuburn_tpu.render import Renderer
        prof = RenderProfile(width=64, height=64, quality=60,
                             batch=2048, iters_per_chunk=8,
                             hist_backend="scatter", fuse=8,
                             de_enabled=False)
        g = sierpinski()
        g.earlyclip = False
        late, _ = Renderer(g, prof).render_frame(0.0, seed=5)
        g2 = sierpinski()
        g2.earlyclip = True
        early, _ = Renderer(g2, prof).render_frame(0.0, seed=5)
        assert early.shape == late.shape
        assert early[..., :3].sum() > 0
        assert np.abs(early.astype(np.int32)
                      - late.astype(np.int32)).max() > 0
