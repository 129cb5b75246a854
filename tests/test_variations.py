"""Per-variation unit tests (SURVEY.md §4: pure functions compared
against closed-form flam3 formulas on a point grid, CPU only).

Two layers:
  * every variation: finiteness + zero-weight annihilation on a grid
    that avoids singular points
  * spot checks: ~20 variations with independently written closed-form
    expectations (not shared code with the implementation)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuburn_tpu.genome.variations import (ALL_VARIATIONS,
                                          VARIATION_PARAMS,
                                          STOCHASTIC_VARIATIONS)
from cuburn_tpu.ops import rng as rng_mod
from cuburn_tpu.ops.variations import VARIATION_IMPLS, make_ctx


def _grid(n=64):
    # avoid exact zeros/axis points where flam3 formulas are singular
    xs = np.linspace(-1.9, 2.1, n) + 0.0137
    ys = np.linspace(-2.1, 1.9, n) + 0.0291
    gx, gy = np.meshgrid(xs, ys)
    return (jnp.asarray(gx.ravel(), jnp.float32),
            jnp.asarray(gy.ravel(), jnp.float32))


def _eval(name, tx, ty, w=0.7, params=None, affine=None, seed=0):
    B = tx.shape[0]
    if affine is None:
        affine = (1.1, 0.2, 0.3, -0.2, 0.9, 0.15)
    aff = tuple(jnp.full((B,), v, jnp.float32) for v in affine)
    stream = rng_mod.RngStream(rng_mod.seed(jax.random.PRNGKey(seed), B))
    ctx = make_ctx(tx, ty, aff, stream)
    defaults = dict(VARIATION_PARAMS[name])
    if params:
        defaults.update(params)

    def P(attr):
        return jnp.full((B,), defaults[attr], jnp.float32)

    wv = jnp.full((B,), w, jnp.float32)
    dx, dy = VARIATION_IMPLS[name](ctx, wv, P)
    return np.asarray(dx), np.asarray(dy)


@pytest.mark.parametrize("name", ALL_VARIATIONS)
def test_finite_on_grid(name):
    tx, ty = _grid(32)
    dx, dy = _eval(name, tx, ty)
    assert np.isfinite(dx).all(), f"{name} produced non-finite x"
    assert np.isfinite(dy).all(), f"{name} produced non-finite y"


def test_stochastic_partition_matches_rng_usage():
    """The STOCHASTIC_VARIATIONS set must be exactly the set of
    implementations whose output depends on the RNG stream: run every
    variation twice on the same inputs with different seeds and
    compare.  Keeps the schema's stochastic/deterministic partition
    (used for test policy and documentation) from drifting as
    variations are added."""
    tx, ty = _grid(16)
    actually_stochastic = set()
    for name in ALL_VARIATIONS:
        # probe at defaults AND at activated params: several stochastic
        # variations are deterministic at their flam3 defaults (power=1
        # makes trunc(|power|*u)=0; super_shape_rnd=0 blends no random
        # radius), which is exactly why the partition needs pinning
        bumped = {attr: d * 1.7 + 0.9
                  for attr, d in VARIATION_PARAMS[name]}
        for params in (None, bumped):
            a = _eval(name, tx, ty, params=params, seed=0)
            b = _eval(name, tx, ty, params=params, seed=1)
            if not (np.array_equal(a[0], b[0])
                    and np.array_equal(a[1], b[1])):
                actually_stochastic.add(name)
                break
    # pre_blur's registered impl is a deliberate no-op — its RNG use
    # lives in the PRE-step path (ops/xform.py), pinned by
    # test_pre_blur_perturbs_before_variations
    actually_stochastic.add("pre_blur")
    assert actually_stochastic == set(STOCHASTIC_VARIATIONS), (
        "rng-using but not declared: "
        f"{sorted(actually_stochastic - set(STOCHASTIC_VARIATIONS))}; "
        "declared but deterministic: "
        f"{sorted(set(STOCHASTIC_VARIATIONS) - actually_stochastic)}")


@pytest.mark.parametrize("name", ALL_VARIATIONS)
def test_zero_weight_is_zero(name):
    """w=0 must contribute nothing (the union-evaluation design relies
    on this: xforms not using a variation gather weight 0) — checked
    with NONZERO parameter values, since weight-independent additive
    terms (flam3 never evaluates inactive variations) are exactly the
    way this design can break."""
    tx, ty = _grid(16)
    params = {attr: d + 0.37 for attr, d in VARIATION_PARAMS[name]}
    dx, dy = _eval(name, tx, ty, w=0.0, params=params)
    assert np.abs(dx).max() < 1e-4, f"{name}: nonzero at w=0"
    assert np.abs(dy).max() < 1e-4, f"{name}: nonzero at w=0"


class TestClosedForms:
    """Independent closed-form expectations (flam3 paper formulas)."""

    W = 0.7

    def setup_method(self, _m):
        self.tx, self.ty = _grid(24)
        self.x = np.asarray(self.tx, np.float64)
        self.y = np.asarray(self.ty, np.float64)
        self.r2 = self.x**2 + self.y**2
        self.r = np.sqrt(self.r2)
        self.theta = np.arctan2(self.x, self.y)

    def check(self, name, ex, ey, tol=1e-4, **kw):
        dx, dy = _eval(name, self.tx, self.ty, w=self.W, **kw)
        np.testing.assert_allclose(dx, self.W * ex, rtol=tol, atol=tol,
                                   err_msg=f"{name} x")
        np.testing.assert_allclose(dy, self.W * ey, rtol=tol, atol=tol,
                                   err_msg=f"{name} y")

    def test_linear(self):
        self.check("linear", self.x, self.y)

    def test_sinusoidal(self):
        self.check("sinusoidal", np.sin(self.x), np.sin(self.y))

    def test_spherical(self):
        self.check("spherical", self.x / self.r2, self.y / self.r2,
                   tol=1e-3)

    def test_swirl(self):
        s, c = np.sin(self.r2), np.cos(self.r2)
        self.check("swirl", self.x * s - self.y * c,
                   self.x * c + self.y * s, tol=1e-3)

    def test_horseshoe(self):
        self.check("horseshoe",
                   (self.x - self.y) * (self.x + self.y) / self.r,
                   2 * self.x * self.y / self.r, tol=1e-3)

    def test_polar(self):
        self.check("polar", self.theta / np.pi, self.r - 1.0)

    def test_handkerchief(self):
        self.check("handkerchief",
                   self.r * np.sin(self.theta + self.r),
                   self.r * np.cos(self.theta - self.r), tol=1e-3)

    def test_heart(self):
        self.check("heart", self.r * np.sin(self.theta * self.r),
                   -self.r * np.cos(self.theta * self.r), tol=1e-3)

    def test_disc(self):
        a = self.theta / np.pi
        self.check("disc", a * np.sin(np.pi * self.r),
                   a * np.cos(np.pi * self.r), tol=1e-3)

    def test_fisheye_swaps(self):
        s = 2.0 / (self.r + 1.0)
        self.check("fisheye", s * self.y, s * self.x, tol=1e-3)

    def test_eyefish(self):
        s = 2.0 / (self.r + 1.0)
        self.check("eyefish", s * self.x, s * self.y, tol=1e-3)

    def test_bubble(self):
        s = 4.0 / (self.r2 + 4.0)
        self.check("bubble", s * self.x, s * self.y, tol=1e-3)

    def test_cylinder(self):
        self.check("cylinder", np.sin(self.x), self.y)

    def test_exponential(self):
        e = np.exp(self.x - 1.0)
        self.check("exponential", e * np.cos(np.pi * self.y),
                   e * np.sin(np.pi * self.y), tol=1e-3)

    def test_cosine(self):
        self.check("cosine",
                   np.cos(np.pi * self.x) * np.cosh(self.y),
                   -np.sin(np.pi * self.x) * np.sinh(self.y), tol=1e-3)

    def test_pdj(self):
        p = {"pdj_a": 0.9, "pdj_b": -0.3, "pdj_c": 1.2, "pdj_d": 0.7}
        self.check("pdj",
                   np.sin(p["pdj_a"] * self.y) - np.cos(
                       p["pdj_b"] * self.x),
                   np.sin(p["pdj_c"] * self.x) - np.cos(
                       p["pdj_d"] * self.y),
                   params=p, tol=1e-3)

    def test_fan2_trunc_semantics(self):
        """fan2 folds the angle with a C (int) cast — truncation toward
        zero, not floor.  For a + fan2_y < 0 the two disagree: trunc
        puts t in (-dx, 0] (always the a+dx2 branch), floor alternates.
        Checked over the full angular domain, masking only the points
        sitting on a branch/fold discontinuity (float32 vs float64
        placement there is genuinely ambiguous)."""
        px, py = 0.61, 0.33
        dxp = np.pi * (px * px + 1e-10)
        dx2 = 0.5 * dxp
        a = self.theta
        q = (a + py) / dxp
        t = a + py - dxp * np.trunc(q)
        a2 = np.where(t > dx2, a - dx2, a + dx2)
        ex, ey = self.r * np.sin(a2), self.r * np.cos(a2)
        got_x, got_y = _eval("fan2", self.tx, self.ty, w=self.W,
                             params={"fan2_x": px, "fan2_y": py})
        # mask points within 1e-3 of a fold (trunc step) or branch edge
        safe = (np.abs(t - dx2) > 1e-3) & (np.abs(q - np.round(q)) > 1e-3)
        assert safe.mean() > 0.9
        np.testing.assert_allclose(got_x[safe], self.W * ex[safe],
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(got_y[safe], self.W * ey[safe],
                                   rtol=1e-3, atol=1e-3)
        # and the negative-angle half really exercises the trunc branch
        assert ((a + py) < 0).mean() > 0.3

    def test_curl_with_c2_zero(self):
        # c2=0: (x', y') = ((x re + y im), (y re - x im)) / (re^2+im^2)
        c1 = 0.5
        re = 1.0 + c1 * self.x
        im = c1 * self.y
        d = re * re + im * im
        self.check("curl", (self.x * re + self.y * im) / d,
                   (self.y * re - self.x * im) / d,
                   params={"curl_c1": c1, "curl_c2": 0.0}, tol=1e-3)

    def test_waves_uses_affine(self):
        aff = (1.0, 0.5, 0.25, -0.3, 0.8, 0.6)   # b=0.5 c=0.25 e=0.8 f=0.6
        b, c, e, f = 0.5, 0.25, 0.8, 0.6
        dx, dy = _eval("waves", self.tx, self.ty, w=self.W, affine=aff)
        ex = self.x + b * np.sin(self.y / (c * c))
        ey = self.y + e * np.sin(self.x / (f * f))
        np.testing.assert_allclose(dx, self.W * ex, atol=1e-3)
        np.testing.assert_allclose(dy, self.W * ey, atol=1e-3)

    def test_popcorn_uses_affine(self):
        aff = (1.0, 0.0, 0.25, 0.0, 1.0, 0.6)
        c, f = 0.25, 0.6
        dx, dy = _eval("popcorn", self.tx, self.ty, w=self.W,
                       affine=aff)
        ex = self.x + c * np.sin(np.tan(3 * self.y))
        ey = self.y + f * np.sin(np.tan(3 * self.x))
        np.testing.assert_allclose(dx, self.W * ex, atol=2e-3)
        np.testing.assert_allclose(dy, self.W * ey, atol=2e-3)

    def test_julian_power_one_deterministic(self):
        # power=1, dist=2: r^2/1... formula reduces to
        # r^(dist/power) * (cos(phi), sin(phi)) with phi = atan2(y,x)
        phi = np.arctan2(self.y, self.x)
        rr = (self.r2) ** (2.0 / 1.0 / 2.0)
        self.check("julian", rr * np.cos(phi), rr * np.sin(phi),
                   params={"julian_power": 1.0, "julian_dist": 2.0},
                   tol=2e-3)

    def test_mobius_identity(self):
        # a=1, d=1 (b=c=0): the identity Mobius map
        p = {"mobius_re_a": 1.0, "mobius_re_d": 1.0}
        self.check("mobius", self.x, self.y, params=p, tol=1e-3)

    def test_mobius_general_params(self):
        """Full Mobius arithmetic vs numpy complex division: nonzero
        b and c, complex everything — a conjugated denominator or
        transposed b/c roles reduces to identity at the
        identity-params test above and would pass it."""
        a, b = 0.8 + 0.3j, 0.1 - 0.2j
        cc, d = 0.25 + 0.15j, 1.1 - 0.1j   # pole at ~(-3.1, 2.2), off-grid
        z = self.x + 1j * self.y
        m = (a * z + b) / (cc * z + d)
        p = {"mobius_re_a": a.real, "mobius_im_a": a.imag,
             "mobius_re_b": b.real, "mobius_im_b": b.imag,
             "mobius_re_c": cc.real, "mobius_im_c": cc.imag,
             "mobius_re_d": d.real, "mobius_im_d": d.imag}
        self.check("mobius", m.real, m.imag, params=p, tol=2e-3)

    def test_complex_sin(self):
        self.check("sin", np.sin(self.x) * np.cosh(self.y),
                   np.cos(self.x) * np.sinh(self.y), tol=2e-3)

    def test_complex_exp(self):
        e = np.exp(self.x)
        self.check("exp", e * np.cos(self.y), e * np.sin(self.y),
                   tol=2e-3)

    def test_complex_log(self):
        self.check("log", 0.5 * np.log(self.r2),
                   np.arctan2(self.y, self.x), tol=1e-3)

    def test_tangent(self):
        self.check("tangent", np.sin(self.x) / np.cos(self.y),
                   np.tan(self.y), tol=2e-3)

    def test_scry_weight_nonlinear(self):
        # scry deliberately breaks the w-linear pattern: its output is
        # NOT proportional to w (weight sits inside the denominator)
        tx, ty = self.tx, self.ty
        d1x, _ = _eval("scry", tx, ty, w=0.4)
        d2x, _ = _eval("scry", tx, ty, w=0.8)
        ratio = np.abs(d2x / d1x)
        assert not np.allclose(ratio, 2.0, atol=0.2)


class TestStochastic:
    def test_blur_disc_support(self):
        """blur scatters inside a w-radius disc regardless of input."""
        tx, ty = _grid(32)
        dx, dy = _eval("blur", tx, ty, w=0.5, seed=3)
        r = np.sqrt(dx**2 + dy**2)
        assert r.max() <= 0.5 + 1e-5
        assert r.mean() > 0.05

    def test_gaussian_blur_centered(self):
        tx, ty = _grid(40)
        dx, dy = _eval("gaussian_blur", tx, ty, w=1.0, seed=4)
        assert abs(dx.mean()) < 0.05 and abs(dy.mean()) < 0.05
        assert dx.std() > 0.1

    def test_square_support(self):
        tx, ty = _grid(32)
        dx, dy = _eval("square", tx, ty, w=1.0, seed=5)
        assert dx.min() >= -0.5 and dx.max() <= 0.5
        assert dy.min() >= -0.5 and dy.max() <= 0.5

    def test_julia_two_branches(self):
        tx = jnp.full((4096,), 0.8, jnp.float32)
        ty = jnp.full((4096,), 0.6, jnp.float32)
        dx, dy = _eval("julia", tx, ty, w=1.0, seed=6)
        # sqrt(r)*[cos/sin](theta/2 + {0, pi}): two antipodal clusters
        uniq = np.unique(np.round(dx, 3))
        assert len(uniq) == 2
        np.testing.assert_allclose(uniq[0], -uniq[1], atol=1e-3)

    def test_noise_bounded_by_input(self):
        tx, ty = _grid(16)
        dx, dy = _eval("noise", tx, ty, w=1.0, seed=7)
        assert (np.abs(dx) <= np.abs(np.asarray(tx)) + 1e-5).all()

    def test_boarders_branch_frequency(self):
        """flam3 var57_boarders: random >= 0.75 takes the PLAIN
        interior branch, so only ~25% of samples land there (round-1
        had the split inverted).  At (0.4, 0.3) the interior output is
        w*(0.2, 0.15), distinct from the edge branch's w*(0.45, ...)."""
        B = 8192
        tx = jnp.full((B,), 0.4, jnp.float32)
        ty = jnp.full((B,), 0.3, jnp.float32)
        dx, dy = _eval("boarders", tx, ty, w=1.0, seed=8)
        interior = np.abs(dx - 0.2) < 1e-5
        frac = interior.mean()
        assert 0.20 < frac < 0.30, f"interior fraction {frac}"
        # edge branch value for |ox|>=|oy|, ox>=0: (0.45, 0.15+0.25*oy/ox)
        np.testing.assert_allclose(np.unique(np.round(dx[~interior], 5)),
                                   [0.45], atol=1e-5)


class TestComplexClosedForms:
    """Independent re-derivations for the error-prone complex formulas
    (transcribed from the flam3 function definitions; these are the
    ones most at risk given the empty reference mount, SURVEY.md §0)."""

    W = 0.6

    def setup_method(self, _m):
        self.tx, self.ty = _grid(20)
        self.x = np.asarray(self.tx, np.float64)
        self.y = np.asarray(self.ty, np.float64)
        self.r2 = self.x**2 + self.y**2

    def check(self, name, ex, ey, tol=2e-3, **kw):
        dx, dy = _eval(name, self.tx, self.ty, w=self.W, **kw)
        np.testing.assert_allclose(dx, self.W * ex, rtol=tol, atol=tol,
                                   err_msg=f"{name} x")
        np.testing.assert_allclose(dy, self.W * ey, rtol=tol, atol=tol,
                                   err_msg=f"{name} y")

    def test_blob(self):
        lo, hi, waves = 0.4, 1.1, 3.0
        r = np.sqrt(self.r2)
        theta = np.arctan2(self.x, self.y)
        rr = r * (lo + (hi - lo)
                  * (0.5 + 0.5 * np.sin(waves * theta)))
        self.check("blob", rr * np.sin(theta), rr * np.cos(theta),
                   params={"blob_low": lo, "blob_high": hi,
                           "blob_waves": waves}, tol=5e-3)

    def test_perspective(self):
        pa, pd = 0.6, 2.0
        ang = pa * np.pi / 2.0
        t = 1.0 / (pd - self.y * np.sin(ang))
        self.check("perspective", pd * self.x * t,
                   pd * np.cos(ang) * self.y * t,
                   params={"perspective_angle": pa,
                           "perspective_dist": pd}, tol=5e-3)

    def test_cpow_power_one(self):
        """power=1 makes the random branch term floor(uniform)=0:
        deterministic complex power z^(pr + pi*i)."""
        pr, pi_ = 1.5, 0.3
        a = np.arctan2(self.y, self.x)
        lnr = 0.5 * np.log(self.r2)
        ang = pr * a + pi_ * lnr
        m = np.exp(pr * lnr - pi_ * a)
        self.check("cpow", m * np.cos(ang), m * np.sin(ang),
                   params={"cpow_r": pr, "cpow_i": pi_,
                           "cpow_power": 1.0}, tol=5e-3)

    def test_loonie(self):
        w2 = self.W * self.W
        r = np.sqrt(self.r2)
        inside = self.r2 < w2
        rr = self.W * np.sqrt(np.maximum(w2 / self.r2 - 1.0, 0.0))
        s = np.where(inside, rr, self.W)
        # check() multiplies by W again, so divide out
        self.check("loonie", s * self.x / self.W,
                   s * self.y / self.W, tol=5e-3)

    def test_wedge_sph(self):
        angle, count, hole, swirl = 0.4, 3.0, 0.1, 0.2
        r = np.sqrt(self.r2)
        rr = 1.0 / r
        a = np.arctan2(self.y, self.x) + swirl * rr
        cc = np.floor((count * a + np.pi) / (2.0 * np.pi))
        comp = 1.0 - angle * count / (2.0 * np.pi)
        a2 = a * comp + cc * angle
        rr2 = rr + hole
        # mask fold-boundary ambiguity
        q = (count * a + np.pi) / (2.0 * np.pi)
        safe = np.abs(q - np.round(q)) > 1e-3
        ex, ey = rr2 * np.cos(a2), rr2 * np.sin(a2)
        got_x, got_y = _eval("wedge_sph", self.tx, self.ty, w=self.W,
                             params={"wedge_sph_angle": angle,
                                     "wedge_sph_count": count,
                                     "wedge_sph_hole": hole,
                                     "wedge_sph_swirl": swirl})
        np.testing.assert_allclose(got_x[safe], self.W * ex[safe],
                                   rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(got_y[safe], self.W * ey[safe],
                                   rtol=5e-3, atol=5e-3)

    def test_rings2(self):
        val = 0.7
        dx = val * val + 1e-10
        r = np.sqrt(self.r2)
        theta = np.arctan2(self.x, self.y)
        rr = r - 2.0 * dx * np.trunc((r + dx) / (2.0 * dx)) \
            + r * (1.0 - dx)
        self.check("rings2", rr * np.sin(theta), rr * np.cos(theta),
                   params={"rings2_val": val}, tol=5e-3)

    def test_whorl(self):
        inside, outside = 0.8, -0.4
        r = np.sqrt(self.r2)
        atanyx = np.arctan2(self.y, self.x)
        a = atanyx + np.where(r < self.W, inside / (self.W - r),
                              outside / (self.W - r))
        self.check("whorl", r * np.cos(a), r * np.sin(a),
                   params={"whorl_inside": inside,
                           "whorl_outside": outside}, tol=5e-3)

    def test_bent2(self):
        px, py = 0.6, -1.3
        self.check("bent2",
                   np.where(self.x < 0, self.x * px, self.x),
                   np.where(self.y < 0, self.y * py, self.y),
                   params={"bent2_x": px, "bent2_y": py})

    def test_split(self):
        xs, ys = 0.45, 0.8
        dy = np.where(np.cos(self.x * xs * np.pi) >= 0, self.y,
                      -self.y)
        dx = np.where(np.cos(self.y * ys * np.pi) >= 0, self.x,
                      -self.x)
        self.check("split", dx, dy,
                   params={"split_xsize": xs, "split_ysize": ys})

    def test_splits(self):
        px, py = 0.35, -0.2
        self.check("splits",
                   np.where(self.x >= 0, self.x + px, self.x - px),
                   np.where(self.y >= 0, self.y + py, self.y - py),
                   params={"splits_x": px, "splits_y": py})

    def test_rectangles(self):
        px, py = 0.8, 1.3
        ex = (2.0 * np.floor(self.x / px) + 1.0) * px - self.x
        ey = (2.0 * np.floor(self.y / py) + 1.0) * py - self.y
        self.check("rectangles", ex, ey,
                   params={"rectangles_x": px, "rectangles_y": py},
                   tol=5e-3)

    def test_polar2(self):
        theta = np.arctan2(self.x, self.y)
        self.check("polar2", theta / np.pi,
                   np.log(self.r2) / (2.0 * np.pi), tol=5e-3)

    def test_waves2(self):
        fx, sx, fy, sy = 2.5, 0.15, 1.5, -0.2
        self.check("waves2",
                   self.x + sx * np.sin(self.y * fx),
                   self.y + sy * np.sin(self.x * fy),
                   params={"waves2_freqx": fx, "waves2_scalex": sx,
                           "waves2_freqy": fy, "waves2_scaley": sy})

    def test_disc2_plain_twist(self):
        rot, twist = 0.3, 0.5        # |twist| < 2pi: no k adjustment
        timespi = rot * np.pi
        sinadd, cosadd = np.sin(twist), np.cos(twist) - 1.0
        t = timespi * (self.x + self.y)
        rr = np.arctan2(self.x, self.y) / np.pi
        self.check("disc2", rr * (np.sin(t) + cosadd),
                   rr * (np.cos(t) + sinadd),
                   params={"disc2_rot": rot, "disc2_twist": twist},
                   tol=5e-3)

    def test_super_shape_deterministic(self):
        m, n1, n2, n3, holes = 4.0, 2.5, 1.5, 0.8, 0.1
        r = np.sqrt(self.r2)
        theta = (m / 4.0) * np.arctan2(self.y, self.x) + np.pi / 4.0
        t1 = np.abs(np.cos(theta)) ** n2
        t2 = np.abs(np.sin(theta)) ** n3
        rr = (r - holes) * (t1 + t2) ** (-1.0 / n1) / r
        self.check("super_shape", rr * self.x, rr * self.y,
                   params={"super_shape_m": m, "super_shape_n1": n1,
                           "super_shape_n2": n2, "super_shape_n3": n3,
                           "super_shape_holes": holes,
                           "super_shape_rnd": 0.0}, tol=5e-3)

    def test_separation(self):
        sx, sy, xin, yin = 0.5, 0.3, 0.2, -0.1
        ex = np.where(self.x > 0,
                      np.sqrt(self.x ** 2 + sx * sx) - self.x * xin,
                      -(np.sqrt(self.x ** 2 + sx * sx)
                        + self.x * xin))
        ey = np.where(self.y > 0,
                      np.sqrt(self.y ** 2 + sy * sy) - self.y * yin,
                      -(np.sqrt(self.y ** 2 + sy * sy)
                        + self.y * yin))
        self.check("separation", ex, ey,
                   params={"separation_x": sx, "separation_y": sy,
                           "separation_xinside": xin,
                           "separation_yinside": yin})

    def test_bipolar(self):
        shift = 0.3
        x2y2 = self.r2
        t = x2y2 + 1.0
        x2 = 2.0 * self.x
        ps = -np.pi / 2 * shift
        yv = 0.5 * np.arctan2(2.0 * self.y, x2y2 - 1.0) + ps
        yv = np.where(yv > np.pi / 2,
                      -np.pi / 2 + np.mod(yv + np.pi / 2, np.pi), yv)
        yv = np.where(yv < -np.pi / 2,
                      np.pi / 2 - np.mod(np.pi / 2 - yv, np.pi), yv)
        ex = 0.25 * (2.0 / np.pi) * np.log((t + x2) / (t - x2))
        ey = (2.0 / np.pi) * yv
        self.check("bipolar", ex, ey,
                   params={"bipolar_shift": shift})

    def test_elliptic(self):
        tmp = self.r2 + 1.0
        x2 = 2.0 * self.x
        xmax = 0.5 * (np.sqrt(tmp + x2) + np.sqrt(tmp - x2))
        a = self.x / xmax
        b = np.sqrt(np.maximum(1.0 - a * a, 0.0))
        ssx = np.sqrt(np.maximum(xmax - 1.0, 0.0))
        wpi = 2.0 / np.pi
        ex = wpi * np.arctan2(a, b)
        ey = np.where(self.y > 0, wpi * np.log(xmax + ssx),
                      -wpi * np.log(xmax + ssx))
        self.check("elliptic", ex, ey)

    def test_foci(self):
        expx = 0.5 * np.exp(self.x)
        expnx = 0.25 / expx
        sn, cn = np.sin(self.y), np.cos(self.y)
        tmp = 1.0 / (expx + expnx - cn)
        self.check("foci", tmp * (expx - expnx), tmp * sn)

    def test_escher(self):
        beta = 0.45
        a = np.arctan2(self.y, self.x)
        lnr = 0.5 * np.log(self.r2)
        seb, ceb = np.sin(beta), np.cos(beta)
        vc, vd = 0.5 * (1.0 + ceb), 0.5 * seb
        m = np.exp(vc * lnr - vd * a)
        n = vc * a + vd * lnr
        self.check("escher", m * np.cos(n), m * np.sin(n),
                   params={"escher_beta": beta})

    def test_cell(self):
        size = 0.7
        inv = 1.0 / size
        cx = np.floor(self.x * inv)
        cy = np.floor(self.y * inv)
        dx_ = self.x - cx * size
        dy_ = self.y - cy * size
        cx2 = np.where(cx >= 0, 2 * cx, -(2 * cx + 1))
        cy2 = np.where(cy >= 0, 2 * cy, -(2 * cy + 1))
        self.check("cell", dx_ + cx2 * size, -(dy_ + cy2 * size),
                   params={"cell_size": size})

    def test_modulus(self):
        mx, my = 0.6, 0.4
        xr, yr = 2 * mx, 2 * my
        ex = np.where(self.x > mx, -mx + np.mod(self.x + mx, xr),
                      np.where(self.x < -mx,
                               mx - np.mod(mx - self.x, xr), self.x))
        ey = np.where(self.y > my, -my + np.mod(self.y + my, yr),
                      np.where(self.y < -my,
                               my - np.mod(my - self.y, yr), self.y))
        self.check("modulus", ex, ey,
                   params={"modulus_x": mx, "modulus_y": my})

    def test_stripes(self):
        space, warp = 0.35, 0.8
        rx = np.floor(self.x + 0.5)
        ox = self.x - rx
        self.check("stripes", ox * (1 - space) + rx,
                   self.y + ox * ox * warp,
                   params={"stripes_space": space,
                           "stripes_warp": warp})

    def test_wedge(self):
        angle, hole, count, swirl = 0.4, 0.1, 3.0, 0.2
        r = np.sqrt(self.r2)
        a = np.arctan2(self.y, self.x) + swirl * r
        c = np.floor((count * a + np.pi) / (2 * np.pi))
        comp = 1.0 - angle * count / (2 * np.pi)
        a = a * comp + c * angle
        rr = r + hole
        self.check("wedge", rr * np.cos(a), rr * np.sin(a),
                   params={"wedge_angle": angle, "wedge_hole": hole,
                           "wedge_count": count, "wedge_swirl": swirl})

    def test_ngon(self):
        sides, power, circle, corners = 5.0, 3.0, 1.0, 2.0
        csides = 2 * np.pi / sides
        theta = np.arctan2(self.y, self.x)
        phi = theta - csides * np.floor(theta / csides)
        phi = np.where(phi > csides / 2, phi - csides, phi)
        amp = (corners * (1.0 / np.cos(phi) - 1.0) + circle) \
            / self.r2 ** (power / 2)
        self.check("ngon", amp * self.x, amp * self.y, tol=5e-3,
                   params={"ngon_sides": sides, "ngon_power": power,
                           "ngon_circle": circle,
                           "ngon_corners": corners})

    def test_curve(self):
        xa, ya, xl, yl = 0.7, -0.4, 0.8, 1.2
        ex = self.x + xa * np.exp(-self.y**2 / xl**2)
        ey = self.y + ya * np.exp(-self.x**2 / yl**2)
        self.check("curve", ex, ey,
                   params={"curve_xamp": xa, "curve_yamp": ya,
                           "curve_xlength": xl, "curve_ylength": yl})


class TestMoreClosedForms:
    """Round-2 continuation: the remaining deterministic variations,
    each against an independently transcribed flam3 formula
    (theta = atan2(x, y), so sin(theta) = x/r, cos(theta) = y/r)."""

    W = 0.7

    def setup_method(self, _m):
        self.tx, self.ty = _grid(24)
        self.x = np.asarray(self.tx, np.float64)
        self.y = np.asarray(self.ty, np.float64)
        self.r2 = self.x**2 + self.y**2
        self.r = np.sqrt(self.r2)
        self.st = self.x / self.r          # sin(theta)
        self.ct = self.y / self.r          # cos(theta)

    def check(self, name, ex, ey, tol=2e-3, **kw):
        dx, dy = _eval(name, self.tx, self.ty, w=self.W, **kw)
        np.testing.assert_allclose(dx, self.W * ex, rtol=tol, atol=tol,
                                   err_msg=f"{name} x")
        np.testing.assert_allclose(dy, self.W * ey, rtol=tol, atol=tol,
                                   err_msg=f"{name} y")

    def test_spiral(self):
        self.check("spiral", (self.ct + np.sin(self.r)) / self.r,
                   (self.st - np.cos(self.r)) / self.r)

    def test_hyperbolic(self):
        self.check("hyperbolic", self.st / self.r, self.ct * self.r)

    def test_diamond(self):
        self.check("diamond", self.st * np.cos(self.r),
                   self.ct * np.sin(self.r))

    def test_ex(self):
        theta = np.arctan2(self.x, self.y)
        p0 = np.sin(theta + self.r) ** 3
        p1 = np.cos(theta - self.r) ** 3
        self.check("ex", self.r * (p0 + p1), self.r * (p0 - p1),
                   tol=5e-3)

    def test_power(self):
        rp = self.r ** self.st
        self.check("power", rp * self.ct, rp * self.st, tol=5e-3)

    def test_rings_uses_affine(self):
        # flam3 var21_rings reads the xform's x-translation (c) as the
        # ring spacing: dx = c^2; r' = mod(r+dx, 2dx) - dx + r(1-dx)
        aff = (1.0, 0.0, 0.45, 0.0, 1.0, 0.2)
        dxp = 0.45 * 0.45 + 1e-10
        rr = np.mod(self.r + dxp, 2 * dxp) - dxp + self.r * (1 - dxp)
        got_x, got_y = _eval("rings", self.tx, self.ty, w=self.W,
                             affine=aff)
        # mask ring-boundary points (float32 mod placement ambiguity)
        q = (self.r + dxp) / (2 * dxp)
        safe = np.abs(q - np.round(q)) > 1e-3
        np.testing.assert_allclose(got_x[safe],
                                   self.W * (rr * self.ct)[safe],
                                   rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(got_y[safe],
                                   self.W * (rr * self.st)[safe],
                                   rtol=5e-3, atol=5e-3)

    def test_fan_uses_affine(self):
        # flam3 var22_fan: dx = pi*(c^2), dy = f; blades of width dx
        # alternate between rotating the angle by +-dx/2
        aff = (1.0, 0.0, 0.5, 0.0, 1.0, 0.3)
        dxp = np.pi * (0.5 * 0.5 + 1e-10)
        dy_, dx2 = 0.3, dxp / 2
        theta = np.arctan2(self.x, self.y)
        v = theta + dy_
        m = v - dxp * np.trunc(v / dxp)    # C fmod (sign of dividend)
        a = np.where(m > dx2, theta - dx2, theta + dx2)
        ex, ey = self.r * np.cos(a), self.r * np.sin(a)
        got_x, got_y = _eval("fan", self.tx, self.ty, w=self.W,
                             affine=aff)
        safe = (np.abs(m - dx2) > 1e-3) \
            & (np.abs(m) > 1e-3) & (np.abs(np.abs(m) - dxp) > 1e-3)
        assert safe.mean() > 0.9
        np.testing.assert_allclose(got_x[safe], self.W * ex[safe],
                                   rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(got_y[safe], self.W * ey[safe],
                                   rtol=5e-3, atol=5e-3)

    def test_butterfly(self):
        wx = 1.3029400317411197908970256609023   # 4/sqrt(3*pi)
        y2 = 2.0 * self.y
        rb = wx * np.sqrt(np.abs(self.x * self.y)
                          / (self.x**2 + y2**2 + 1e-10))
        self.check("butterfly", rb * self.x, rb * y2, tol=5e-3)

    def test_cross(self):
        s = self.x**2 - self.y**2
        rr = np.sqrt(1.0 / (s * s + 1e-10))
        self.check("cross", rr * self.x, rr * self.y, tol=5e-3)

    def test_popcorn2(self):
        px, py, c = 0.3, -0.2, 1.4
        self.check("popcorn2",
                   self.x + px * np.sin(np.tan(self.y * c)),
                   self.y + py * np.sin(np.tan(self.x * c)),
                   params={"popcorn2_x": px, "popcorn2_y": py,
                           "popcorn2_c": c}, tol=5e-3)

    def test_secant2(self):
        # weight sits INSIDE the cosine: r = w*|p|, cr = cos(r);
        # y-out = 1/cr + (-1 if cr >= 0 else +1)
        cr = np.cos(self.W * self.r)
        icr = 1.0 / cr
        ey = np.where(cr < 0, icr + 1.0, icr - 1.0)
        safe = np.abs(cr) > 0.05           # near-pole points explode
        got_x, got_y = _eval("secant2", self.tx, self.ty, w=self.W)
        np.testing.assert_allclose(got_x[safe],
                                   self.W * self.x[safe],
                                   rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(got_y[safe], self.W * ey[safe],
                                   rtol=5e-3, atol=5e-3)

    def test_flux(self):
        # nonlinear in w: the weight is the focus offset
        spread = 0.4
        w = self.W
        xpw, xmw = self.x + w, self.x - w
        avgr = w * (2.0 + spread) * np.sqrt(
            np.sqrt(self.y**2 + xpw**2) / np.sqrt(self.y**2 + xmw**2))
        avga = (np.arctan2(self.y, xmw)
                - np.arctan2(self.y, xpw)) * 0.5
        got_x, got_y = _eval("flux", self.tx, self.ty, w=w,
                             params={"flux_spread": spread})
        np.testing.assert_allclose(got_x, avgr * np.cos(avga),
                                   rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(got_y, avgr * np.sin(avga),
                                   rtol=5e-3, atol=5e-3)


class TestComplexTrigFamily:
    """The cothe complex-trig variation family: each is the complex
    function applied to z = x + iy (real -> x, imag -> y), verified
    against numpy's complex implementations — fully independent of
    the variation code."""

    W = 0.6

    def setup_method(self, _m):
        self.tx, self.ty = _grid(20)
        x = np.asarray(self.tx, np.float64)
        y = np.asarray(self.ty, np.float64)
        self.z = x + 1j * y

    def check_fn(self, name, fz, tol=2e-3):
        dx, dy = _eval(name, self.tx, self.ty, w=self.W)
        np.testing.assert_allclose(dx, self.W * fz.real, rtol=tol,
                                   atol=tol, err_msg=f"{name} x")
        np.testing.assert_allclose(dy, self.W * fz.imag, rtol=tol,
                                   atol=tol, err_msg=f"{name} y")

    def test_cos(self):
        self.check_fn("cos", np.cos(self.z))

    def test_tan(self):
        self.check_fn("tan", np.tan(self.z))

    def test_sec(self):
        self.check_fn("sec", 1.0 / np.cos(self.z))

    def test_csc(self):
        self.check_fn("csc", 1.0 / np.sin(self.z))

    def test_cot(self):
        self.check_fn("cot", 1.0 / np.tan(self.z))

    def test_sinh(self):
        self.check_fn("sinh", np.sinh(self.z))

    def test_cosh(self):
        self.check_fn("cosh", np.cosh(self.z))

    def test_tanh(self):
        self.check_fn("tanh", np.tanh(self.z))

    def test_sech(self):
        self.check_fn("sech", 1.0 / np.cosh(self.z))

    def test_csch(self):
        self.check_fn("csch", 1.0 / np.sinh(self.z))

    def test_coth(self):
        # flam3's coth (cothe's family) ships the CONJUGATE of the
        # mathematical cotanh — the sign quirk is part of the de-facto
        # spec, so flam3 compatibility means matching it, not math
        self.check_fn("coth", np.conj(1.0 / np.tanh(self.z)))


class TestAugerLazysusan:
    W = 0.7

    def setup_method(self, _m):
        self.tx, self.ty = _grid(24)
        self.x = np.asarray(self.tx, np.float64)
        self.y = np.asarray(self.ty, np.float64)

    def test_auger(self):
        """flam3 var auger: cross-coupled sine warp — the y output is
        driven by sin(freq*x) and vice versa."""
        sym, aw, freq, scale = 0.3, 0.8, 2.0, 0.5
        s = np.sin(freq * self.x)
        t = np.sin(freq * self.y)
        dy = self.y + aw * (scale * s / 2.0 + np.abs(self.y) * s)
        dx = self.x + aw * (scale * t / 2.0 + np.abs(self.x) * t)
        ex = self.x + sym * (dx - self.x)
        got_x, got_y = _eval("auger", self.tx, self.ty, w=self.W,
                             params={"auger_sym": sym,
                                     "auger_weight": aw,
                                     "auger_freq": freq,
                                     "auger_scale": scale})
        np.testing.assert_allclose(got_x, self.W * ex, rtol=2e-3,
                                   atol=2e-3)
        np.testing.assert_allclose(got_y, self.W * dy, rtol=2e-3,
                                   atol=2e-3)

    def test_lazysusan_both_branches(self):
        lx, ly, spin, space, twist = 0.2, -0.1, 0.4, 0.3, 0.6
        x = self.x - lx
        y = self.y + ly
        rr = np.sqrt(x * x + y * y)
        w = self.W
        a = np.arctan2(y, x) + spin + twist * (w - rr)
        ex_in = w * rr * np.cos(a) + lx
        ey_in = w * rr * np.sin(a) - ly
        ro = w * (1.0 + space / rr)
        ex_out = ro * x + lx
        ey_out = ro * y - ly
        inside = rr < w
        assert 0.02 < inside.mean() < 0.98   # both branches exercised
        ex = np.where(inside, ex_in, ex_out)
        ey = np.where(inside, ey_in, ey_out)
        got_x, got_y = _eval(
            "lazysusan", self.tx, self.ty, w=w,
            params={"lazysusan_x": lx, "lazysusan_y": ly,
                    "lazysusan_spin": spin, "lazysusan_space": space,
                    "lazysusan_twist": twist})
        safe = np.abs(rr - w) > 1e-3         # branch-edge ambiguity
        np.testing.assert_allclose(got_x[safe], ex[safe], rtol=5e-3,
                                   atol=5e-3)
        np.testing.assert_allclose(got_y[safe], ey[safe], rtol=5e-3,
                                   atol=5e-3)


class TestStochasticInvariants:
    """Implementation-independent invariants for the remaining
    stochastic variations: properties every correct flam3-compatible
    implementation must satisfy regardless of RNG draws."""

    def test_blade_radius_invariant(self):
        # blade: (x(cos r + sin r), x(cos r - sin r)) for random r
        # => dx^2 + dy^2 == 2 x^2 exactly, for every sample
        tx, ty = _grid(32)
        x = np.asarray(tx, np.float64)
        dx, dy = _eval("blade", tx, ty, w=0.8, seed=11)
        np.testing.assert_allclose(dx * dx + dy * dy,
                                   (0.8 ** 2) * 2.0 * x * x,
                                   rtol=1e-3, atol=1e-4)

    def test_flower_collinear_with_input(self):
        # flower scales the point along its own direction: outputs are
        # collinear with inputs (cross product ~ 0), with random length
        tx, ty = _grid(32)
        x = np.asarray(tx, np.float64)
        y = np.asarray(ty, np.float64)
        dx, dy = _eval("flower", tx, ty, w=0.9, seed=12)
        cross = dx * y - dy * x
        np.testing.assert_allclose(cross, 0.0, atol=1e-3)
        # and lengths vary (stochastic)
        scale = np.hypot(dx, dy) / np.hypot(x, y)
        assert scale.std() > 1e-3

    def test_flower_length_law(self):
        """Pin flower's defining radius law |out| = w*(u-holes)*
        cos(petals*theta): zero at petal boundaries, and at theta=0
        the signed scale spans exactly [-w*holes, w*(1-holes))."""
        B, w = 4096, 0.9
        petals, holes = 4.0, 0.25
        p = {"flower_petals": petals, "flower_holes": holes}
        # petal boundary: cos(4 * pi/8) = 0 -> output collapses
        th = np.pi / 8.0
        tx = jnp.full((B,), 1.6 * np.cos(th), jnp.float32)
        ty = jnp.full((B,), 1.6 * np.sin(th), jnp.float32)
        dx, dy = _eval("flower", tx, ty, w=w, params=p, seed=5)
        assert np.hypot(dx, dy).max() < 5e-3
        # theta = 0: out_x = w*(u - holes), u ~ U[0,1) — the /r in
        # rr cancels against |x|, so the law is radius-independent
        tx0 = jnp.full((B,), 1.6, jnp.float32)
        ty0 = jnp.zeros((B,), jnp.float32)
        dx0, dy0 = _eval("flower", tx0, ty0, w=w, params=p, seed=6)
        s = np.asarray(dx0)
        np.testing.assert_allclose(np.abs(dy0), 0.0, atol=1e-4)
        assert s.max() == pytest.approx(w * (1 - holes), abs=0.01)
        assert s.min() == pytest.approx(-w * holes, abs=0.01)
        assert s.mean() == pytest.approx(w * (0.5 - holes), abs=0.02)

    def test_pie_slice_quantization(self):
        # pie with slices=4, rotation=0: output angles cluster at
        # multiples of 2pi/4 +- thickness*slice width
        slices, thickness = 4.0, 0.0
        B = 4096
        tx = jnp.full((B,), 0.3, jnp.float32)
        ty = jnp.full((B,), 0.2, jnp.float32)
        dx, dy = _eval("pie", tx, ty, w=1.0, seed=13,
                       params={"pie_slices": slices,
                               "pie_rotation": 0.0,
                               "pie_thickness": thickness})
        ang = np.arctan2(dy, dx)
        # thickness 0 -> angles exactly on slice centers k*2pi/4
        frac = np.mod(ang / (2 * np.pi / slices) + 0.5, 1.0) - 0.5
        np.testing.assert_allclose(frac, 0.0, atol=1e-3)
        # all four slices hit
        k = np.round(ang / (2 * np.pi / slices)).astype(int) % 4
        assert len(np.unique(k)) == 4

    def test_radial_blur_pure_spin_preserves_radius(self):
        # flam3 radial_blur contributes (spun/zoomed point) - (input):
        # with angle=1 (spinvar=1, zoomvar=0, rz=-1) the contribution
        # plus the input is the input point spun by a random angle, so
        # |contribution + input| == |input| exactly, per sample
        tx, ty = _grid(24)
        x = np.asarray(tx, np.float64)
        y = np.asarray(ty, np.float64)
        r_in = np.hypot(x, y)
        dx, dy = _eval("radial_blur", tx, ty, w=0.6, seed=14,
                       params={"radial_blur_angle": 1.0})
        r_out = np.hypot(dx + x, dy + y)
        np.testing.assert_allclose(r_out, r_in, rtol=2e-3, atol=2e-3)
        # and the spin really is random (angles move)
        dang = np.arctan2(dy + y, dx + x) - np.arctan2(y, x)
        assert np.abs(dang).max() > 0.05

    def test_juliascope_power_two_clusters(self):
        # power=2, dist=1: EXACTLY two branch outputs per input point —
        # flam3 var31 takes the reflection sign from the parity of the
        # branch index t_rnd (even -> +atanyx, odd -> -atanyx), so the
        # branch angles are {atanyx/2, pi - atanyx/2} and nothing else
        # (regression: an independent sign draw produced 4 branches, a
        # wrongly symmetric render)
        B = 4096
        tx = jnp.full((B,), 0.8, jnp.float32)
        ty = jnp.full((B,), 0.5, jnp.float32)
        dx, dy = _eval("juliascope", tx, ty, w=1.0, seed=15,
                       params={"juliascope_power": 2.0,
                               "juliascope_dist": 1.0})
        pts = np.unique(np.round(np.stack([dx, dy], 1), 3), axis=0)
        assert len(pts) == 2
        atanyx = np.arctan2(0.5, 0.8)
        r = (0.8 ** 2 + 0.5 ** 2) ** 0.25
        want = np.array(sorted(
            (r * np.cos(a), r * np.sin(a))
            for a in (atanyx / 2.0, (2 * np.pi - atanyx) / 2.0)))
        np.testing.assert_allclose(
            np.asarray(sorted(map(tuple, pts))), want, atol=2e-3)


# flam3 embeds the variation weight INSIDE these formulas (random
# angles scaled by w*pi, w-radius discs, w-offset foci); every other
# variation contributes linearly in its weight.  Pinning the exact
# partition catches accidental weight-semantics changes in BOTH
# directions.
WEIGHT_NONLINEAR = {
    "arch", "blade", "flux", "lazysusan", "loonie", "radial_blur",
    "rays", "scry", "secant2", "twintrian", "whorl",
}


@pytest.mark.parametrize("name", ALL_VARIATIONS)
def test_weight_linearity_partition(name):
    tx, ty = _grid(12)
    params = {a: d + 0.23 for a, d in VARIATION_PARAMS[name]}
    d1x, d1y = _eval(name, tx, ty, w=0.4, params=params, seed=9)
    d2x, d2y = _eval(name, tx, ty, w=0.8, params=params, seed=9)
    lin = (np.allclose(d2x, 2 * d1x, rtol=2e-3, atol=2e-3)
           and np.allclose(d2y, 2 * d1y, rtol=2e-3, atol=2e-3))
    expected_lin = name not in WEIGHT_NONLINEAR
    assert lin == expected_lin, (
        f"{name}: weight-{'linear' if lin else 'nonlinear'}, expected "
        f"{'linear' if expected_lin else 'nonlinear'}")


class TestMoreInvariantsAndForms:
    W = 0.7

    def setup_method(self, _m):
        self.tx, self.ty = _grid(24)
        self.x = np.asarray(self.tx, np.float64)
        self.y = np.asarray(self.ty, np.float64)
        self.r2 = self.x**2 + self.y**2
        self.r = np.sqrt(self.r2)

    def test_conic_collinear_and_draw_recoverable(self):
        # flam3 conic: out = k*(rand - holes)*(x, y) with
        # k = w*ecc / ((1 + ecc*cos_t) * r); recovering rand from the
        # output must land in [0, 1]
        ecc, holes = 0.8, 0.2
        dx, dy = _eval("conic", self.tx, self.ty, w=self.W, seed=21,
                       params={"conic_eccentricity": ecc,
                               "conic_holes": holes})
        cross = dx * self.y - dy * self.x
        np.testing.assert_allclose(cross, 0.0, atol=1e-3)
        ct = self.x / self.r
        k = self.W * ecc / ((1.0 + ecc * ct) * self.r)
        rand = dx / (k * self.x) + holes
        assert rand.min() > -1e-3 and rand.max() < 1 + 1e-3
        assert rand.std() > 0.1          # actually random

    def test_parabola_draws_recoverable(self):
        h, wd = 0.9, 1.3
        dx, dy = _eval("parabola", self.tx, self.ty, w=self.W, seed=22,
                       params={"parabola_height": h,
                               "parabola_width": wd})
        rx = dx / (self.W * h * np.sin(self.r) ** 2)
        ry = dy / (self.W * wd * np.cos(self.r))
        for rand in (rx, ry):
            assert rand.min() > -1e-2 and rand.max() < 1 + 1e-2
            assert rand.std() > 0.1

    def test_edisc(self):
        # flam3 var48_edisc (deterministic); the magic constant is
        # flam3's own normalization
        tmp = self.r2 + 1.0
        tmp2 = 2.0 * self.x
        xmax = 0.5 * (np.sqrt(tmp + tmp2) + np.sqrt(tmp - tmp2))
        a1 = np.log(xmax + np.sqrt(np.maximum(xmax - 1.0, 0.0)))
        a2 = -np.arccos(np.clip(self.x / xmax, -1.0, 1.0))
        ww = self.W / 11.57034632
        snv = np.where(self.y > 0.0, -np.sin(a1), np.sin(a1))
        got_x, got_y = _eval("edisc", self.tx, self.ty, w=self.W)
        np.testing.assert_allclose(got_x, ww * np.cosh(a2) * np.cos(a1),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(got_y, ww * np.sinh(a2) * snv,
                                   rtol=2e-3, atol=2e-3)

    def test_curl_general(self):
        c1, c2 = 0.4, 0.3
        re = 1.0 + c1 * self.x + c2 * (self.x**2 - self.y**2)
        im = c1 * self.y + 2.0 * c2 * self.x * self.y
        d = re * re + im * im
        dx, dy = _eval("curl", self.tx, self.ty, w=self.W,
                       params={"curl_c1": c1, "curl_c2": c2})
        np.testing.assert_allclose(
            dx, self.W * (self.x * re + self.y * im) / d,
            rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            dy, self.W * (self.y * re - self.x * im) / d,
            rtol=2e-3, atol=2e-3)


def test_oscilloscope():
    """Apophysis oscilloscope plugin: points inside the damped-cosine
    envelope |y| <= amp*exp(-damp*|x|)*cos(2 pi f x) + sep flip their y;
    everything else passes through."""
    tx, ty = _grid(24)
    x = np.asarray(tx, np.float64)
    y = np.asarray(ty, np.float64)
    sep, freq, amp, damp = 0.6, 1.5, 0.8, 0.4
    t = amp * np.exp(-np.abs(x) * damp) * np.cos(2 * np.pi * freq * x) \
        + sep
    ey = np.where(np.abs(y) <= t, -y, y)
    got_x, got_y = _eval("oscilloscope", tx, ty, w=0.7,
                         params={"oscope_separation": sep,
                                 "oscope_frequency": freq,
                                 "oscope_amplitude": amp,
                                 "oscope_damping": damp})
    # mask points within 1e-3 of the envelope (flip boundary)
    safe = np.abs(np.abs(y) - t) > 1e-3
    np.testing.assert_allclose(got_x[safe], 0.7 * x[safe], rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(got_y[safe], 0.7 * ey[safe], rtol=2e-3,
                               atol=2e-3)
    assert (ey != y).any()     # both branches exercised


def test_unpolar_convention_inverts_polar():
    """DOCUMENTED CONVENTION (SURVEY.md §2c marks unpolar ≈): this
    build defines unpolar as the inverse of flam3's polar map
    (u, v) = (theta/pi, r-1)  ->  (x, y) = ((v+1) sin(pi u),
    (v+1) cos(pi u)), so unpolar(polar(p)) == p at unit weights.
    If flam3-binary output ever becomes available and disagrees,
    change the formula AND this test together."""
    tx, ty = _grid(16)
    x = np.asarray(tx, np.float64)
    y = np.asarray(ty, np.float64)
    # forward polar at w=1
    ux, uy = _eval("polar", tx, ty, w=1.0)
    # unpolar at w=1 must restore the input point
    rx, ry = _eval("unpolar", jnp.asarray(ux), jnp.asarray(uy), w=1.0)
    # exclude the branch cut (theta = +-pi) and the origin
    r = np.hypot(x, y)
    theta = np.arctan2(x, y)
    safe = (r > 0.05) & (np.abs(np.abs(theta) - np.pi) > 0.05)
    np.testing.assert_allclose(rx[safe], x[safe], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ry[safe], y[safe], rtol=1e-4, atol=1e-4)


class TestArchRaysTwintrianInvariants:
    """Per-sample algebraic invariants of the last three stochastic
    variations (flam3: random angle scaled by w*pi inside each)."""

    def test_arch(self):
        # out = (w sin a, w sin^2 a / cos a): recover sin a = dx/w;
        # then dy * cos a == w sin^2 a for every sample
        tx, ty = _grid(24)
        w = 0.6
        dx, dy = _eval("arch", tx, ty, w=w, seed=31)
        sa = dx / w
        assert np.abs(sa).max() <= 1 + 1e-5
        ca = np.sqrt(np.maximum(1 - sa * sa, 0.0))
        # w*pi < 2pi so cos of the angle can be negative; flam3 keeps
        # the signed cos — check the magnitude relation where cos is
        # comfortably nonzero
        safe = ca > 0.05
        np.testing.assert_allclose(np.abs(dy[safe]) * ca[safe],
                                   (w * sa * sa)[safe], rtol=1e-2,
                                   atol=1e-3)
        assert sa.std() > 0.1            # angle really random

    def test_rays(self):
        # fpx = tanr cos(tx), fpy = tanr sin(ty): the ratio recovers
        # tanr exactly, independent of the random draw
        tx, ty = _grid(24)
        x = np.asarray(tx, np.float64)
        y = np.asarray(ty, np.float64)
        dx, dy = _eval("rays", tx, ty, w=0.6, seed=32)
        safe = (np.abs(np.cos(x)) > 0.1) & (np.abs(np.sin(y)) > 0.1)
        t1 = dx[safe] / np.cos(x[safe])
        t2 = dy[safe] / np.sin(y[safe])
        np.testing.assert_allclose(t1, t2, rtol=1e-3, atol=1e-4)

    def test_twintrian(self):
        # dy - dx = -w*tx*sin(r)*pi with r random: the recovered sin(r)
        # must lie in [-1, 1] and vary across samples
        tx, ty = _grid(24)
        x = np.asarray(tx, np.float64)
        w = 0.6
        dx, dy = _eval("twintrian", tx, ty, w=w, seed=33)
        sr = (dx - dy) / (w * x * np.pi)
        assert np.abs(sr).max() <= 1 + 1e-4
        assert sr.std() > 0.05


def test_bent():
    tx, ty = _grid(24)
    x = np.asarray(tx, np.float64)
    y = np.asarray(ty, np.float64)
    dx, dy = _eval("bent", tx, ty, w=0.7)
    np.testing.assert_allclose(dx, 0.7 * np.where(x < 0, 2 * x, x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dy, 0.7 * np.where(y < 0, 0.5 * y, y),
                               rtol=1e-4, atol=1e-5)


def test_wedge_julia_cluster_count():
    """wedge_julia's random branch picks one of `power` julia roots;
    a fixed input point must land in at most power*count clusters."""
    B = 4096
    tx = jnp.full((B,), 0.7, jnp.float32)
    ty = jnp.full((B,), 0.4, jnp.float32)
    dx, dy = _eval("wedge_julia", tx, ty, w=1.0, seed=41,
                   params={"wedge_julia_power": 3.0,
                           "wedge_julia_count": 2.0,
                           "wedge_julia_angle": 0.3,
                           "wedge_julia_dist": 1.0})
    pts = np.unique(np.round(np.stack([dx, dy], 1), 3), axis=0)
    assert 1 < len(pts) <= 6, len(pts)


def test_pre_blur_perturbs_before_variations():
    """pre_blur jitters the INPUT point before the variation sum
    (SURVEY.md §2c): with linear+pre_blur the output scatters around
    the affine-transformed point with the pre_blur's gaussian-ish
    spread."""
    from cuburn_tpu.ops.xform import apply_variation_stack
    B = 8192
    tx = jnp.full((B,), 0.4, jnp.float32)
    ty = jnp.full((B,), -0.2, jnp.float32)
    stream = rng_mod.RngStream(rng_mod.seed(jax.random.PRNGKey(2), B))
    vw = jnp.stack([jnp.ones((B,)), jnp.full((B,), 0.5)], 1)
    ox, oy = apply_variation_stack(
        ("linear", "pre_blur"), (), tx, ty, vw,
        jnp.zeros((B, 1)),
        jnp.stack([jnp.full((B,), v) for v in
                   (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)], 1), stream)
    ox, oy = np.asarray(ox), np.asarray(oy)
    assert abs(ox.mean() - 0.4) < 0.02 and abs(oy.mean() + 0.2) < 0.02
    assert ox.std() > 0.05 and oy.std() > 0.05

    # the linear stack above cannot distinguish PRE from additive
    # (f(x+j) == f(x)+j when f is identity) — pin the ordering with a
    # NONLINEAR variation: spherical at |x|=3 with pre_blur w=0.5.
    # PRE semantics: out = (x+j)/|x+j|^2, spread ~ std(|j|)/9 ≈ 0.03;
    # additive would add 0.5*j directly, spread ≈ 0.29 — 10x apart.
    tx3 = jnp.full((B,), 3.0, jnp.float32)
    ty3 = jnp.zeros((B,), jnp.float32)
    stream2 = rng_mod.RngStream(rng_mod.seed(jax.random.PRNGKey(5), B))
    ox3, oy3 = apply_variation_stack(
        ("spherical", "pre_blur"), (), tx3, ty3, vw,
        jnp.zeros((B, 1)),
        jnp.stack([jnp.full((B,), v) for v in
                   (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)], 1), stream2)
    ox3, oy3 = np.asarray(ox3), np.asarray(oy3)
    assert abs(ox3.mean() - 1.0 / 3.0) < 0.02
    assert abs(oy3.mean()) < 0.02
    assert ox3.std() < 0.1 and oy3.std() < 0.1, \
        (ox3.std(), oy3.std(), "pre_blur applied additively?")
    assert ox3.std() > 1e-4                     # jitter did happen
