"""Independent NumPy chaos-game renderer for differential testing.

Written directly from the published flam3 algorithm (Draves & Reckase,
*The Fractal Flame Algorithm*; SURVEY.md §1/§3.5) with NO code shared
with cuburn_tpu's device pipeline — its own RNG, its own xform
selection, its own variation formulas, its own camera.  It exists to
anchor the JAX pipeline's SEMANTICS end to end: two implementations of
the same genome must produce the same attractor density distribution
(up to chaos-game sampling noise), even though their random streams
differ (tests/test_render.py::TestIndependentReference).

Deliberately slow and tiny-image only.
"""

from __future__ import annotations

import numpy as np

# independent variation formulas (flam3 paper; theta = atan2(x, y));
# each takes (x, y, r2, rng, P, aff) — rng only used by the stochastic
# ones, P(name) reads a parametric knob, aff is the xform's OWN affine
# row (the affine-dependent family reads its c/f translation terms)
def _julia(x, y, r2, rng, P, aff):
    # sqrt(r) at theta/2 plus a random half-turn (flam3's coin flip)
    a = 0.5 * np.arctan2(x, y) + np.pi * rng.randint(0, 2, x.shape)
    r = np.power(r2, 0.25)
    return r * np.cos(a), r * np.sin(a)


def _julian(x, y, r2, rng, P, aff):
    # flam3 julian: random branch of the power-th root, radius
    # exponent dist/power (theta here is atan2(y, x) — the julia
    # FAMILY uses the mathematical angle, unlike the atan2(x, y)
    # variations)
    # fractional powers are legal: flam3 draws the branch as
    # trunc(|power| * rand01) — the TOP branch carries the fractional
    # probability — and divides the angle / exponent by the true
    # float power (the round-3 fuzz caught an int-rounded version of
    # this diverging at power 4.49)
    power = np.float64(P("julian_power"))
    dist = P("julian_dist")
    t_rnd = np.trunc(np.abs(power) * rng.uniform(0, 1, x.shape))
    a = (np.arctan2(y, x) + 2.0 * np.pi * t_rnd) / power
    r = np.power(r2 + 1e-30, dist / (2.0 * power))
    return r * np.cos(a), r * np.sin(a)


def _pdj(x, y, r2, rng, P, aff):
    return (np.sin(P("pdj_a") * y) - np.cos(P("pdj_b") * x),
            np.sin(P("pdj_c") * x) - np.cos(P("pdj_d") * y))


def _popcorn(x, y, r2, rng, P, aff):
    # affine-dependent: perturbation amplitudes are the xform's own
    # affine translation coefficients c and f
    return (x + aff[2] * np.sin(np.tan(3.0 * y)),
            y + aff[5] * np.sin(np.tan(3.0 * x)))


def _rings(x, y, r2, rng, P, aff):
    # affine-dependent: ring pitch from the affine's c^2; flam3 quirk
    # (the spec, CLAUDE.md): output uses (cos, sin) of theta =
    # atan2(x, y)
    dx = aff[2] * aff[2] + 1e-10
    r = np.sqrt(r2)
    theta = np.arctan2(x, y)
    rr = np.mod(r + dx, 2.0 * dx) - dx + r * (1.0 - dx)
    return rr * np.cos(theta), rr * np.sin(theta)


def _gaussian_blur(x, y, r2, rng, P, aff):
    # sum of 4 uniforms - 2 (flam3's cheap gaussian), random angle;
    # ignores the input point entirely
    r = (rng.uniform(0, 1, (4,) + x.shape).sum(axis=0) - 2.0)
    a = rng.uniform(0, 2.0 * np.pi, x.shape)
    return r * np.cos(a), r * np.sin(a)


def _disc(x, y, r2, rng, P, aff):
    theta = np.arctan2(x, y)
    r = np.sqrt(r2)
    return (theta / np.pi * np.sin(np.pi * r),
            theta / np.pi * np.cos(np.pi * r))


def _fisheye(x, y, r2, rng, P, aff):
    # the famous swapped-output quirk (eyefish is the fixed version)
    s = 2.0 / (np.sqrt(r2) + 1.0)
    return s * y, s * x


def _polar(x, y, r2, rng, P, aff):
    return np.arctan2(x, y) / np.pi, np.sqrt(r2) - 1.0


def _handkerchief(x, y, r2, rng, P, aff):
    r = np.sqrt(r2)
    theta = np.arctan2(x, y)
    return r * np.sin(theta + r), r * np.cos(theta - r)


def _heart(x, y, r2, rng, P, aff):
    r = np.sqrt(r2)
    a = np.arctan2(x, y) * r
    return r * np.sin(a), -r * np.cos(a)


def _spiral(x, y, r2, rng, P, aff):
    r = np.sqrt(r2)
    theta = np.arctan2(x, y)
    return ((np.cos(theta) + np.sin(r)) / (r + 1e-12),
            (np.sin(theta) - np.cos(r)) / (r + 1e-12))


def _hyperbolic(x, y, r2, rng, P, aff):
    r = np.sqrt(r2)
    theta = np.arctan2(x, y)
    return np.sin(theta) / (r + 1e-12), np.cos(theta) * r


def _diamond(x, y, r2, rng, P, aff):
    r = np.sqrt(r2)
    theta = np.arctan2(x, y)
    return np.sin(theta) * np.cos(r), np.cos(theta) * np.sin(r)


def _ex(x, y, r2, rng, P, aff):
    r = np.sqrt(r2)
    theta = np.arctan2(x, y)
    m0 = np.sin(theta + r) ** 3 * r
    m1 = np.cos(theta - r) ** 3 * r
    return m0 + m1, m0 - m1


def _blob(x, y, r2, rng, P, aff):
    # parametric petal modulation; note (sin, cos) output order —
    # blob is NOT in the swapped (cos, sin) family (rings/fan are)
    lo, hi, waves = P("blob_low"), P("blob_high"), P("blob_waves")
    r = np.sqrt(r2)
    theta = np.arctan2(x, y)
    rr = r * (lo + (hi - lo) * (0.5 + 0.5 * np.sin(waves * theta)))
    return rr * np.sin(theta), rr * np.cos(theta)


def _fan2(x, y, r2, rng, P, aff):
    # parametric fan; the fold uses a C (int) cast — truncation toward
    # zero, NOT floor (the flam3 quirk that IS the spec, CLAUDE.md)
    dx = np.pi * (P("fan2_x") ** 2 + 1e-10)
    dy = P("fan2_y")
    dx2 = 0.5 * dx
    theta = np.arctan2(x, y)
    r = np.sqrt(r2)
    t = theta + dy - dx * np.trunc((theta + dy) / dx)
    a = np.where(t > dx2, theta - dx2, theta + dx2)
    return r * np.sin(a), r * np.cos(a)


def _rings2(x, y, r2, rng, P, aff):
    # parametric rings with the same int-cast truncation fold
    val = P("rings2_val")
    dx = val * val + 1e-10
    r = np.sqrt(r2)
    theta = np.arctan2(x, y)
    rr = r - 2.0 * dx * np.trunc((r + dx) / (2.0 * dx)) \
        + r * (1.0 - dx)
    return rr * np.sin(theta), rr * np.cos(theta)


def _curl(x, y, r2, rng, P, aff):
    # parametric complex inversion 1 / (1 + c1 z + c2 z^2)
    c1, c2 = P("curl_c1"), P("curl_c2")
    re = 1.0 + c1 * x + c2 * (x * x - y * y)
    im = c1 * y + 2.0 * c2 * x * y
    s = 1.0 / (re * re + im * im + 1e-10)
    return s * (x * re + y * im), s * (y * re - x * im)


def _fan(x, y, r2, rng, P, aff):
    # affine-dependent sibling of fan2: pitch from the affine's own c
    # term, offset from f, fold via C fmod (sign follows the
    # dividend), and the flam3 quirk output order (cos, sin) — unlike
    # fan2's (sin, cos) (CLAUDE.md: rings/fan emit (cos,sin))
    dx = np.pi * (aff[2] * aff[2] + 1e-10)
    dy = aff[5]
    dx2 = 0.5 * dx
    theta = np.arctan2(x, y)
    r = np.sqrt(r2)
    a = np.where(np.fmod(theta + dy, dx) > dx2,
                 theta - dx2, theta + dx2)
    return r * np.cos(a), r * np.sin(a)


def _boarders(x, y, r2, rng, P, aff):
    # stochastic 25/75 split (the flam3 quirk that IS the spec,
    # CLAUDE.md): rand >= 0.75 draws the shrunken cell CORE (25%),
    # else the cell rim at +-0.25 with the offset-slope preserved.
    # rint = C round-half-to-even.
    rx_, ry_ = np.rint(x), np.rint(y)
    ox_, oy_ = x - rx_, y - ry_
    core = rng.uniform(0, 1, x.shape) >= 0.75
    cx_, cy_ = ox_ * 0.5 + rx_, oy_ * 0.5 + ry_
    with np.errstate(divide="ignore", invalid="ignore"):
        slope_yx = np.where(ox_ != 0, oy_ / ox_, 0.0)
        slope_xy = np.where(oy_ != 0, ox_ / oy_, 0.0)
    sgn_x = np.where(ox_ >= 0, 1.0, -1.0)
    sgn_y = np.where(oy_ >= 0, 1.0, -1.0)
    bx_h = ox_ * 0.5 + rx_ + 0.25 * sgn_x
    by_h = oy_ * 0.5 + ry_ + 0.25 * slope_yx * sgn_x
    by_v = oy_ * 0.5 + ry_ + 0.25 * sgn_y
    bx_v = ox_ * 0.5 + rx_ + 0.25 * slope_xy * sgn_y
    horiz = np.abs(ox_) >= np.abs(oy_)
    bx = np.where(horiz, bx_h, bx_v)
    by = np.where(horiz, by_h, by_v)
    return np.where(core, cx_, bx), np.where(core, cy_, by)


def _disc2(x, y, r2, rng, P, aff):
    # parametric disc: rotation rate rot*pi on (x+y), twist folded
    # into additive sin/cos offsets with flam3's beyond-2pi rescale
    rot, twist = P("disc2_rot"), P("disc2_twist")
    sinadd, cosadd = np.sin(twist), np.cos(twist) - 1.0
    if twist > 2.0 * np.pi:
        k = 1.0 + twist - 2.0 * np.pi
        sinadd *= k
        cosadd *= k
    if twist < -2.0 * np.pi:
        k = 1.0 + twist + 2.0 * np.pi
        sinadd *= k
        cosadd *= k
    t = rot * np.pi * (x + y)
    r = np.arctan2(x, y) / np.pi
    return r * (np.sin(t) + cosadd), r * (np.cos(t) + sinadd)


def _escher(x, y, r2, rng, P, aff):
    # complex-log spiral z^(vc + i vd) with vc,vd from beta on the
    # unit circle; mathematical angle atan2(y, x)
    beta = P("escher_beta")
    a = np.arctan2(y, x)
    lnr = 0.5 * np.log(r2 + 1e-300)
    vc = 0.5 * (1.0 + np.cos(beta))
    vd = 0.5 * np.sin(beta)
    m = np.exp(vc * lnr - vd * a)
    n = vc * a + vd * lnr
    return m * np.cos(n), m * np.sin(n)


def _mobius(x, y, r2, rng, P, aff):
    # complex Möbius (a z + b) / (c z + d)
    re_u = P("mobius_re_a") * x - P("mobius_im_a") * y \
        + P("mobius_re_b")
    im_u = P("mobius_re_a") * y + P("mobius_im_a") * x \
        + P("mobius_im_b")
    re_v = P("mobius_re_c") * x - P("mobius_im_c") * y \
        + P("mobius_re_d")
    im_v = P("mobius_re_c") * y + P("mobius_im_c") * x \
        + P("mobius_im_d")
    s = 1.0 / (re_v * re_v + im_v * im_v + 1e-300)
    return (s * (re_u * re_v + im_u * im_v),
            s * (im_u * re_v - re_u * im_v))


def _modulus(x, y, r2, rng, P, aff):
    # wrap coordinates into [-mx, mx] x [-my, my] via C fmod
    mx, my = P("modulus_x"), P("modulus_y")
    xr, yr = 2.0 * mx, 2.0 * my
    ox_ = np.where(
        x > mx, -mx + np.fmod(x + mx, xr),
        np.where(x < -mx, mx - np.fmod(mx - x, xr), x))
    oy_ = np.where(
        y > my, -my + np.fmod(y + my, yr),
        np.where(y < -my, my - np.fmod(my - y, yr), y))
    return ox_, oy_


def _waves(x, y, r2, rng, P, aff):
    # affine-dependent: amplitudes from the xform's own b/e terms,
    # frequencies from 1/(c^2), 1/(f^2) (completes the
    # affine-dependent family: popcorn, rings, fan, waves)
    return (x + aff[1] * np.sin(y / (aff[2] * aff[2] + 1e-10)),
            y + aff[4] * np.sin(x / (aff[5] * aff[5] + 1e-10)))


def _bent(x, y, r2, rng, P, aff):
    # quadrant-wise rescale: negative x doubles, negative y halves
    return (np.where(x < 0, 2.0 * x, x),
            np.where(y < 0, 0.5 * y, y))


def _elliptic(x, y, r2, rng, P, aff):
    # inverse elliptic coordinates; the two clamped sqrts and the
    # sign-of-y branch are the spec
    tmp = r2 + 1.0
    x2 = 2.0 * x
    xmax = 0.5 * (np.sqrt(tmp + x2) + np.sqrt(tmp - x2))
    a = x / xmax
    b = np.sqrt(np.maximum(1.0 - a * a, 0.0))
    ssx = np.sqrt(np.maximum(xmax - 1.0, 0.0))
    s = 1.0 / (np.pi / 2.0)
    return (s * np.arctan2(a, b),
            np.where(y > 0, 1.0, -1.0) * s * np.log(xmax + ssx))


def _juliascope(x, y, r2, rng, P, aff):
    # random branch of the power-th root where the BRANCH-INDEX PARITY
    # decides the angle reflection (flam3; the round-3 bug class the
    # unit test pinned — this anchors it end-to-end)
    power = np.float64(P("juliascope_power"))
    dist = P("juliascope_dist")
    t_rnd = np.trunc(np.abs(power) * rng.uniform(0, 1, x.shape))
    atanyx = np.arctan2(y, x)
    a = np.where(t_rnd % 2 == 1,
                 (-atanyx + 2.0 * np.pi * t_rnd) / power,
                 (atanyx + 2.0 * np.pi * t_rnd) / power)
    r = np.power(r2 + 1e-30, dist / (2.0 * power))
    return r * np.cos(a), r * np.sin(a)


def _wedge_julia(x, y, r2, rng, P, aff):
    # random root branch, then the wedge fold: slice index c from the
    # branch angle, compress by cf and fan out by angle*c
    angle = P("wedge_julia_angle")
    count = P("wedge_julia_count")
    power = np.float64(P("wedge_julia_power"))
    dist = P("wedge_julia_dist")
    cf = 1.0 - angle * count * (1.0 / np.pi) * 0.5
    cn = dist / (2.0 * power)
    r = np.power(r2 + 1e-30, cn)
    t_rnd = np.trunc(np.abs(power) * rng.uniform(0, 1, x.shape))
    a = (np.arctan2(y, x) + 2.0 * np.pi * t_rnd) / power
    c = np.floor((count * a + np.pi) * (1.0 / np.pi) * 0.5)
    a = a * cf + c * angle
    return r * np.cos(a), r * np.sin(a)


def _cpow(x, y, r2, rng, P, aff):
    # complex power z^((r + i*i_)/power) with a random branch of the
    # power-th root
    # np.float64: a zero power must yield inf/nan for the badvalue
    # respawn (device semantics), not ZeroDivisionError
    power = np.float64(P("cpow_power"))
    vc = P("cpow_r") / power
    vd = P("cpow_i") / power
    va = 2.0 * np.pi / power
    a = np.arctan2(y, x)
    lnr = 0.5 * np.log(r2 + 1e-300)
    ang = vc * a + vd * lnr \
        + va * np.floor(power * rng.uniform(0, 1, x.shape))
    m = np.exp(vc * lnr - vd * a)
    return m * np.cos(ang), m * np.sin(ang)


def _super_shape(x, y, r2, rng, P, aff):
    # Gielis superformula radius modulation; rnd blends a uniform
    # radius into the point's own
    m, n1 = P("super_shape_m"), np.float64(P("super_shape_n1"))
    n2, n3 = P("super_shape_n2"), P("super_shape_n3")
    holes, rnd = P("super_shape_holes"), P("super_shape_rnd")
    theta = (m / 4.0) * np.arctan2(y, x) + np.pi / 4.0
    t1 = np.abs(np.cos(theta)) ** n2
    t2 = np.abs(np.sin(theta)) ** n3
    r = np.sqrt(r2) + 1e-300
    rr = (rnd * rng.uniform(0, 1, x.shape) + (1.0 - rnd) * r - holes) \
        * np.power(t1 + t2, -1.0 / n1) / r
    return rr * x, rr * y


def _square(x, y, r2, rng, P, aff):
    # uniform unit cell centered on the origin; input ignored
    return (rng.uniform(0, 1, x.shape) - 0.5,
            rng.uniform(0, 1, x.shape) - 0.5)


def _blur(x, y, r2, rng, P, aff):
    # uniform disc: random angle FIRST then radius (flam3 draw order
    # doesn't matter distributionally, but keep r uniform NOT
    # area-uniform — the density spikes at the center by design)
    a = rng.uniform(0, 2.0 * np.pi, x.shape)
    r = rng.uniform(0, 1, x.shape)
    return r * np.cos(a), r * np.sin(a)


def _stripes(x, y, r2, rng, P, aff):
    # snap x toward integer stripes, bow y by the squared offset
    space, warp = P("stripes_space"), P("stripes_warp")
    roundx = np.floor(x + 0.5)
    offsetx = x - roundx
    return (offsetx * (1.0 - space) + roundx,
            y + offsetx * offsetx * warp)


def _bent2(x, y, r2, rng, P, aff):
    return (np.where(x < 0, x * P("bent2_x"), x),
            np.where(y < 0, y * P("bent2_y"), y))


def _bipolar(x, y, r2, rng, P, aff):
    # complex bipolar coordinates with the shift folded back into
    # (-pi/2, pi/2] by C fmod
    t = r2 + 1.0
    x2 = 2.0 * x
    ps = -(np.pi / 2.0) * P("bipolar_shift")
    yy = 0.5 * np.arctan2(2.0 * y, r2 - 1.0) + ps
    yy = np.where(yy > np.pi / 2.0,
                  -np.pi / 2.0 + np.fmod(yy + np.pi / 2.0, np.pi),
                  np.where(yy < -np.pi / 2.0,
                           np.pi / 2.0 - np.fmod(np.pi / 2.0 - yy,
                                                 np.pi),
                           yy))
    den = np.maximum(t - x2, 1e-300)
    return (0.25 * (2.0 / np.pi) * np.log((t + x2) / den),
            (2.0 / np.pi) * yy)


def _cell(x, y, r2, rng, P, aff):
    # interleave grid cells into the first quadrant pattern; note the
    # NEGATED y output (flam3)
    size = P("cell_size")
    inv = 1.0 / size
    cx_ = np.floor(x * inv)
    cy_ = np.floor(y * inv)
    dx_ = x - cx_ * size
    dy_ = y - cy_ * size
    cx2 = np.where(cx_ >= 0, 2.0 * cx_, -(2.0 * cx_ + 1.0))
    cy2 = np.where(cy_ >= 0, 2.0 * cy_, -(2.0 * cy_ + 1.0))
    return dx_ + cx2 * size, -(dy_ + cy2 * size)


def _rectangles(x, y, r2, rng, P, aff):
    rx_, ry_ = P("rectangles_x"), P("rectangles_y")
    ox_ = x if rx_ == 0 else \
        (2.0 * np.floor(x / rx_) + 1.0) * rx_ - x
    oy_ = y if ry_ == 0 else \
        (2.0 * np.floor(y / ry_) + 1.0) * ry_ - y
    return ox_, oy_


def _separation(x, y, r2, rng, P, aff):
    sx2 = P("separation_x") ** 2
    sy2 = P("separation_y") ** 2
    xin, yin = P("separation_xinside"), P("separation_yinside")
    ox_ = np.where(x > 0, np.sqrt(x * x + sx2) - x * xin,
                   -(np.sqrt(x * x + sx2) + x * xin))
    oy_ = np.where(y > 0, np.sqrt(y * y + sy2) - y * yin,
                   -(np.sqrt(y * y + sy2) + y * yin))
    return ox_, oy_


def _split(x, y, r2, rng, P, aff):
    # each output keeps or flips the OTHER coordinate's sign by a
    # cosine stripe test
    sy = np.where(np.cos(x * P("split_xsize") * np.pi) >= 0, y, -y)
    sx = np.where(np.cos(y * P("split_ysize") * np.pi) >= 0, x, -x)
    return sx, sy


def _splits(x, y, r2, rng, P, aff):
    return (np.where(x >= 0, x + P("splits_x"), x - P("splits_x")),
            np.where(y >= 0, y + P("splits_y"), y - P("splits_y")))


def _popcorn2(x, y, r2, rng, P, aff):
    c = P("popcorn2_c")
    return (x + P("popcorn2_x") * np.sin(np.tan(y * c)),
            y + P("popcorn2_y") * np.sin(np.tan(x * c)))


def _waves2(x, y, r2, rng, P, aff):
    return (x + P("waves2_scalex") * np.sin(y * P("waves2_freqx")),
            y + P("waves2_scaley") * np.sin(x * P("waves2_freqy")))


def _curve(x, y, r2, rng, P, aff):
    xl = max(P("curve_xlength") ** 2, 1e-20)
    yl = max(P("curve_ylength") ** 2, 1e-20)
    return (x + P("curve_xamp") * np.exp(-y * y / xl),
            y + P("curve_yamp") * np.exp(-x * x / yl))


def _auger(x, y, r2, rng, P, aff):
    freq, aw = P("auger_freq"), P("auger_weight")
    scale, sym = P("auger_scale"), P("auger_sym")
    s = np.sin(freq * x)
    t = np.sin(freq * y)
    dy_ = y + aw * (scale * s * 0.5 + np.abs(y) * s)
    dx_ = x + aw * (scale * t * 0.5 + np.abs(x) * t)
    return x + sym * (dx_ - x), dy_


def _conic(x, y, r2, rng, P, aff):
    # polar conic r = e/(1 + e cos theta) with the focus at the
    # origin, theta from the +x axis; random radial jitter minus holes
    ecc, holes = P("conic_eccentricity"), P("conic_holes")
    r = np.sqrt(r2) + 1e-300
    ct = x / r
    s = (rng.uniform(0, 1, x.shape) - holes) * ecc \
        / (1.0 + ecc * ct) / r
    return s * x, s * y


def _flower(x, y, r2, rng, P, aff):
    petals, holes = P("flower_petals"), P("flower_holes")
    theta = np.arctan2(y, x)
    r = np.sqrt(r2) + 1e-300
    s = (rng.uniform(0, 1, x.shape) - holes) \
        * np.cos(petals * theta) / r
    return s * x, s * y


def _parabola(x, y, r2, rng, P, aff):
    # two INDEPENDENT rand draws, one per coordinate
    r = np.sqrt(r2)
    sr, cr = np.sin(r), np.cos(r)
    return (P("parabola_height") * sr * sr
            * rng.uniform(0, 1, x.shape),
            P("parabola_width") * cr * rng.uniform(0, 1, x.shape))


def _edisc(x, y, r2, rng, P, aff):
    # elliptic disc: flam3's 11.57034632 normalization and the
    # sign-of-y flip on sin(a1)
    tmp = r2 + 1.0
    tmp2 = 2.0 * x
    r1 = np.sqrt(np.maximum(tmp + tmp2, 0.0))
    rr2 = np.sqrt(np.maximum(tmp - tmp2, 0.0))
    xmax = 0.5 * (r1 + rr2)
    a1 = np.log(xmax + np.sqrt(np.maximum(xmax - 1.0, 0.0)))
    a2 = -np.arccos(np.clip(x / np.maximum(xmax, 1e-300), -1.0, 1.0))
    snv, csv = np.sin(a1), np.cos(a1)
    snhu, cshu = np.sinh(a2), np.cosh(a2)
    snv = np.where(y > 0, -snv, snv)
    s = 1.0 / 11.57034632
    return s * cshu * csv, s * snhu * snv


def _foci(x, y, r2, rng, P, aff):
    expx = np.exp(x) * 0.5
    expnx = 0.25 / expx
    den = expx + expnx - np.cos(y)
    den = np.where(np.abs(den) < 1e-300, 1e-300, den)
    return (expx - expnx) / den, np.sin(y) / den


def _ngon(x, y, r2, rng, P, aff):
    sides, power = np.float64(P("ngon_sides")), P("ngon_power")
    circle, corners = P("ngon_circle"), P("ngon_corners")
    r_factor = np.power(r2 + 1e-300, power / 2.0)
    theta = np.arctan2(y, x)
    b = 2.0 * np.pi / sides
    phi = theta - b * np.floor(theta / b)
    phi = np.where(phi > b * 0.5, phi - b, phi)
    amp = (corners * (1.0 / (np.cos(phi) + 1e-10) - 1.0) + circle) \
        / (r_factor + 1e-10)
    return amp * x, amp * y


def _perspective(x, y, r2, rng, P, aff):
    ang, dist = P("perspective_angle"), P("perspective_dist")
    vsin = np.sin(ang * np.pi / 2.0)
    vfcos = dist * np.cos(ang * np.pi / 2.0)
    den = dist - y * vsin
    den = np.where(np.abs(den) < 1e-300, 1e-300, den)
    return dist * x / den, vfcos * y / den


def _polar2(x, y, r2, rng, P, aff):
    return (np.arctan2(x, y) / np.pi,
            np.log(r2 + 1e-300) / (2.0 * np.pi))


def _wedge(x, y, r2, rng, P, aff):
    angle, hole = P("wedge_angle"), P("wedge_hole")
    count, swirl = P("wedge_count"), P("wedge_swirl")
    r = np.sqrt(r2)
    a = np.arctan2(y, x) + swirl * r
    c = np.floor((count * a + np.pi) * (1.0 / np.pi) * 0.5)
    a = a * (1.0 - angle * count * (1.0 / np.pi) * 0.5) + c * angle
    return (r + hole) * np.cos(a), (r + hole) * np.sin(a)


def _wedge_sph(x, y, r2, rng, P, aff):
    # wedge on the INVERTED radius 1/r
    angle, hole = P("wedge_sph_angle"), P("wedge_sph_hole")
    count, swirl = P("wedge_sph_count"), P("wedge_sph_swirl")
    rr = 1.0 / (np.sqrt(r2) + 1e-10)
    a = np.arctan2(y, x) + swirl * rr
    c = np.floor((count * a + np.pi) * (1.0 / np.pi) * 0.5)
    a = a * (1.0 - angle * count * (1.0 / np.pi) * 0.5) + c * angle
    return (rr + hole) * np.cos(a), (rr + hole) * np.sin(a)


def _oscilloscope(x, y, r2, rng, P, aff):
    # DOCUMENTED CONVENTION (test_variations.py test_oscilloscope):
    # points inside the damped-cosine envelope flip their y
    sep, freq = P("oscope_separation"), P("oscope_frequency")
    amp, damp = P("oscope_amplitude"), P("oscope_damping")
    tpf = 2.0 * np.pi * freq
    if damp == 0.0:
        t = amp * np.cos(tpf * x) + sep
    else:
        t = amp * np.exp(-np.abs(x) * damp) * np.cos(tpf * x) + sep
    return x, np.where(np.abs(y) <= t, -y, y)


def _unpolar(x, y, r2, rng, P, aff):
    # DOCUMENTED CONVENTION (test_variations.py
    # test_unpolar_convention_inverts_polar): the inverse of polar
    r = y + 1.0
    a = np.pi * x
    return r * np.sin(a), r * np.cos(a)


def _bubble(x, y, r2, rng, P, aff):
    s = 1.0 / (0.25 * r2 + 1.0)
    return s * x, s * y


def _butterfly(x, y, r2, rng, P, aff):
    # flam3's constant is 4/sqrt(3*pi); note y enters doubled BOTH in
    # the radius denominator and the output
    y2 = 2.0 * y
    r = 1.3029400317411197 * np.sqrt(
        np.abs(x * y) / (1e-10 + x * x + y2 * y2))
    return r * x, r * y2


def _cylinder(x, y, r2, rng, P, aff):
    return np.sin(x), y


def _cosine(x, y, r2, rng, P, aff):
    return (np.cos(np.pi * x) * np.cosh(y),
            -np.sin(np.pi * x) * np.sinh(y))


def _exponential(x, y, r2, rng, P, aff):
    m = np.exp(x - 1.0)
    return m * np.cos(np.pi * y), m * np.sin(np.pi * y)


def _power(x, y, r2, rng, P, aff):
    # r^sin(theta) along the unit direction, theta = atan2(x, y) so
    # sina = x/r, cosa = y/r (flam3 precalc)
    r = np.sqrt(r2) + 1e-300
    sina, cosa = x / r, y / r
    rr = np.power(r, sina)
    return rr * cosa, rr * sina


def _eyefish(x, y, r2, rng, P, aff):
    # fisheye with the output swap FIXED (the historical pair)
    s = 2.0 / (np.sqrt(r2) + 1.0)
    return s * x, s * y


def _tangent(x, y, r2, rng, P, aff):
    cy = np.cos(y)
    cy = np.where(np.abs(cy) < 1e-300, 1e-300, cy)
    return np.sin(x) / cy, np.tan(y)


def _cross(x, y, r2, rng, P, aff):
    d = x * x - y * y
    s = np.sqrt(1.0 / (d * d + 1e-10))
    return s * x, s * y


def _noise(x, y, r2, rng, P, aff):
    r = rng.uniform(0, 1, x.shape)
    a = rng.uniform(0, 2.0 * np.pi, x.shape)
    return x * r * np.cos(a), y * r * np.sin(a)


# the complex trig/hyperbolic family: textbook complex functions of
# z = x + iy (flam3 implements them straight)... except coth, whose
# flam3 code emits the CONJUGATE (+sin 2y) — the quirk that IS the
# spec (CLAUDE.md)
def _c_sin(x, y, r2, rng, P, aff):
    return np.sin(x) * np.cosh(y), np.cos(x) * np.sinh(y)


def _c_cos(x, y, r2, rng, P, aff):
    return np.cos(x) * np.cosh(y), -np.sin(x) * np.sinh(y)


def _c_tan(x, y, r2, rng, P, aff):
    den = np.cos(2 * x) + np.cosh(2 * y)
    den = np.where(np.abs(den) < 1e-300, 1e-300, den)
    return np.sin(2 * x) / den, np.sinh(2 * y) / den


def _c_sec(x, y, r2, rng, P, aff):
    den = np.cos(2 * x) + np.cosh(2 * y)
    den = np.where(np.abs(den) < 1e-300, 1e-300, den)
    return (2.0 * np.cos(x) * np.cosh(y) / den,
            2.0 * np.sin(x) * np.sinh(y) / den)


def _c_csc(x, y, r2, rng, P, aff):
    den = np.cosh(2 * y) - np.cos(2 * x)
    den = np.where(np.abs(den) < 1e-300, 1e-300, den)
    return (2.0 * np.sin(x) * np.cosh(y) / den,
            -2.0 * np.cos(x) * np.sinh(y) / den)


def _c_cot(x, y, r2, rng, P, aff):
    den = np.cosh(2 * y) - np.cos(2 * x)
    den = np.where(np.abs(den) < 1e-300, 1e-300, den)
    return np.sin(2 * x) / den, -np.sinh(2 * y) / den


def _c_sinh(x, y, r2, rng, P, aff):
    return np.sinh(x) * np.cos(y), np.cosh(x) * np.sin(y)


def _c_cosh(x, y, r2, rng, P, aff):
    return np.cosh(x) * np.cos(y), np.sinh(x) * np.sin(y)


def _c_tanh(x, y, r2, rng, P, aff):
    den = np.cosh(2 * x) + np.cos(2 * y)
    den = np.where(np.abs(den) < 1e-300, 1e-300, den)
    return np.sinh(2 * x) / den, np.sin(2 * y) / den


def _c_sech(x, y, r2, rng, P, aff):
    den = np.cosh(2 * x) + np.cos(2 * y)
    den = np.where(np.abs(den) < 1e-300, 1e-300, den)
    return (2.0 * np.cosh(x) * np.cos(y) / den,
            -2.0 * np.sinh(x) * np.sin(y) / den)


def _c_csch(x, y, r2, rng, P, aff):
    den = np.cosh(2 * x) - np.cos(2 * y)
    den = np.where(np.abs(den) < 1e-300, 1e-300, den)
    return (2.0 * np.sinh(x) * np.cos(y) / den,
            -2.0 * np.cosh(x) * np.sin(y) / den)


def _c_coth(x, y, r2, rng, P, aff):
    # true coth emits -sin 2y; flam3 ships the conjugate (+sin 2y)
    den = np.cosh(2 * x) - np.cos(2 * y)
    den = np.where(np.abs(den) < 1e-300, 1e-300, den)
    return np.sinh(2 * x) / den, np.sin(2 * y) / den


def _c_exp(x, y, r2, rng, P, aff):
    m = np.exp(x)
    return m * np.cos(y), m * np.sin(y)


def _c_log(x, y, r2, rng, P, aff):
    return 0.5 * np.log(r2 + 1e-300), np.arctan2(y, x)


# weight-NONLINEAR variations (w appears inside the formula, not as a
# scale factor): the harness passes w and adds the result unscaled
def _lazysusan(x, y, r2, rng, P, aff, w):
    # disc of radius w around (x0, -y0) spins/twists; outside points
    # scale by 1 + space/r.  The +-x0/y0 recentering terms are NOT
    # weight-scaled (flam3; why ops/xform.py gates additive terms on
    # w != 0)
    lx, ly = P("lazysusan_x"), P("lazysusan_y")
    xx, yy = x - lx, y + ly
    r = np.sqrt(xx * xx + yy * yy)
    inside = r < w
    a = np.arctan2(yy, xx) + P("lazysusan_spin") \
        + P("lazysusan_twist") * (w - r)
    rin = w * r
    rout = w * (1.0 + P("lazysusan_space") / (r + 1e-300))
    return (np.where(inside, rin * np.cos(a) + lx, rout * xx + lx),
            np.where(inside, rin * np.sin(a) - ly, rout * yy - ly))


_lazysusan.needs_weight = True


def _whorl(x, y, r2, rng, P, aff, w):
    # angle swirl 1/(w - r): inside pole attracts, outside the
    # NEGATIVE denominator counter-rotates (flam3 spec, kept exact)
    r = np.sqrt(r2)
    den = w - r
    den = np.where(den != 0.0, den, 1e-300)
    a = np.arctan2(y, x) + np.where(r < w, P("whorl_inside"),
                                    P("whorl_outside")) / den
    return w * r * np.cos(a), w * r * np.sin(a)


_whorl.needs_weight = True


def _scry(x, y, r2, rng, P, aff, w):
    # NO leading weight multiply: w enters only through the 1/w pole
    # radius (flam3)
    s = 1.0 / (np.sqrt(r2 + 1e-300) * (r2 + 1.0 / (w + 1e-10)))
    return x * s, y * s


_scry.needs_weight = True


def _loonie(x, y, r2, rng, P, aff, w):
    # inside the |z| < w disc, eject to the inverted shell; outside,
    # plain linear — the branch radius IS the weight
    w2 = w * w
    r = w * np.sqrt(np.maximum(w2 / (r2 + 1e-300) - 1.0, 0.0))
    s = np.where(r2 < w2, r, w)
    return s * x, s * y


_loonie.needs_weight = True


def _radial_blur(x, y, r2, rng, P, aff, w):
    # weight enters ONLY through the pseudo-gaussian magnitude rndG
    # (4-uniform sum - 2); angle parameter splits spin vs zoom
    ang = P("radial_blur_angle") * (np.pi / 2.0)
    spinvar, zoomvar = np.sin(ang), np.cos(ang)
    rnd_g = w * (rng.uniform(0, 1, (4,) + x.shape).sum(axis=0) - 2.0)
    ra = np.sqrt(r2)
    alpha = np.arctan2(y, x) + spinvar * rnd_g
    rz = zoomvar * rnd_g - 1.0
    return ra * np.cos(alpha) + rz * x, ra * np.sin(alpha) + rz * y


_radial_blur.needs_weight = True


def _secant2(x, y, r2, rng, P, aff, w):
    # w inside the cosine phase; the sign-of-cos branch shifts by +-1
    r = w * np.sqrt(r2)
    cr = np.cos(r)
    icr = 1.0 / np.where(np.abs(cr) < 1e-300, 1e-300, cr)
    return w * x, np.where(cr < 0, w * (icr + 1.0), w * (icr - 1.0))


_secant2.needs_weight = True


def _flux(x, y, r2, rng, P, aff, w):
    # two foci at (+-w, 0): sqrt of the distance ratio, half the
    # angle difference
    spread = P("flux_spread")
    xpw, xmw = x + w, x - w
    d1 = np.sqrt(y * y + xpw * xpw)
    d2 = np.sqrt(y * y + xmw * xmw) + 1e-300
    avgr = w * (2.0 + spread) * np.sqrt(d1 / d2)
    avga = (np.arctan2(y, xmw) - np.arctan2(y, xpw)) * 0.5
    return avgr * np.cos(avga), avgr * np.sin(avga)


_flux.needs_weight = True


def _twintrian(x, y, r2, rng, P, aff, w):
    # log10(sin^2 r) + cos r with flam3's badvalue -> -30 patch
    r = rng.uniform(0, 1, x.shape) * w * np.sqrt(r2)
    sinr, cosr = np.sin(r), np.cos(r)
    with np.errstate(divide="ignore"):
        diff = np.log10(sinr * sinr) + cosr
    diff = np.where(np.isfinite(diff), diff, -30.0)
    return w * x * diff, w * x * (diff - sinr * np.pi)


_twintrian.needs_weight = True


def _pie(x, y, r2, rng, P, aff, w):
    # random slice wedge; input ignored, radius w * rand added with NO
    # further weight multiply
    slices = P("pie_slices")
    rotation, thickness = P("pie_rotation"), P("pie_thickness")
    sl = np.floor(rng.uniform(0, 1, x.shape) * slices + 0.5)
    a = rotation + 2.0 * np.pi \
        * (sl + rng.uniform(0, 1, x.shape) * thickness) / slices
    r = w * rng.uniform(0, 1, x.shape)
    return r * np.cos(a), r * np.sin(a)


_pie.needs_weight = True


def _blade(x, y, r2, rng, P, aff, w):
    # w inside the random phase AND as the output scale
    r = rng.uniform(0, 1, x.shape) * w * np.sqrt(r2)
    return (w * x * (np.cos(r) + np.sin(r)),
            w * x * (np.cos(r) - np.sin(r)))


_blade.needs_weight = True


def _rays(x, y, r2, rng, P, aff, w):
    # w in the random angle, the pole radius, and the tangent scale
    ang = w * rng.uniform(0, 1, x.shape) * np.pi
    r = w / (r2 + 1e-10)
    tanr = w * np.tan(ang) * r
    return tanr * np.cos(x), tanr * np.sin(y)


_rays.needs_weight = True


def _arch(x, y, r2, rng, P, aff, w):
    # w in the random angle and the output scale; input ignored
    ang = rng.uniform(0, 1, x.shape) * w * np.pi
    s, c = np.sin(ang), np.cos(ang)
    c = np.where(np.abs(c) < 1e-12, 1e-12, c)
    return w * s, w * s * s / c


_arch.needs_weight = True


_VARS = {
    "linear": lambda x, y, r2, rng, P, aff: (x, y),
    "sinusoidal": lambda x, y, r2, rng, P, aff: (np.sin(x),
                                                 np.sin(y)),
    "spherical": lambda x, y, r2, rng, P, aff: (x / (r2 + 1e-12),
                                                y / (r2 + 1e-12)),
    "swirl": lambda x, y, r2, rng, P, aff: (
        x * np.sin(r2) - y * np.cos(r2),
        x * np.cos(r2) + y * np.sin(r2)),
    "horseshoe": lambda x, y, r2, rng, P, aff: (
        (x - y) * (x + y) / np.sqrt(r2 + 1e-12),
        2.0 * x * y / np.sqrt(r2 + 1e-12)),
    "julia": _julia,
    "julian": _julian,
    "pdj": _pdj,
    "popcorn": _popcorn,
    "rings": _rings,
    "gaussian_blur": _gaussian_blur,
    "disc": _disc,
    "fisheye": _fisheye,
    "polar": _polar,
    "handkerchief": _handkerchief,
    "heart": _heart,
    "spiral": _spiral,
    "hyperbolic": _hyperbolic,
    "diamond": _diamond,
    "ex": _ex,
    "blob": _blob,
    "fan2": _fan2,
    "rings2": _rings2,
    "curl": _curl,
    "fan": _fan,
    "boarders": _boarders,
    "disc2": _disc2,
    "escher": _escher,
    "mobius": _mobius,
    "modulus": _modulus,
    "lazysusan": _lazysusan,
    "whorl": _whorl,
    "waves": _waves,
    "bent": _bent,
    "elliptic": _elliptic,
    "juliascope": _juliascope,
    "wedge_julia": _wedge_julia,
    "scry": _scry,
    "loonie": _loonie,
    "radial_blur": _radial_blur,
    "cpow": _cpow,
    "super_shape": _super_shape,
    "square": _square,
    "blur": _blur,
    "stripes": _stripes,
    "pie": _pie,
    "blade": _blade,
    "rays": _rays,
    "arch": _arch,
    "sin": _c_sin,
    "cos": _c_cos,
    "tan": _c_tan,
    "sec": _c_sec,
    "csc": _c_csc,
    "cot": _c_cot,
    "sinh": _c_sinh,
    "cosh": _c_cosh,
    "tanh": _c_tanh,
    "sech": _c_sech,
    "csch": _c_csch,
    "coth": _c_coth,
    "exp": _c_exp,
    "log": _c_log,
    "bubble": _bubble,
    "butterfly": _butterfly,
    "cylinder": _cylinder,
    "cosine": _cosine,
    "exponential": _exponential,
    "power": _power,
    "eyefish": _eyefish,
    "tangent": _tangent,
    "cross": _cross,
    "noise": _noise,
    "bent2": _bent2,
    "bipolar": _bipolar,
    "cell": _cell,
    "rectangles": _rectangles,
    "separation": _separation,
    "split": _split,
    "splits": _splits,
    "popcorn2": _popcorn2,
    "waves2": _waves2,
    "curve": _curve,
    "auger": _auger,
    "conic": _conic,
    "flower": _flower,
    "parabola": _parabola,
    "edisc": _edisc,
    "foci": _foci,
    "ngon": _ngon,
    "perspective": _perspective,
    "polar2": _polar2,
    "wedge": _wedge,
    "wedge_sph": _wedge_sph,
    "oscilloscope": _oscilloscope,
    "unpolar": _unpolar,
    "secant2": _secant2,
    "flux": _flux,
    "twintrian": _twintrian,
    # handled as a PRE-step in apply(), not an additive variation
    "pre_blur": None,
}


def render_reference(genome, width: int, height: int, n_samples: int,
                     seed: int = 0, fuse: int = 20,
                     batch: int = 4096, t: float = 0.0):
    """Chaos-game render -> (H*W+1, 4) histogram (junk bin last).

    genome: cuburn_tpu Genome (only read for parameters — weights,
    affines, variation weights, colors, palette, camera).  Variations
    limited to the independent set above.  `t` evaluates every spline
    at that genome time (anchors the interpolation plumbing, not just
    t=0 stills)."""
    rng = np.random.RandomState(seed ^ 0xBADC0DE)
    n = len(genome.xforms)
    weights = np.array([xf.weight(t) for xf in genome.xforms])
    if genome.xaos is not None:
        # per-previous-xform CDF rows (flam3 chaos conditioning)
        xaos = np.array([[v(t) for v in row] for row in genome.xaos])
        probs = weights[None, :] * xaos
        cdf_rows = np.cumsum(probs, axis=1)
        cdf_rows /= cdf_rows[:, -1:]
    else:
        cdf_rows = np.tile(np.cumsum(weights) / weights.sum(), (n, 1))

    def xf_tables(xf):
        aff = np.array([s(t) for s in xf.affine])
        post = (np.array([s(t) for s in xf.post])
                if xf.post is not None else None)
        for name in xf.vars:
            if name not in _VARS:
                raise ValueError(f"reference renderer lacks {name}")
        # resolve parametric knobs through the schema (defaults incl.)
        pfn = (lambda attr, _xf=xf: float(_xf.param(attr, t)))
        # empty vars = implicit linear weight 1 (Genome.eval_at's rule)
        vset = {k: v(t) for k, v in xf.vars.items()} or {"linear": 1.0}
        return aff, post, vset, pfn

    affines, posts, var_sets, pfns = zip(*[xf_tables(xf)
                                           for xf in genome.xforms])
    colors = np.array([xf.color(t) for xf in genome.xforms])
    speeds = np.array([xf.color_speed(t) for xf in genome.xforms])
    # flam3 xform opacity (vis): scales the sample's contribution to
    # every accumulator channel; opacity-0 xforms still move the point
    opac = np.array([np.clip(xf.opacity(t), 0.0, 1.0)
                     for xf in genome.xforms])
    final = (xf_tables(genome.final_xform)
             if genome.final_xform is not None else None)
    # palette: linear lerp between bracketing keyframes (flam3
    # palette sweep semantics)
    if genome.palettes:
        ks = sorted(genome.palettes, key=lambda kv: kv[0])
        if t <= ks[0][0] or len(ks) == 1:
            palette = np.asarray(ks[0][1], np.float64)
        elif t >= ks[-1][0]:
            palette = np.asarray(ks[-1][1], np.float64)
        else:
            for (t0, p0), (t1, p1) in zip(ks, ks[1:]):
                if t0 <= t <= t1:
                    f = 0.0 if t1 == t0 else (t - t0) / (t1 - t0)
                    palette = (1 - f) * np.asarray(p0, np.float64) \
                        + f * np.asarray(p1, np.float64)
                    break
    else:
        palette = np.ones((256, 3))

    ppu = genome.scale(t) * 2.0 ** genome.zoom(t) \
        * (width / genome.size[0])
    cx, cy = genome.center[0](t), genome.center[1](t)
    # camera rotation: `rotate` degrees turns the IMAGE
    # counterclockwise = world points clockwise, pivoting on
    # rot_center (default: the image center); the viewing window
    # stays centered on `center` either way (flam3 rot_center rule)
    rot = genome.rotate(t)
    cam_yaw = genome.cam_yaw(t)
    cam_pitch = genome.cam_pitch(t)
    cam_persp = genome.cam_perspective(t)
    cam_zpos = genome.cam_zpos(t)
    cam_dof = genome.cam_dof(t)
    if any(v != 0.0 for v in (cam_yaw, cam_pitch, cam_persp, cam_zpos,
                              cam_dof)):
        rx = np.array([[1, 0, 0],
                       [0, np.cos(cam_pitch), -np.sin(cam_pitch)],
                       [0, np.sin(cam_pitch), np.cos(cam_pitch)]])
        rz = np.array([[np.cos(-cam_yaw), -np.sin(-cam_yaw), 0],
                       [np.sin(-cam_yaw), np.cos(-cam_yaw), 0],
                       [0, 0, 1]])
        cam_mat = rx @ rz
    else:
        cam_mat = None
    if genome.rot_center is not None:
        rcx = genome.rot_center[0](t)
        rcy = genome.rot_center[1](t)
    else:
        rcx, rcy = cx, cy

    def apply(aff, post, vset, pfn, x, y):
        a, b, cc, d, e, f = aff
        tx = a * x + b * y + cc
        ty = d * x + e * y + f
        pw = vset.get("pre_blur")
        if pw:
            # pre_blur perturbs the post-affine point BEFORE the
            # variations run (flam3 pre-xform slot): pseudo-gaussian
            # radius scaled by ITS weight, uniform angle
            rnd_g = pw * (rng.uniform(0, 1, (4,) + tx.shape)
                          .sum(axis=0) - 2.0)
            rnd_a = rng.uniform(0, 2.0 * np.pi, tx.shape)
            tx = tx + rnd_g * np.cos(rnd_a)
            ty = ty + rnd_g * np.sin(rnd_a)
        r2 = tx * tx + ty * ty
        ox = np.zeros_like(tx)
        oy = np.zeros_like(ty)
        # overflow/invalid at extreme points produce inf/nan that the
        # badvalue respawn below eats (the flam3 rule) — not warnings
        with np.errstate(over="ignore", invalid="ignore",
                         divide="ignore"):
            for name, w in vset.items():
                fn = _VARS[name]
                if fn is None:       # pre-step (pre_blur), done above
                    continue
                if w == 0.0:
                    # flam3 never evaluates inactive variations; the
                    # device gates weight-independent additive terms
                    # on w != 0 for the same reason (ops/xform.py,
                    # CLAUDE.md zero-weight invariant) — without this
                    # skip the weight-nonlinear family (lazysusan's
                    # +lx/-ly recentering) would diverge at w == 0
                    continue
                if getattr(fn, "needs_weight", False):
                    # weight-nonlinear family: w inside the formula
                    dx, dy = fn(tx, ty, r2, rng, pfn, aff, w)
                    ox += dx
                    oy += dy
                else:
                    dx, dy = fn(tx, ty, r2, rng, pfn, aff)
                    ox += w * dx
                    oy += w * dy
        if post is not None:
            a, b, cc, d, e, f = post
            ox, oy = a * ox + b * oy + cc, d * ox + e * oy + f
        return ox, oy

    hist = np.zeros((height * width + 1, 4), np.float64)
    x = rng.uniform(-1, 1, batch)
    y = rng.uniform(-1, 1, batch)
    c = rng.uniform(0, 1, batch)
    last = np.zeros(batch, np.int64)
    age = np.zeros(batch, np.int64)
    done = 0
    rounds = 0
    max_rounds = 1000 * (n_samples // batch + 1)
    while done < n_samples:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"reference render stalled: {done}/{n_samples} "
                "in-frame samples — camera misses the attractor?")
        u = rng.uniform(0, 1, batch)
        # row-conditioned selection (xaos)
        idx = np.empty(batch, np.int64)
        for i in range(n):
            m = last == i
            if m.any():
                idx[m] = np.minimum(
                    np.searchsorted(cdf_rows[i], u[m]), n - 1)
        nx = np.empty_like(x)
        ny = np.empty_like(y)
        for i in range(n):
            m = idx == i
            if not m.any():
                continue
            nx[m], ny[m] = apply(affines[i], posts[i], var_sets[i],
                                 pfns[i], x[m], y[m])
        c = c * (1.0 - speeds[idx]) + colors[idx] * speeds[idx]
        bad = ~np.isfinite(nx) | ~np.isfinite(ny) \
            | (np.abs(nx) > 1e10) | (np.abs(ny) > 1e10)
        nx[bad] = rng.uniform(-1, 1, bad.sum())
        ny[bad] = rng.uniform(-1, 1, bad.sum())
        age = np.where(bad, 0, age + 1)
        x, y = nx, ny
        last = idx

        if final is not None:
            fx, fy = apply(final[0], final[1], final[2], final[3],
                           x, y)
            fspeed = genome.final_xform.color_speed(t)
            fc = c * (1.0 - fspeed) \
                + genome.final_xform.color(t) * fspeed
        else:
            fx, fy, fc = x, y, c

        if cam_mat is not None:
            # Apophysis-7X 3-D camera, derived here as explicit
            # rotation matrices (Rx(pitch) @ Rz(-yaw)) applied to the
            # z-augmented point — an independent construction of the
            # algorithm ops/camera.py project_3d writes out
            # component-wise.  The 2-D variation set never writes z,
            # so the z = 0 plane is projected (z shifts by -cam_zpos).
            zc = np.full_like(fx, -cam_zpos)
            v = cam_mat @ np.stack([fx, fy, zc])
            with np.errstate(divide="ignore", invalid="ignore"):
                zr = 1.0 - cam_persp * v[2]
                sx, sy = v[0], v[1]
                if cam_dof != 0.0:
                    dr = rng.uniform(0, 1, fx.shape) \
                        * (0.1 * cam_dof * (-cam_zpos))
                    ta = rng.uniform(0, 2.0 * np.pi, fx.shape)
                    sx = sx + dr * np.cos(ta)
                    sy = sy + dr * np.sin(ta)
                fx, fy = sx / zr, sy / zr
        if rot != 0.0:
            th = -rot * np.pi / 180.0
            dx, dy = fx - rcx, fy - rcy
            gx = np.cos(th) * dx - np.sin(th) * dy + (rcx - cx)
            gy = np.sin(th) * dx + np.cos(th) * dy + (rcy - cy)
        else:
            gx, gy = fx - cx, fy - cy
        px = np.floor(gx * ppu + width * 0.5).astype(np.int64)
        py = np.floor(gy * ppu + height * 0.5).astype(np.int64)
        ok = (age >= fuse) & (px >= 0) & (px < width) \
            & (py >= 0) & (py < height)
        addr = np.where(ok, py * width + px, height * width)
        ci = np.clip(fc * 255.0, 0, 255)
        i0 = np.floor(ci).astype(np.int64)
        i1 = np.minimum(i0 + 1, 255)
        fr = (ci - i0)[:, None]
        rgb = palette[i0] * (1 - fr) + palette[i1] * fr
        v = opac[idx]
        np.add.at(hist[:, :3], addr, rgb * v[:, None])
        np.add.at(hist[:, 3], addr, v)
        done += int(ok.sum())
    return hist


# ---------------------------------------------------------------------------
# Independent color pipeline (flam3 rect.c final accumulation loop),
# transcribed separately from ops/filtering.py so transcription typos
# in either copy show up as differential failures.  White level 1.0
# (flam3's 255 / PREFILTER_WHITE scaled out).
# ---------------------------------------------------------------------------

def logscale_reference(hist, brightness, quality_per_cell):
    """flam3 k1/k2 log-density scaling of an (..., 4) accumulator."""
    hist = np.asarray(hist, np.float64)
    d = hist[..., 3:4]
    k1 = brightness * 268.0 / 256.0
    k2 = 1.0 / max(quality_per_cell, 1e-9)
    with np.errstate(divide="ignore", invalid="ignore"):
        ls = np.where(d > 0, k1 * np.log1p(d * k2) / d, 0.0)
    return hist * ls


def _calc_alpha_ref(density, g, linrange):
    funcval = linrange ** g
    out = np.zeros_like(density)
    pos = density > 0
    lin = pos & (density < linrange)
    nonlin = pos & ~lin
    frac = np.where(lin, density / linrange, 0.0)
    with np.errstate(invalid="ignore"):
        out = np.where(
            lin,
            (1.0 - frac) * density * (funcval / linrange)
            + frac * np.power(np.maximum(density, 1e-30), g),
            out)
        out = np.where(nonlin,
                       np.power(np.maximum(density, 1e-30), g), out)
    return out


def _rgb2hsv_ref(rgb):
    import colorsys
    return np.array([colorsys.rgb_to_hsv(*px) for px in rgb])


def _hsv2rgb_ref(hsv):
    import colorsys
    return np.array([colorsys.hsv_to_rgb(*px) for px in hsv])


def colorclip_reference(img, gamma, vibrancy, highlight_power,
                        gamma_threshold, background,
                        transparent=False):
    """flam3 rect.c final loop: calc_alpha + calc_newrgb + vibrancy
    blend + background/alpha handling, per pixel, float white level."""
    img = np.asarray(img, np.float64).reshape(-1, 4)
    g = 1.0 / max(gamma, 1e-9)
    d = img[:, 3]
    rgb = img[:, :3]
    alpha = np.clip(_calc_alpha_ref(d, g, max(gamma_threshold, 1e-9)),
                    0.0, 1.0)
    ls = vibrancy * alpha / np.maximum(d, 1e-9)

    out = np.zeros_like(rgb)
    maxc = rgb.max(axis=1)
    maxa = maxc * ls
    newls = 1.0 / np.maximum(maxc, 1e-9)
    hi = (highlight_power >= 0.0) & (maxa > 1.0) & (maxc > 0)
    # saturated + non-negative highpow: rescale to white, desaturate
    if hi.any():
        lsr = np.power(np.maximum(newls[hi] / np.maximum(ls[hi], 1e-9),
                                  1e-9), max(highlight_power, 0.0))
        base = rgb[hi] * newls[hi][:, None]
        hsv = _rgb2hsv_ref(base)
        hsv[:, 1] *= lsr
        out[hi] = _hsv2rgb_ref(hsv)
    lo = ~hi
    adjhlp = np.clip(-highlight_power, 0.0, 1.0)
    adj = np.where(maxa[lo] <= 1.0, 1.0, adjhlp)
    k = (1.0 - adj) * newls[lo] + adj * ls[lo]
    out[lo] = rgb[lo] * k[:, None]

    out = out + (1.0 - vibrancy) \
        * np.power(np.maximum(rgb, 0.0), g)
    if transparent:
        out = out / np.maximum(alpha[:, None], 1e-9)
        oa = alpha
    else:
        out = out + (1.0 - alpha[:, None]) \
            * np.asarray(background, np.float64)[None, :]
        oa = np.ones_like(alpha)
    return np.concatenate(
        [np.clip(out, 0.0, 1.0), oa[:, None]], axis=1)
