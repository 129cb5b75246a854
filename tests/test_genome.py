"""Tests for the genome layer: splines, schema, JSON/XML round-trips.

Covers the reference's implicit contracts (SURVEY.md §4): convert.py
round-trips real flam3 genomes; SplEval semantics checked against an
independent reference implementation on sample points.
"""

import numpy as np
import pytest

from cuburn_tpu.genome.spline import Spline
from cuburn_tpu.genome.specs import Genome, XForm
from cuburn_tpu.genome import convert, palette


class TestSpline:
    def test_constant(self):
        s = Spline(3.5)
        assert s(0.0) == 3.5
        assert s(10.0) == 3.5
        assert s.is_constant

    def test_flat_list(self):
        s = Spline([0.0, 1.0, 1.0, 2.0])
        assert s(0.0) == pytest.approx(1.0)
        assert s(1.0) == pytest.approx(2.0)

    def test_linear_between_two_knots(self):
        # Catmull-Rom with only two knots degenerates toward a cubic with
        # finite-difference tangents; midpoint of two knots is the mean.
        s = Spline([0.0, 0.0, 1.0, 2.0])
        assert s(0.5) == pytest.approx(1.0)

    def test_clamp_outside_range(self):
        s = Spline([0.0, 1.0, 1.0, 5.0])
        assert s(-3.0) == 1.0
        assert s(7.0) == 5.0

    def test_interpolates_knots_exactly(self):
        knots = [0.0, 1.0, 0.5, -2.0, 1.0, 4.0, 2.0, 0.0]
        s = Spline(knots)
        ts, vs = knots[0::2], knots[1::2]
        for t, v in zip(ts, vs):
            assert s(t) == pytest.approx(v)

    def test_smoothness(self):
        # Catmull-Rom is C1: check continuity of value and slope across a knot
        s = Spline([0.0, 0.0, 1.0, 1.0, 2.0, 0.0])
        eps = 1e-6
        left = (s(1.0) - s(1.0 - eps)) / eps
        right = (s(1.0 + eps) - s(1.0)) / eps
        assert left == pytest.approx(right, abs=1e-3)

    def test_uniform_catmull_rom_matches_closed_form(self):
        # On uniform knots the tangent is (p2 - p0) / 2; verify against a
        # manual evaluation at s = 0.5 of segment [1, 2].
        vals = [0.0, 2.0, 1.0, 3.0]
        s = Spline(list(zip([0.0, 1.0, 2.0, 3.0], vals)))
        p0, p1, p2, p3 = vals
        m1, m2 = (p2 - p0) / 2, (p3 - p1) / 2
        u = 0.5
        h = (2*u**3 - 3*u**2 + 1, u**3 - 2*u**2 + u,
             -2*u**3 + 3*u**2, u**3 - u**2)
        expect = h[0]*p1 + h[1]*m1 + h[2]*p2 + h[3]*m2
        assert s(1.5) == pytest.approx(expect)

    def test_vectorized_matches_scalar(self):
        s = Spline([0.0, 1.0, 1.0, -1.0, 2.0, 2.0])
        ts = np.linspace(-0.5, 2.5, 17)
        vec = s.evaluate(ts)
        for t, v in zip(ts, vec):
            assert s(float(t)) == pytest.approx(v)


class TestGenomeSchema:
    def make_genome(self):
        return Genome(
            xforms=[
                XForm(weight=1.0, color=0.0,
                      affine=(0.5, 0, -0.5, 0, 0.5, -0.5),
                      vars={"linear": 1.0}),
                XForm(weight=2.0, color=[0.0, 0.2, 1.0, 0.8],
                      affine=(0.5, 0, 0.5, 0, 0.5, -0.5),
                      vars={"spherical": 0.7, "julian": 0.3},
                      params={"julian_power": 3.0}),
            ],
            name="test")

    def test_structure_key(self):
        g = self.make_genome()
        k = g.structure_key()
        assert k.n_xforms == 2
        assert k.variations == ("julian", "linear", "spherical")
        assert not k.has_post and not k.has_xaos
        assert k.final_variations is None
        # julian has 2 params
        assert ("julian", "julian_power") in k.param_slots

    def test_eval_at_shapes(self):
        g = self.make_genome()
        p = g.eval_at(0.5)
        assert p.weights.shape == (2,)
        assert p.affine.shape == (2, 6)
        assert p.var_weights.shape == (2, 3)
        assert p.xaos.shape == (2, 2)
        assert p.palette.shape == (256, 3)
        # slot packing: julian_power default 1 -> xform2 override 3
        slots = g.structure_key().param_slots
        i = slots.index(("julian", "julian_power"))
        assert p.var_params[1, i] == pytest.approx(3.0)
        assert p.var_params[0, i] == pytest.approx(1.0)  # default

    def test_animated_params_change(self):
        g = self.make_genome()
        assert g.xforms[1].color(0.2) != g.xforms[1].color(0.9)
        p1, p2 = g.eval_at(0.2), g.eval_at(0.9)
        assert p1.color[1] != p2.color[1]

    def test_json_roundtrip(self):
        g = self.make_genome()
        text = g.to_json()
        g2 = Genome.from_json(text)
        assert g2.structure_key() == g.structure_key()
        p1, p2 = g.eval_at(0.3), g2.eval_at(0.3)
        np.testing.assert_allclose(p1.affine, p2.affine)
        np.testing.assert_allclose(p1.var_params, p2.var_params)
        np.testing.assert_allclose(p1.palette, p2.palette)


FLAM3_XML = """
<flame name="xmltest" size="800 600" center="0.1 -0.2" scale="120"
       rotate="30" brightness="5" gamma="3.5" vibrancy="0.9"
       background="0 0 0.1">
  <xform weight="0.5" color="0" symmetry="0.2" linear="0.6" spherical="0.4"
         coefs="0.5 0.1 -0.1 0.6 0.2 -0.3" chaos="1 0.5"/>
  <xform weight="1.5" color="1" julian="1" julian_power="4" julian_dist="0.7"
         coefs="0.7 0 0 0.7 -0.2 0.2"
         post="1 0 0 1 0.05 0"/>
  <finalxform color="0.5" bubble="1" coefs="1 0 0 1 0 0"/>
  <palette count="256" format="RGB">
""" + "".join(f"{i:02x}{255 - i:02x}40" for i in range(256)) + """
  </palette>
</flame>
"""


def test_empty_genome_rejected():
    with pytest.raises(ValueError, match="at least one xform"):
        Genome(xforms=[])


class TestFlam3Convert:
    def test_parse(self):
        [g] = convert.parse_flam3(FLAM3_XML)
        assert g.name == "xmltest"
        assert g.size == (800, 600)
        assert len(g.xforms) == 2
        assert g.scale(0) == 120
        assert g.rotate(0) == 30
        # coefs order: "a d b e c f"
        a, b, c, d, e, f = [s(0) for s in g.xforms[0].affine]
        assert (a, d) == (0.5, 0.1)
        assert (b, e) == (-0.1, 0.6)
        assert (c, f) == (0.2, -0.3)
        # symmetry -> color_speed
        assert g.xforms[0].color_speed(0) == pytest.approx(0.4)
        # chaos row padded
        assert [v(0) for v in g.xaos[0]] == [1.0, 0.5]
        assert [v(0) for v in g.xaos[1]] == [1.0, 1.0]
        # parametric variation
        assert g.xforms[1].vars["julian"](0) == 1.0
        assert g.xforms[1].params["julian_power"](0) == 4.0
        # post xform
        assert g.xforms[1].post is not None
        # final xform
        assert g.final_xform is not None
        assert "bubble" in g.final_xform.vars
        # palette decoded
        pal = g.palettes[0][1]
        assert pal.shape == (256, 3)
        assert pal[0, 0] == pytest.approx(0 / 255)
        assert pal[16, 0] == pytest.approx(16 / 255)
        assert pal[16, 1] == pytest.approx((255 - 16) / 255)

    def test_xml_roundtrip(self):
        [g] = convert.parse_flam3(FLAM3_XML)
        xml2 = convert.genome_to_flame_xml(g)
        [g2] = convert.parse_flam3(xml2)
        assert g2.structure_key() == g.structure_key()
        p1, p2 = g.eval_at(0.0), g2.eval_at(0.0)
        np.testing.assert_allclose(p1.affine, p2.affine, atol=1e-6)
        np.testing.assert_allclose(p1.xaos, p2.xaos, atol=1e-6)
        np.testing.assert_allclose(p1.palette, p2.palette, atol=1 / 255)

    def test_rot_center_and_earlyclip(self):
        """flam3 rot_center parses into the genome and survives the
        XML round trip; earlyclip parses into the pipeline-order flag
        (render._filter_frame implements both orders) and round-trips
        through XML and JSON."""
        xml = ('<flame name="rc" size="64 64" center="0.1 0.2" '
               'rot_center="0.5 -0.4" rotate="45" earlyclip="1">'
               '<xform weight="1" coefs="1 0 0 1 0 0" linear="1"/>'
               '</flame>')
        [g] = convert.parse_flam3(xml)
        assert g.earlyclip is True
        assert g.rot_center is not None
        assert (g.rot_center[0](0), g.rot_center[1](0)) == (0.5, -0.4)
        p = g.eval_at(0.0)
        np.testing.assert_allclose(p.rot_center, [0.5, -0.4])
        xml2 = convert.genome_to_flame_xml(g)
        assert 'earlyclip="1"' in xml2
        [g2] = convert.parse_flam3(xml2)
        assert g2.earlyclip is True
        np.testing.assert_allclose(g2.eval_at(0.0).rot_center,
                                   [0.5, -0.4])
        # JSON round trip too
        g3 = type(g).from_json(g.to_json())
        assert g3.earlyclip is True
        np.testing.assert_allclose(g3.eval_at(0.0).rot_center,
                                   [0.5, -0.4])
        # default (absent attr) stays late-clip and serializes clean
        [g4] = convert.parse_flam3(xml.replace(' earlyclip="1"', ''))
        assert g4.earlyclip is False
        assert "earlyclip" not in convert.genome_to_flame_xml(g4)
        # default: rot_center follows center
        xml_plain = ('<flame name="p" size="64 64" center="0.1 0.2">'
                     '<xform weight="1" coefs="1 0 0 1 0 0" '
                     'linear="1"/></flame>')
        [gp] = convert.parse_flam3(xml_plain)
        assert gp.rot_center is None
        np.testing.assert_allclose(gp.eval_at(0.0).rot_center,
                                   [0.1, 0.2])

    def test_3d_camera_attrs_parse(self):
        """Apophysis-7X 3-D camera attrs (cam_yaw/pitch/perspective/
        zpos/dof) parse into the genome's camera splines (round 4 —
        previously parse-and-warn; tests/test_camera3d.py pins the
        projection semantics).  Zero-valued attrs (the defaults
        Apophysis writes out unconditionally) stay mode-0 and warn
        nothing."""
        xml3d = ('<flame name="c3" size="64 64" cam_yaw="0.3" '
                 'cam_perspective="0.1" cam_zpos="0" cam_dof="0">'
                 '<xform weight="1" coefs="1 0 0 1 0 0" linear="1"/>'
                 '</flame>')
        import warnings as _w
        with _w.catch_warnings():
            _w.simplefilter("error")
            [g] = convert.parse_flam3(xml3d)
        assert g.cam_yaw(0.0) == pytest.approx(0.3)
        assert g.cam_perspective(0.0) == pytest.approx(0.1)
        assert g.structure_key().cam_mode == 1
        # all-zero 3-D attrs (flam3 defaults) are statically elided
        xml_flat = ('<flame name="c0" size="64 64" cam_yaw="0" '
                    'cam_pitch="0" cam_dof="0">'
                    '<xform weight="1" coefs="1 0 0 1 0 0" linear="1"/>'
                    '</flame>')
        with _w.catch_warnings():
            _w.simplefilter("error")
            [g0] = convert.parse_flam3(xml_flat)
        assert g0.structure_key().cam_mode == 0

    def test_multi_flame_document(self):
        doc = f"<flames>{FLAM3_XML}{FLAM3_XML}</flames>"
        genomes = convert.parse_flam3(doc)
        assert len(genomes) == 2

    def test_earlyclip_tolerant_parse(self):
        """Editors write earlyclip="yes"/"true"; float() on those
        raised (round-4 advisor).  Any value that isn't an explicit
        negative means set."""
        tpl = ('<flame name="e" size="64 64" earlyclip="{}">'
               '<xform weight="1" coefs="1 0 0 1 0 0" linear="1"/>'
               '</flame>')
        for v in ("yes", "true", "TRUE", "1", "2", "1.0", "on"):
            [g] = convert.parse_flam3(tpl.format(v))
            assert g.earlyclip is True, v
        for v in ("0", "no", "false", "FALSE", "off", "0.0", ""):
            [g] = convert.parse_flam3(tpl.format(v))
            assert g.earlyclip is False, v

    def test_cam_angle_units(self):
        """cam_yaw/cam_pitch are radians by default; an explicit
        cam_angle_units attr or the angle_units= argument converts
        degrees, and suspiciously large bare values (>2*pi — no
        radian camera exceeds a full turn) warn instead of silently
        rendering garbage (round-4 verdict weak #6)."""
        import math
        import warnings as _w
        tpl = ('<flame name="u" size="64 64" cam_yaw="30" '
               'cam_pitch="-45"{}>'
               '<xform weight="1" coefs="1 0 0 1 0 0" linear="1"/>'
               '</flame>')
        # explicit attr: degrees converted at parse time
        [g] = convert.parse_flam3(
            tpl.format(' cam_angle_units="degrees"'))
        assert g.cam_yaw(0.0) == pytest.approx(math.radians(30))
        assert g.cam_pitch(0.0) == pytest.approx(math.radians(-45))
        # caller override (CLI --cam-angle-units) beats the heuristic
        [g2] = convert.parse_flam3(tpl.format(""),
                                   angle_units="degrees")
        assert g2.cam_yaw(0.0) == pytest.approx(math.radians(30))
        # explicit radians: large values accepted silently
        with _w.catch_warnings():
            _w.simplefilter("error")
            [g3] = convert.parse_flam3(
                tpl.format(' cam_angle_units="radians"'))
        assert g3.cam_yaw(0.0) == pytest.approx(30.0)
        # bare large magnitude: read as radians but WARNS
        with pytest.warns(UserWarning, match="DEGREES"):
            [g4] = convert.parse_flam3(tpl.format(""))
        assert g4.cam_yaw(0.0) == pytest.approx(30.0)
        # small bare values (true radians) stay silent
        with _w.catch_warnings():
            _w.simplefilter("error")
            [g5] = convert.parse_flam3(
                tpl.format("").replace('cam_yaw="30"', 'cam_yaw="0.3"')
                   .replace('cam_pitch="-45"', 'cam_pitch="-0.4"'))
        assert g5.cam_yaw(0.0) == pytest.approx(0.3)


class TestPalette:
    def test_hex_roundtrip(self):
        rng = np.random.RandomState(0)
        pal = rng.rand(256, 3)
        dec = palette.decode_hex_block(palette.encode_palette(pal))
        np.testing.assert_allclose(dec, pal, atol=1 / 255)

    def test_hex_stride_guess_prefers_rgb(self):
        """A 64-entry pure-red RGB block is length-divisible by 8 too;
        the stride guess must prefer RGB — flam3's default format —
        over ARGB (regression: 'ff0000'*64 parsed as 48 ARGB frames,
        turning an all-red palette blue)."""
        dec = palette.decode_hex_block("ff0000" * 64)
        assert dec.shape == (256, 3)
        np.testing.assert_allclose(dec[:, 0], 1.0)
        np.testing.assert_allclose(dec[:, 1:], 0.0)
        # explicit count still decodes ARGB blocks
        dec_argb = palette.decode_hex_block("80ff0000" * 4, count=4)
        np.testing.assert_allclose(dec_argb[:, 0], 1.0)
        np.testing.assert_allclose(dec_argb[:, 1:], 0.0)

    def test_keyframe_interp(self):
        p0, p1 = np.zeros((256, 3)), np.ones((256, 3))
        mid = palette.palette_at([(0.0, p0), (1.0, p1)], 0.25)
        np.testing.assert_allclose(mid, 0.25)

    def test_resize(self):
        pal = np.linspace(0, 1, 128 * 3).reshape(128, 3)
        out = palette.resize_palette(pal, 256)
        assert out.shape == (256, 3)
        np.testing.assert_allclose(out[0], pal[0])
        np.testing.assert_allclose(out[-1], pal[-1])


class TestWildFixture:
    """Parse + render a realistic Apophysis-style multi-flame file
    (tests/fixtures/wild_sheep.flam3): the flam3-compat regression
    corpus pattern of SURVEY.md §4."""

    def _load(self):
        import os
        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "wild_sheep.flam3")
        return convert.load_genomes(path)

    def test_parse_all_features(self):
        g1, g2 = self._load()
        assert g1.name == "wild_sheep_001"
        assert len(g1.xforms) == 4
        assert g1.final_xform is not None
        assert "bipolar" in g1.final_xform.vars
        assert g1.xaos is not None                 # chaos row on xf 1
        assert [v(0) for v in g1.xaos[0]] == [1.0, 1.0, 0.5, 1.0]
        assert g1.xforms[1].color_speed(0) == pytest.approx(0.05)
        assert g1.xforms[2].color_speed(0) == pytest.approx(0.15)
        assert g1.xforms[2].post is not None
        assert g1.xforms[3].opacity(0) == 0.5
        assert g1.rotate(0) == 23.5
        key = g1.structure_key()
        for v in ("spherical", "julian", "bubble", "pre_blur",
                  "waves2", "elliptic", "linear"):
            assert v in key.variations
        # second flame uses per-index <color> entries
        pal = g2.palettes[0][1]
        assert pal[0, 0] == pytest.approx(1.0)
        assert pal[255, 2] == pytest.approx(1.0)

    def test_motion_elements(self):
        """flam3 <motion> children become periodic splines: value =
        base + sum amp * func(freq * t) (flam3.c motion_funcs /
        apply_motion_parameters), covering weight, coefs columns, and
        variation weights absent from the parent base."""
        import numpy as np
        _, g2 = self._load()
        xf = g2.xforms[0]
        # weight: base 0.5 + 0.2*sin(2pi*2t)
        assert xf.weight(0.0) == pytest.approx(0.5, abs=1e-6)
        assert xf.weight(0.125) == pytest.approx(0.7, abs=1e-3)
        assert xf.weight(0.25) == pytest.approx(0.5, abs=1e-3)
        assert xf.weight(0.375) == pytest.approx(0.3, abs=1e-3)
        # coefs amp "0 0 0 0 0.1 0": flam3 E column = our c
        # (x-translate, index 2): -0.3 + 0.1*sin(4pi t)
        assert xf.affine[2](0.125) == pytest.approx(-0.2, abs=1e-3)
        assert xf.affine[0](0.125) == pytest.approx(1.2, abs=1e-6)
        # sinusoidal: base 1 + 0.4*hill(t); hill(0.5) = 1
        assert xf.vars["sinusoidal"](0.5) == pytest.approx(1.4,
                                                           abs=1e-3)
        assert xf.vars["sinusoidal"](0.0) == pytest.approx(1.0,
                                                           abs=1e-3)
        # temporal filter attrs parsed at flame level
        assert g2.temporal_filter_type == "gaussian"
        assert g2.temporal_filter_width(0) == pytest.approx(1.5)
        # second xform untouched by motion
        assert g2.xforms[1].weight.is_constant

    def test_motion_renders_time_varying(self):
        """End-to-end: a motioned genome animates — same seed, two
        times, different images."""
        from cuburn_tpu.profile import RenderProfile
        from cuburn_tpu.render import Renderer
        import numpy as np
        _, g2 = self._load()
        prof = RenderProfile(width=64, height=64, quality=30,
                             batch=2048, iters_per_chunk=8, fuse=16,
                             hist_backend="scatter", de_enabled=False)
        r = Renderer(g2, prof)
        img_a, _ = r.render_frame(0.0, seed=3)
        img_b, _ = r.render_frame(0.25, seed=3)
        assert not np.array_equal(img_a, img_b)

    def test_renders(self):
        from cuburn_tpu.profile import RenderProfile
        from cuburn_tpu.render import Renderer
        g1, _ = self._load()
        prof = RenderProfile(width=64, height=64, quality=40,
                             batch=2048, iters_per_chunk=8, fuse=16,
                             hist_backend="scatter", de_enabled=False)
        img, stats = Renderer(g1, prof).render_frame(0.0, seed=11)
        assert img[..., :3].max() > 0
        assert stats.plotted_samples > 0


class TestWildPaletteForms:
    """Palette encodings seen in wild files beyond the <palette> hex
    block: Apophysis <colors count data>, and the legacy numeric
    palette="N" gradient reference (flam3 palettes.xml is data we don't
    have — a deterministic stand-in palette keeps the file renderable)."""

    def test_apophysis_colors_element(self):
        entries = "".join(f"00{i:02x}{i:02x}{255 - i:02x}"
                          for i in range(256))
        xml = (f'<flame name="apo" size="64 64">'
               f'<xform weight="1" coefs="0.5 0 0 0.5 0 0" linear="1"/>'
               f'<colors count="256" data="{entries}"/></flame>')
        [g] = convert.parse_flam3(xml)
        pal = g.palettes[0][1]
        assert pal.shape == (256, 3)
        assert pal[10, 0] == pytest.approx(10 / 255)
        assert pal[10, 2] == pytest.approx(245 / 255)

    def test_legacy_palette_index(self):
        xml = ('<flame name="old" size="64 64" palette="15">'
               '<xform weight="1" coefs="0.5 0 0 0.5 0 0" linear="1"/>'
               '</flame>')
        with pytest.warns(UserWarning, match="palettes.xml"):
            [g] = convert.parse_flam3(xml)
        pal = g.palettes[0][1]
        assert pal.shape == (256, 3)
        # deterministic: same index -> same palette
        with pytest.warns(UserWarning):
            [g2] = convert.parse_flam3(xml)
        np.testing.assert_array_equal(pal, g2.palettes[0][1])
        # different index -> different palette
        with pytest.warns(UserWarning):
            [g3] = convert.parse_flam3(xml.replace('"15"', '"16"'))
        assert not np.array_equal(pal, g3.palettes[0][1])


class TestSymmetryElement:
    """<symmetry kind="N"/> lowers to flam3_add_symmetry's explicit
    linear xforms (rotations; plus a mirror for negative kinds)."""

    XML = ('<flame name="sym" size="64 64">'
           '<xform weight="1" coefs="0.5 0 0 0.5 0.3 0" linear="1" '
           'chaos="0.5"/>'
           '<symmetry kind="{kind}"/>'
           '<palette count="2" format="RGB">ff0000 00ff00</palette>'
           '</flame>')

    def test_rotational(self):
        [g] = convert.parse_flam3(self.XML.format(kind=3))
        assert len(g.xforms) == 3          # 1 parsed + (kind-1) added
        for i, xf in enumerate(g.xforms[1:], 1):
            a, b, c, d, e, f = [s(0) for s in xf.affine]
            ang = 2 * np.pi * i / 3
            assert a == pytest.approx(np.cos(ang))
            assert d == pytest.approx(np.sin(ang))
            assert (c, f) == (0.0, 0.0)
            assert xf.color_speed(0) == 0.0
            assert xf.weight(0) == 1.0
            assert list(xf.vars) == ["linear"]
        # chaos row re-padded to the grown xform count
        assert [v(0) for v in g.xaos[0]] == [0.5, 1.0, 1.0]
        assert [v(0) for v in g.xaos[1]] == [1.0, 1.0, 1.0]

    def test_dihedral(self):
        [g] = convert.parse_flam3(self.XML.format(kind=-2))
        # mirror + (2-1) rotation
        assert len(g.xforms) == 3
        a, b, c, d, e, f = [s(0) for s in g.xforms[1].affine]
        assert (a, e) == (-1.0, 1.0)       # x -> -x mirror
        assert g.xforms[1].color(0) == 1.0
        ang = np.pi
        a2 = [s(0) for s in g.xforms[2].affine]
        assert a2[0] == pytest.approx(np.cos(ang))

    def test_symmetric_render_is_symmetric(self):
        """A 2-fold symmetrized genome renders a 180-degree-symmetric
        density field (up to sampling noise)."""
        from cuburn_tpu.profile import RenderProfile
        from cuburn_tpu.render import Renderer
        xml = ('<flame name="sym2" size="64 64" scale="25" filter="0">'
               '<xform weight="1" coefs="0.5 0 0 0.5 0.3 0.2" '
               'spherical="0.7" linear="0.3"/>'
               '<symmetry kind="2"/>'
               '<palette count="2" format="RGB">ff0000 00ff00</palette>'
               '</flame>')
        [g] = convert.parse_flam3(xml)
        prof = RenderProfile(width=48, height=48, quality=600,
                             batch=4096, iters_per_chunk=8, fuse=16,
                             hist_backend="scatter", de_enabled=False)
        r = Renderer(g, prof)
        hist, _ = r.accumulate(0.0, seed=5)
        d = np.asarray(hist)[:-1, 3].reshape(48, 48)
        rot = np.rot90(d, 2)
        assert d.sum() > 0
        # NOTE: the chaos-game invariant measure of {f, R} is NOT
        # mass-symmetric (the lobe through f carries 2x the visits —
        # verified by direct simulation; flam3 behaves identically and
        # relies on log tonemapping to hide it).  Symmetry is in the
        # SUPPORT: the attractor set maps onto itself under R.
        occ, occ_r = d > 0, rot > 0
        mismatch = (occ ^ occ_r).sum() / max(occ.sum(), 1)
        assert mismatch < 0.12    # sampling noise at dim edge pixels


class TestZoom:
    """flam3 `zoom`: effective pixels-per-unit = scale * 2^zoom (the
    geometric half of flam3's zoom; sample-density compensation is
    profile-driven here)."""

    def test_parse_and_ppu(self):
        xml = ('<flame name="z" size="64 64" scale="50" zoom="1.5">'
               '<xform weight="1" coefs="0.5 0 0 0.5 0 0" linear="1"/>'
               '</flame>')
        [g] = convert.parse_flam3(xml)
        assert g.zoom(0) == 1.5
        p = g.eval_at(0.0)
        assert float(p.ppu) == pytest.approx(50 * 2 ** 1.5, rel=1e-6)

    def test_packed_interp_matches_eval_at(self):
        from cuburn_tpu.ops.interp import pack_genome
        g = Genome(
            xforms=[XForm(weight=1.0, vars={"linear": 1.0})],
            scale=100.0,
            zoom=[0.0, 0.0, 1.0, 2.0],      # animates 0 -> 2
            palettes=[(0.0, np.zeros((256, 3)))])
        pk = pack_genome(g)
        for t in (0.0, 0.3, 1.0):
            pT = pk.eval_params(np.asarray([t], np.float32))
            want = float(g.eval_at(t).ppu)
            got = float(np.asarray(pT.ppu)[0])
            assert got == pytest.approx(want, rel=1e-5), t

    def test_json_and_xml_roundtrip(self):
        g = Genome(
            xforms=[XForm(weight=1.0, vars={"linear": 1.0})],
            scale=80.0, zoom=0.75,
            palettes=[(0.0, np.zeros((256, 3)))])
        g2 = Genome.from_json(g.to_json())
        assert g2.zoom(0) == 0.75
        [g3] = convert.parse_flam3(convert.genome_to_flame_xml(g))
        assert g3.zoom(0) == pytest.approx(0.75)


class TestMalformedInputs:
    """Clean, named errors for broken files (flam3 forward-compat says
    unknown ATTRIBUTES are ignored, but structurally broken input must
    fail loudly, not render garbage)."""

    def test_truncated_palette_block(self):
        xml = ('<flame name="bad" size="64 64">'
               '<xform weight="1" linear="1"/>'
               '<palette count="256" format="RGB">ff00</palette>'
               '</flame>')
        with pytest.raises(ValueError, match="palette"):
            convert.parse_flam3(xml)

    def test_wrong_coefs_arity(self):
        xml = ('<flame name="bad" size="64 64">'
               '<xform weight="1" linear="1" coefs="1 0 0 1"/>'
               '</flame>')
        with pytest.raises(ValueError, match="coefs"):
            convert.parse_flam3(xml)

    def test_unknown_xform_attribute_ignored(self):
        xml = ('<flame name="fwd" size="64 64">'
               '<xform weight="1" linear="1" coefs="1 0 0 1 0 0" '
               'some_future_plugin_knob="3.2"/>'
               '</flame>')
        [g] = convert.parse_flam3(xml)
        assert list(g.xforms[0].vars) == ["linear"]
        assert g.xforms[0].params == {}

    def test_ndarray_center_parses_per_component(self):
        """np.ndarray for a tuple-valued field must read as per-
        component values (regression: it fell through to the scalar
        broadcast branch, Spline read the 1-D vector as a flat (t, v)
        knot list, and BOTH center coordinates silently became the
        constant y value)."""
        from cuburn_tpu.genome.specs import Genome, XForm
        g = Genome(xforms=[XForm(weight=1.0,
                                 affine=(0.5, 0, 0, 0, 0.5, 0),
                                 vars={"linear": 1.0})],
                   center=np.array([0.3, 0.4]))
        assert g.center[0](0.0) == pytest.approx(0.3)
        assert g.center[1](0.0) == pytest.approx(0.4)

    def test_legacy_two_valued_color_attribute(self):
        """Old flam3/electricsheep files write color="c1 c2"; flam3's
        sscanf reads the first value (regression: float() crashed on
        the pair and the whole genome failed to load)."""
        xml = ('<flame name="legacy" size="64 64">'
               '<xform weight="1" color="0.33 0" linear="1" '
               'coefs="1 0 0 1 0 0"/>'
               '</flame>')
        [g] = convert.parse_flam3(xml)
        assert g.xforms[0].color(0.0) == pytest.approx(0.33)

    def test_not_xml(self):
        with pytest.raises(Exception):
            convert.parse_flam3("<flame")

    def test_no_flames_in_document(self):
        assert convert.parse_flam3("<flames></flames>") == []

    def test_unknown_motion_function(self):
        xml = ('<flame name="bad" size="64 64">'
               '<xform weight="1" linear="1">'
               '<motion motion_frequency="1" motion_function="sawtooth" '
               'weight="0.1"/></xform></flame>')
        with pytest.raises(ValueError, match="motion_function"):
            convert.parse_flam3(xml)


class TestRoundTripProperties:
    """Serializer property tests over random genomes: parse(serialize(g))
    must evaluate identically — across many random structures, not just
    the fixtures."""

    @pytest.mark.parametrize("seed", [11, 22, 33, 44])
    def test_json_roundtrip_random(self, seed):
        from cuburn_tpu.genome.randgen import random_genome
        g = random_genome(seed)
        g2 = Genome.from_json(g.to_json())
        assert g2.structure_key() == g.structure_key()
        p1, p2 = g.eval_at(0.3), g2.eval_at(0.3)
        np.testing.assert_allclose(p1.affine, p2.affine, atol=1e-6)
        np.testing.assert_allclose(p1.var_weights, p2.var_weights,
                                   atol=1e-6)
        np.testing.assert_allclose(p1.var_params, p2.var_params,
                                   atol=1e-6)
        np.testing.assert_allclose(p1.xaos, p2.xaos, atol=1e-6)
        np.testing.assert_allclose(p1.opacity, p2.opacity, atol=1e-6)
        # palettes serialize as 8-bit hex: quantized round-trip
        np.testing.assert_allclose(p1.palette, p2.palette,
                                   atol=1.5 / 255)
        np.testing.assert_allclose(float(p1.ppu), float(p2.ppu),
                                   rtol=1e-6)

    @pytest.mark.parametrize("seed", [11, 22, 33, 44])
    def test_xml_roundtrip_random(self, seed):
        from cuburn_tpu.genome.randgen import random_genome
        g = random_genome(seed)
        [g2] = convert.parse_flam3(convert.genome_to_flame_xml(g))
        assert g2.structure_key() == g.structure_key()
        p1, p2 = g.eval_at(0.0), g2.eval_at(0.0)
        np.testing.assert_allclose(p1.affine, p2.affine, atol=1e-5)
        np.testing.assert_allclose(p1.var_weights, p2.var_weights,
                                   atol=1e-5)
        np.testing.assert_allclose(p1.var_params, p2.var_params,
                                   atol=1e-5)
        np.testing.assert_allclose(p1.xaos, p2.xaos, atol=1e-5)
        np.testing.assert_allclose(p1.palette, p2.palette,
                                   atol=1.5 / 255)
        np.testing.assert_allclose(float(p1.ppu), float(p2.ppu),
                                   rtol=1e-5)


def test_many_xform_genome_renders():
    """40 xforms through the one-hot parameter fetch and CDF selection
    (the (B,N)@(N,K) matmul path must scale past toy xform counts)."""
    from cuburn_tpu.profile import RenderProfile
    from cuburn_tpu.render import Renderer
    xml = ('<flame name="many" size="64 64" scale="22" filter="0">'
           '<xform weight="1" coefs="0.5 0 0 0.5 0.4 0.1" '
           'spherical="0.8" linear="0.2"/>'
           '<symmetry kind="40"/></flame>')
    [g] = convert.parse_flam3(xml)
    assert len(g.xforms) == 40
    prof = RenderProfile(width=64, height=64, quality=30, batch=2048,
                         iters_per_chunk=8, fuse=16,
                         hist_backend="scatter", de_enabled=False)
    hist, stats = Renderer(g, prof).accumulate(0.0, seed=1)
    h = np.asarray(hist)
    assert np.isfinite(h).all() and h[:-1, 3].sum() > 0


class TestImplicitLinearXform:
    """An xform with EMPTY vars is an implicit linear map (matching the
    final-xform rule); review repro showed it previously collapsed
    every point to its post-affine origin."""

    def test_eval_at_gives_linear_weight(self):
        g = Genome(xforms=[XForm()])
        assert g.structure_key().variations == ("linear",)
        p = g.eval_at(0.0)
        np.testing.assert_array_equal(p.var_weights, [[1.0]])

    def test_mixed_genome_union_includes_linear(self):
        g = Genome(xforms=[
            XForm(vars={"spherical": 1.0}),
            XForm(affine=(0.5, 0, 0.3, 0, 0.5, 0.1)),   # vars-less
        ])
        key = g.structure_key()
        assert "linear" in key.variations
        p = g.eval_at(0.0)
        j = key.variations.index("linear")
        assert p.var_weights[1, j] == 1.0
        assert p.var_weights[0, j] == 0.0

    def test_packed_interp_matches(self):
        from cuburn_tpu.ops.interp import pack_genome
        g = Genome(xforms=[
            XForm(vars={"spherical": 1.0}),
            XForm(affine=(0.5, 0, 0.3, 0, 0.5, 0.1)),
        ], palettes=[(0.0, np.zeros((256, 3)))])
        pk = pack_genome(g)
        pT = pk.eval_params(np.asarray([0.0], np.float32))
        np.testing.assert_allclose(np.asarray(pT.var_weights)[0],
                                   g.eval_at(0.0).var_weights)

    def test_renders_the_attractor_not_a_dot(self):
        from cuburn_tpu.profile import RenderProfile
        from cuburn_tpu.render import Renderer
        g = Genome(xforms=[
            XForm(weight=1.0, affine=(0.5, 0, 0.5, 0, 0.5, 0.0)),
            XForm(weight=1.0, affine=(0.5, 0, -0.5, 0, 0.5, 0.0)),
            XForm(weight=1.0, affine=(0.5, 0, 0.0, 0, 0.5, 0.5)),
        ], scale=180.0, size=(64, 64),
            palettes=[(0.0, np.ones((256, 3)))], name="pure_affine")
        prof = RenderProfile(width=64, height=64, quality=40,
                             batch=2048, iters_per_chunk=8, fuse=16,
                             hist_backend="scatter", de_enabled=False)
        hist, _ = Renderer(g, prof).accumulate(0.0, seed=2)
        d = np.asarray(hist)[:-1, 3]
        assert (d > 0).sum() > 100     # a gasket, not a single dot


def test_param_typo_rejected():
    with pytest.raises(ValueError, match="unknown variation parameter"):
        XForm(vars={"julian": 1.0}, params={"julain_power": 3.0})


def test_empty_spline_rejected():
    with pytest.raises(ValueError, match="at least one knot"):
        Spline([])
