"""Apophysis-7X 3-D camera (cam_yaw/pitch/perspective/zpos/dof).

Convention tests pin ops/camera.py project_3d to the published
algorithm (Ember/fractorium Proj templates; angles in radians), the
structure-key gate, genome round-trips, blending, and an end-to-end
device-vs-independent-anchor comparison (the anchor derives the
projection its own way — explicit rotation matrices — so a shared
transcription error cannot hide; the round-3 adjust-stretch lesson).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cuburn_tpu.genome.specs import Genome, XForm
from cuburn_tpu.ops.camera import project_3d


def _cam3d(yaw=0.0, pitch=0.0, persp=0.0, zpos=0.0, dof=0.0):
    return jnp.asarray([yaw, pitch, persp, zpos, dof], jnp.float32)


def _sierpinski(**kw):
    return Genome(
        xforms=[
            XForm(weight=1.0, color=0.0,
                  affine=(0.5, 0.0, 0.0, 0.0, 0.5, 0.0)),
            XForm(weight=1.0, color=0.5,
                  affine=(0.5, 0.0, 0.5, 0.0, 0.5, 0.0)),
            XForm(weight=1.0, color=1.0,
                  affine=(0.5, 0.0, 0.0, 0.0, 0.5, 0.5)),
        ],
        scale=10.0, size=(32, 32), spatial_filter=0.0,
        center=(0.25, 0.25), name="cam3d_sierpinski", **kw)


class TestStructureGate:
    def test_default_genome_has_mode_zero(self):
        assert _sierpinski().structure_key().cam_mode == 0

    def test_explicit_zero_splines_stay_mode_zero(self):
        g = _sierpinski(cam_yaw=0.0, cam_pitch=0.0,
                        cam_perspective=0.0, cam_zpos=0.0, cam_dof=0.0)
        assert g.structure_key().cam_mode == 0

    def test_projection_attrs_are_mode_one(self):
        for kw in ({"cam_yaw": 0.3}, {"cam_pitch": 0.2},
                   {"cam_perspective": 0.1}, {"cam_zpos": 1.0}):
            assert _sierpinski(**kw).structure_key().cam_mode == 1, kw

    def test_dof_is_mode_two(self):
        g = _sierpinski(cam_zpos=1.0, cam_dof=0.5)
        assert g.structure_key().cam_mode == 2

    def test_animated_from_zero_counts_as_live(self):
        # a spline hitting nonzero ANYWHERE in time must compile the
        # projection (values flow as arrays; the key is static)
        g = _sierpinski(cam_pitch=[0.0, 0.0, 1.0, 0.4])
        assert g.structure_key().cam_mode == 1

    def test_mode_zero_renders_identically_to_no_cam(self):
        from cuburn_tpu.profile import RenderProfile
        from cuburn_tpu.render import Renderer
        prof = RenderProfile(width=32, height=32, quality=30,
                             batch=512, iters_per_chunk=8, fuse=10,
                             hist_backend="scatter", de_enabled=False)
        h0, _ = Renderer(_sierpinski(), prof).accumulate(0.0, seed=3)
        h1, _ = Renderer(_sierpinski(cam_yaw=0.0, cam_dof=0.0),
                         prof).accumulate(0.0, seed=3)
        assert np.array_equal(np.asarray(h0), np.asarray(h1))


class TestProjectionPins:
    """Hand-computed values of the published algorithm."""

    def test_all_zero_is_identity(self):
        x = jnp.asarray([0.3, -1.2, 5.0], jnp.float32)
        y = jnp.asarray([-0.7, 2.2, 0.0], jnp.float32)
        ox, oy = project_3d(_cam3d(), x, y)
        np.testing.assert_allclose(ox, x, rtol=1e-6)
        np.testing.assert_allclose(oy, y, rtol=1e-6)

    def test_pure_yaw_spins_clockwise(self):
        # Rz(-yaw): (x, y) -> (x cos yaw + y sin yaw,
        #                      y cos yaw - x sin yaw)
        yaw = 0.37
        x = jnp.asarray([1.0, 0.0, 0.6], jnp.float32)
        y = jnp.asarray([0.0, 1.0, -0.4], jnp.float32)
        ox, oy = project_3d(_cam3d(yaw=yaw), x, y)
        c, s = np.cos(yaw), np.sin(yaw)
        np.testing.assert_allclose(ox, np.asarray(x) * c
                                   + np.asarray(y) * s, rtol=1e-5)
        np.testing.assert_allclose(oy, np.asarray(y) * c
                                   - np.asarray(x) * s, rtol=1e-5)

    def test_quarter_yaw_maps_axes(self):
        ox, oy = project_3d(_cam3d(yaw=np.pi / 2),
                            jnp.asarray([1.0], jnp.float32),
                            jnp.asarray([0.0], jnp.float32))
        # +x axis lands on -y: (1, 0) -> (0, -1)
        np.testing.assert_allclose(ox, [0.0], atol=1e-6)
        np.testing.assert_allclose(oy, [-1.0], rtol=1e-6)

    def test_pitch_with_perspective_foreshortens(self):
        # zpos 0: y' = y cos(p) / (1 - persp * y sin(p)); x' = x / zr
        p, q = 0.5, 0.4
        x = np.asarray([0.2, -0.3, 0.0], np.float32)
        y = np.asarray([0.5, -0.8, 1.2], np.float32)
        ox, oy = project_3d(_cam3d(pitch=p, persp=q),
                            jnp.asarray(x), jnp.asarray(y))
        zr = 1.0 - q * y * np.sin(p)
        np.testing.assert_allclose(oy, y * np.cos(p) / zr, rtol=1e-5)
        np.testing.assert_allclose(ox, x / zr, rtol=1e-5)

    def test_zpos_with_perspective_scales_uniformly(self):
        # pitch/yaw 0: depth = -zpos -> zr = 1 + persp * zpos
        q, z0 = 0.3, 2.0
        x = jnp.asarray([1.0, -0.4], jnp.float32)
        y = jnp.asarray([0.5, 0.9], jnp.float32)
        ox, oy = project_3d(_cam3d(persp=q, zpos=z0), x, y)
        s = 1.0 / (1.0 + q * z0)
        np.testing.assert_allclose(ox, np.asarray(x) * s, rtol=1e-5)
        np.testing.assert_allclose(oy, np.asarray(y) * s, rtol=1e-5)

    def test_pitch_zpos_shifts_y(self):
        # depth-shifted plane: y' = y cos(p) + zpos sin(p)
        p, z0 = 0.4, 1.5
        y = np.asarray([0.0, 0.7], np.float32)
        _, oy = project_3d(_cam3d(pitch=p, zpos=z0),
                           jnp.zeros((2,), jnp.float32),
                           jnp.asarray(y))
        np.testing.assert_allclose(
            oy, y * np.cos(p) + z0 * np.sin(p), rtol=1e-5)

    def test_dof_blur_statistics(self):
        # dr = u * 0.1 * dof * (-zpos), angle uniform: centroid is
        # preserved, spread is bounded by the max radius
        n = 4096
        rng = np.random.default_rng(0)
        u1 = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        u2 = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        x = jnp.full((n,), 0.3, jnp.float32)
        y = jnp.full((n,), -0.2, jnp.float32)
        dof, z0 = 2.0, -1.5     # z = -zpos = +1.5
        ox, oy = project_3d(_cam3d(dof=dof, zpos=z0), x, y, u1, u2)
        rmax = 0.1 * dof * 1.5
        r = np.hypot(np.asarray(ox) - 0.3, np.asarray(oy) + 0.2)
        assert r.max() <= rmax + 1e-5
        assert r.mean() > 0.2 * rmax          # genuinely spread out
        assert abs(np.asarray(ox).mean() - 0.3) < 0.02
        assert abs(np.asarray(oy).mean() + 0.2) < 0.02

    def test_behind_eye_points_are_rejected_by_bounds(self):
        # zr <= 0 must not crash; project() masks non-finite results
        from cuburn_tpu.ops.camera import CameraSpec, project
        spec = CameraSpec(8, 8)
        x = jnp.asarray([0.0], jnp.float32)
        y = jnp.asarray([2.0], jnp.float32)
        # persp * depth = 1 exactly -> zr = 0 -> inf
        ox, oy = project_3d(_cam3d(pitch=np.pi / 2, persp=0.5), x, y)
        addr, inb = project(spec, jnp.zeros((2,), jnp.float32),
                            jnp.float32(4.0), jnp.float32(0.0), ox, oy)
        assert not bool(inb[0])
        assert int(addr[0]) == spec.junk_bin


class TestRoundTrips:
    def test_flam3_xml_parse_and_serialize(self):
        from cuburn_tpu.genome.convert import (genome_to_flame_xml,
                                               parse_flam3)
        xml = ('<flame name="t" size="64 64" center="0 0" scale="50" '
               'cam_yaw="0.25" cam_pitch="0.5" cam_persp="0.3" '
               'cam_zpos="1.5" cam_dof="0.2">'
               '<xform weight="1" color="0" coefs="0.5 0 0 0.5 0 0"/>'
               '</flame>')
        g = parse_flam3(xml)[0]
        assert g.cam_yaw(0.0) == pytest.approx(0.25)
        assert g.cam_pitch(0.0) == pytest.approx(0.5)
        assert g.cam_perspective(0.0) == pytest.approx(0.3)  # cam_persp alias
        assert g.cam_zpos(0.0) == pytest.approx(1.5)
        assert g.cam_dof(0.0) == pytest.approx(0.2)
        assert g.structure_key().cam_mode == 2
        out = genome_to_flame_xml(g)
        g2 = parse_flam3(out)[0]
        for k in ("cam_yaw", "cam_pitch", "cam_perspective",
                  "cam_zpos", "cam_dof"):
            assert getattr(g2, k)(0.0) == pytest.approx(
                getattr(g, k)(0.0)), k

    def test_ember_spelling_wins_over_alias(self):
        from cuburn_tpu.genome.convert import parse_flam3
        xml = ('<flame size="8 8" cam_perspective="0.7" cam_persp="0.1">'
               '<xform weight="1" coefs="0.5 0 0 0.5 0 0"/></flame>')
        assert parse_flam3(xml)[0].cam_perspective(0.0) \
            == pytest.approx(0.7)

    def test_json_roundtrip(self):
        g = _sierpinski(cam_pitch=0.4, cam_perspective=0.2)
        g2 = Genome.from_json(g.to_json())
        assert g2.cam_pitch(0.0) == pytest.approx(0.4)
        assert g2.cam_perspective(0.0) == pytest.approx(0.2)
        assert g2.cam_yaw(0.0) == 0.0
        assert g2.structure_key().cam_mode == 1

    def test_json_omits_zero_cam_keys(self):
        import json
        doc = json.loads(_sierpinski().to_json())
        assert "cam_pitch" not in doc["camera"]

    def test_blend_interpolates_cam(self):
        from cuburn_tpu.genome.blend import blend_genomes
        a = _sierpinski(cam_pitch=0.0, cam_zpos=1.0)
        b = _sierpinski(cam_pitch=0.8, cam_zpos=3.0)
        m = blend_genomes(a, b)
        assert m.cam_pitch(0.5) == pytest.approx(0.4, abs=1e-6)
        assert m.cam_zpos(0.5) == pytest.approx(2.0, abs=1e-6)
        assert m.cam_pitch(0.0) == pytest.approx(0.0, abs=1e-6)
        assert m.cam_pitch(1.0) == pytest.approx(0.8, abs=1e-6)

    def test_packed_interp_matches_eval_at(self):
        from cuburn_tpu.ops.interp import pack_genome
        g = _sierpinski(cam_pitch=[0.0, 0.1, 1.0, 0.7],
                        cam_perspective=0.3)
        pg = pack_genome(g)
        for t in (0.0, 0.33, 1.0):
            want = g.eval_at(t).cam3d
            got = np.asarray(pg.eval_params(jnp.asarray([t])).cam3d[0])
            np.testing.assert_allclose(got, want, atol=1e-6)


class TestEndToEnd:
    def test_projection_against_independent_anchor(self):
        from tests.test_render import _anchor_compare
        g = _sierpinski(cam_pitch=0.45, cam_perspective=0.35,
                        cam_zpos=0.6, cam_yaw=0.3)
        _anchor_compare(g, 400_000, seed_ref=5, seed_our=11)

    def test_dof_against_independent_anchor(self):
        from tests.test_render import _anchor_compare
        # DOF consumes per-point RNG on both sides; distributions (not
        # point identities) must agree
        g = _sierpinski(cam_zpos=1.0, cam_perspective=0.2, cam_dof=1.0)
        _anchor_compare(g, 400_000, seed_ref=7, seed_our=13)

    def test_pitch_render_differs_from_flat(self):
        from cuburn_tpu.profile import RenderProfile
        from cuburn_tpu.render import Renderer
        prof = RenderProfile(width=32, height=32, quality=50,
                             batch=1024, iters_per_chunk=8, fuse=10,
                             hist_backend="scatter", de_enabled=False)
        h0, _ = Renderer(_sierpinski(), prof).accumulate(0.0, seed=3)
        h1, _ = Renderer(_sierpinski(cam_pitch=0.6,
                                     cam_perspective=0.4),
                         prof).accumulate(0.0, seed=3)
        d0 = np.asarray(h0)[:-1, 3]
        d1 = np.asarray(h1)[:-1, 3]
        assert d1.sum() > 0
        tv = 0.5 * np.abs(d0 / d0.sum() - d1 / d1.sum()).sum()
        assert tv > 0.05, "projection changed nothing"
