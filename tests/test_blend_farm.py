"""Tests: keyframe blending (genome/blend.py) and the frame farm
(parallel/farm.py) — reference layers 3 (blend) and 7 (dist/)."""

import dataclasses
import threading
import time

import numpy as np
import pytest

from cuburn_tpu.genome.blend import align_xforms, blend_genomes
from cuburn_tpu.models import classic_swirl, full_feature, sierpinski
from cuburn_tpu.profile import RenderProfile


class TestBlend:
    def test_endpoints_match_sources(self):
        a, b = sierpinski(), classic_swirl()
        edge = blend_genomes(a, b)
        pa = edge.eval_at(0.0)
        pb = edge.eval_at(1.0)
        n = len(edge.xforms)
        assert n == max(len(a.xforms), len(b.xforms))
        # endpoint affines match source values (padded rows identity)
        src_a = a.eval_at(0.0)
        src_b = b.eval_at(0.0)
        np.testing.assert_allclose(pa.affine[:len(a.xforms)],
                                   src_a.affine, atol=1e-5)
        # B's xforms may be reordered by the pairing heuristic:
        # compare as sorted row sets
        def rows(m):
            return np.asarray(sorted(map(tuple, np.round(m, 5))))
        np.testing.assert_allclose(
            rows(pb.affine[:len(b.xforms)]), rows(src_b.affine),
            atol=1e-5)
        np.testing.assert_allclose(pa.palette, src_a.palette, atol=1e-6)
        np.testing.assert_allclose(pb.palette, src_b.palette, atol=1e-6)

    @pytest.mark.parametrize("seed", [1, 2, 3, 5, 7, 8, 10, 12])
    def test_endpoints_match_sources_random_pairs(self, seed):
        """Blend fuzz: random flam3-genome-style pairs (mismatched
        xform counts, finals, xaos) must reproduce each source exactly
        at its endpoint — pads are zero-weight identity slots that may
        sit ANYWHERE in the slot order, so sources are compared as
        multisets over the nonzero-weight slots."""
        from cuburn_tpu.genome.randgen import random_genome
        a, b = random_genome(seed), random_genome(seed + 100)
        edge = blend_genomes(a, b)

        def rows(m):
            return np.asarray(sorted(map(tuple, np.round(m, 5))))

        for t, src in ((0.0, a), (1.0, b)):
            pe, ps = edge.eval_at(t), src.eval_at(0.0)
            w = np.asarray(pe.weights)
            live = w > 0
            assert live.sum() == len(src.xforms), (t, w)
            np.testing.assert_allclose(
                rows(np.asarray(pe.affine)[live]), rows(ps.affine),
                atol=1e-5)
            np.testing.assert_allclose(
                np.sort(w[live]),
                np.sort([x.weight(0.0) for x in src.xforms]),
                atol=1e-5)
            np.testing.assert_allclose(pe.palette, ps.palette,
                                       atol=1e-6)
        # interior of the morph stays finite/renderable
        pm = edge.eval_at(0.5)
        assert np.isfinite(np.asarray(pm.affine)).all()
        assert np.isfinite(np.asarray(pm.var_weights)).all()

    def test_variation_union_fades(self):
        a, b = sierpinski(), classic_swirl()    # linear vs swirl etc.
        edge = blend_genomes(a, b)
        key = edge.structure_key()
        assert "linear" in key.variations
        assert "swirl" in key.variations
        p_mid = edge.eval_at(0.5)
        assert p_mid.var_weights.shape[1] == len(key.variations)

    def test_variation_union_fades_to_zero_at_endpoints(self):
        """The union fade must actually reach zero: a side's exclusive
        variations carry ZERO total weight at the other endpoint and
        nonzero weight mid-morph (a fade stuck at 0.5, or no fade at
        all, passes any shape/membership check)."""
        from cuburn_tpu.genome.specs import Genome, XForm
        mk = lambda vname: Genome(
            xforms=[XForm(weight=1.0, color=0.3, color_speed=0.5,
                          affine=(0.5, 0.0, 0.2, 0.0, 0.5, 0.1),
                          vars={vname: 0.8}),
                    XForm(weight=0.7, color=0.7, color_speed=0.5,
                          affine=(0.4, 0.1, -0.2, -0.1, 0.4, 0.2),
                          vars={vname: 0.6})],
            scale=8.0, size=(64, 64), name=f"u_{vname}")
        a, b = mk("sinusoidal"), mk("swirl")
        edge = blend_genomes(a, b)
        names = list(edge.structure_key().variations)
        i_a, i_b = names.index("sinusoidal"), names.index("swirl")

        def total(t, col):
            return float(np.asarray(edge.eval_at(t).var_weights)
                         [:, col].sum())
        assert total(0.0, i_b) == 0.0     # b-only silent at t=0
        assert total(1.0, i_a) == 0.0     # a-only silent at t=1
        assert total(0.0, i_a) == pytest.approx(1.4, abs=1e-5)
        assert total(1.0, i_b) == pytest.approx(1.4, abs=1e-5)
        assert 0.0 < total(0.5, i_a) < 1.4
        assert 0.0 < total(0.5, i_b) < 1.4

    def test_padding_xforms_have_zero_weight(self):
        a, b = sierpinski(), classic_swirl()   # 3 vs 3; force pad
        b2 = classic_swirl()
        b2.xforms = b2.xforms[:2]
        edge = blend_genomes(a, b2)
        pb = edge.eval_at(1.0)
        # exactly one B-side slot is the padded identity, fading to
        # nothing (its slot depends on the pairing heuristic)
        assert (np.asarray(pb.weights) == 0.0).sum() == 1

    def test_rot_center_blends(self):
        """Animated edges keep the rotation pivot: blend_genomes must
        carry rot_center (regression: it was dropped, so an animation
        rotated about `center` while its own endpoint stills pivoted
        on rot_center)."""
        a = dataclasses.replace(sierpinski(), rot_center=(0.5, -0.4))
        b = dataclasses.replace(classic_swirl(), rot_center=(0.1, 0.2))
        edge = blend_genomes(a, b)
        assert edge.rot_center is not None
        np.testing.assert_allclose(
            [edge.rot_center[0](0.0), edge.rot_center[1](0.0)],
            [0.5, -0.4], atol=1e-6)
        np.testing.assert_allclose(
            [edge.rot_center[0](1.0), edge.rot_center[1](1.0)],
            [0.1, 0.2], atol=1e-6)
        # one-sided: the absent side falls back to its own center
        # (same fallback GenomeParams.at applies)
        c = classic_swirl()
        edge2 = blend_genomes(a, c)
        assert edge2.rot_center is not None
        np.testing.assert_allclose(
            [edge2.rot_center[0](1.0), edge2.rot_center[1](1.0)],
            [c.center[0](0.0), c.center[1](0.0)], atol=1e-6)
        # neither side pins a pivot: stays None
        assert blend_genomes(sierpinski(),
                             classic_swirl()).rot_center is None

    def test_spin(self):
        a, b = sierpinski(), sierpinski()
        edge = blend_genomes(a, b, spin=1.0)
        assert edge.rotate(1.0) - edge.rotate(0.0) == pytest.approx(360.0)

    def test_edge_renders(self):
        from cuburn_tpu.render import Renderer
        edge = blend_genomes(sierpinski(), classic_swirl())
        prof = RenderProfile(width=64, height=64, quality=30,
                             batch=1024, iters_per_chunk=8, fuse=16,
                             hist_backend="scatter", de_enabled=False)
        img0, _ = Renderer(edge, prof).render_frame(0.0, 1)
        img5, _ = Renderer(edge, prof).render_frame(0.5, 1)
        img1, _ = Renderer(edge, prof).render_frame(1.0, 1)
        assert img0[..., :3].max() > 0
        assert not np.array_equal(img0, img1)
        assert not np.array_equal(img0, img5)

    def test_pairing_matches_structure_not_index(self):
        """Morph-quality: blending a genome against a PERMUTED copy of
        itself must pair identical xforms (an identity morph — every
        parameter spline constant), which index-order pairing cannot
        do.  This is the VERDICT round-1 'blend pairing is index-order'
        gap."""
        a = full_feature()
        b = full_feature()
        b.xforms = [b.xforms[i] for i in (2, 0, 1)]
        edge = blend_genomes(a, b, pairing="greedy")
        for xf in edge.xforms:
            assert xf.weight.is_constant
            assert all(s.is_constant for s in xf.affine)
            for s in xf.vars.values():
                assert s.is_constant
        # index pairing, by contrast, cross-fades mismatched xforms
        edge_ix = blend_genomes(a, b, pairing="index")
        assert any(not xf.weight.is_constant or
                   not all(s.is_constant for s in xf.affine)
                   for xf in edge_ix.xforms)

    def test_pairing_prefers_variation_overlap(self):
        """An xform keeping its variation set but changing weight must
        still pair with its structural partner."""
        from cuburn_tpu.genome.blend import align_xforms
        from cuburn_tpu.genome.specs import XForm
        a = sierpinski()
        a.xforms[0].vars = {"spherical": 0.8}
        b = sierpinski()
        b.xforms = [b.xforms[1], b.xforms[2],
                    XForm(weight=0.7, vars={"spherical": 0.5},
                          affine=b.xforms[0].affine)]
        xa, xb, n, _pa, pb = align_xforms(a, b)
        # A's spherical xform (slot 0) pairs with B's (originally 2)
        assert "spherical" in xb[0].vars
        assert pb[0] == 2

    def test_xaos_blending(self):
        a, b = full_feature(), sierpinski()
        edge = blend_genomes(a, b)
        p0 = edge.eval_at(0.0)
        p1 = edge.eval_at(1.0)
        src = full_feature().eval_at(0.0)
        k = len(a.xforms)
        np.testing.assert_allclose(p0.xaos[:k, :k], src.xaos, atol=1e-5)
        np.testing.assert_allclose(p1.xaos, 1.0, atol=1e-5)


class TestFarm:
    def _profile(self):
        return RenderProfile(width=48, height=48, quality=20,
                             batch=1024, iters_per_chunk=8, fuse=8,
                             hist_backend="scatter", de_enabled=False)

    def test_end_to_end(self):
        from cuburn_tpu.parallel.farm import (FarmClient, FarmServer,
                                              run_worker)
        server = FarmServer()
        server.serve_background()
        try:
            client = FarmClient(server.address)
            ids = client.submit_animation(
                sierpinski(), self._profile(), [0.0, 0.0, 0.0], seed=3)
            # second identical batch: workers must reproduce it exactly
            ids2 = client.submit_animation(
                sierpinski(), self._profile(), [0.0, 0.0, 0.0], seed=3)
            assert len(ids) == 3
            workers = [threading.Thread(
                target=run_worker, args=(server.address,),
                kwargs={"max_tasks": 3}) for _ in range(2)]
            for w in workers:
                w.start()
            frames = [client.fetch(i, timeout=180) for i in ids]
            frames2 = [client.fetch(i, timeout=180) for i in ids2]
            for w in workers:
                w.join(timeout=60)
            for f in frames:
                assert f.shape == (48, 48, 4)
                assert f[..., :3].max() > 0
            # determinism: same (genome, t, seed+i) job renders the
            # same frame regardless of which worker picked it up
            for f1, f2 in zip(frames, frames2):
                np.testing.assert_array_equal(f1, f2)
            # per-frame seed policy (seed + i): frames within a batch
            # use DIFFERENT seeds at the same t
            assert not np.array_equal(frames[0], frames[1])
            client.close()
        finally:
            server.shutdown()

    def test_lease_requeue_on_worker_loss(self):
        from cuburn_tpu.parallel.farm import FarmState
        # generous lease/margins: with a 0.1s lease a loaded CI
        # machine could stall past expiry between get_task calls and
        # flake the 'leased, not available' assert
        st = FarmState(lease_seconds=2.0)
        [tid] = st.submit("{}", {}, [0.0])
        t1 = st.get_task()
        assert t1 is not None and t1.job_id == tid
        assert st.get_task() is None            # leased, not available
        time.sleep(2.2)
        t2 = st.get_task()                      # lease expired: requeued
        assert t2 is not None and t2.job_id == tid
        st.put_result(tid, b"xx", (1, 2))
        assert st.get_task() is None            # done: never re-issued

    def test_fetch_evicts_result_after_grace(self):
        """fetch() consumes — after a grace window: the server must not
        pin every rendered frame forever (regression: unbounded memory
        growth on long farms), but a retried fetch inside the window
        must still succeed (round-3 advisor: immediate eviction made a
        lost fetch response unrecoverable)."""
        from cuburn_tpu.parallel.farm import FarmState
        st = FarmState(result_grace_seconds=0.5)
        [tid] = st.submit("{}", {}, [0.0])
        assert st.fetch(tid) is None            # not done yet
        st.get_task()
        st.put_result(tid, b"frame", (1, 5))
        assert st.fetch(tid) == (b"frame", (1, 5))
        # retry within the grace window (lost-response recovery)
        assert st.fetch(tid) == (b"frame", (1, 5))
        assert tid in st.tasks                  # not yet evicted
        time.sleep(0.6)
        assert st.fetch(tid) is None            # grace over: evicted
        assert tid not in st.tasks


class TestNativeOutput:
    def test_native_png_matches_pil_decode(self, tmp_path):
        fastout = pytest.importorskip("cuburn_tpu.native.fastout")
        from PIL import Image
        rng = np.random.RandomState(3)
        img = (rng.rand(33, 47, 4) * 255).astype(np.uint8)
        png = fastout.encode_png(img.tobytes(), 47, 33)
        import io
        back = np.asarray(Image.open(io.BytesIO(png)))
        np.testing.assert_array_equal(back, img)

    def test_native_ycbcr_matches_python(self):
        fastout = pytest.importorskip("cuburn_tpu.native.fastout")
        rng = np.random.RandomState(4)
        img = (rng.rand(16, 16, 4) * 255).astype(np.uint8)
        ycc = np.frombuffer(
            fastout.rgb_to_ycbcr444(img.tobytes(), 16, 16), np.uint8
        ).reshape(3, 16, 16).astype(np.float64)
        rgb = img[..., :3].astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 + (b - y) * 0.564
        cr = 128 + (r - y) * 0.713
        assert np.abs(ycc[0] - y).max() <= 1.5
        assert np.abs(ycc[1] - cb).max() <= 1.5
        assert np.abs(ycc[2] - cr).max() <= 1.5

    def test_write_image_uses_native(self, tmp_path):
        from cuburn_tpu import output as om
        if om._fastout is None:
            pytest.skip("extension not built")
        img = np.zeros((8, 8, 4), np.uint8)
        img[..., 1] = 200
        p = tmp_path / "n.png"
        om.write_image(str(p), img)
        from PIL import Image
        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back, img)


class TestSequence:
    def test_sequence_uses_flame_times(self):
        """flam3 <flame time=...> attributes set keyframe spacing."""
        from cuburn_tpu.genome.blend import blend_sequence
        gs = [sierpinski(), classic_swirl(), sierpinski()]
        for g, t in zip(gs, (0.0, 10.0, 40.0)):
            g.flame_time = t
        segs = blend_sequence(gs)
        assert [(s, e) for _, s, e in segs] == [(0.0, 10.0),
                                                (10.0, 40.0)]
        # non-increasing times fall back to list order
        gs[2].flame_time = 5.0
        segs = blend_sequence(gs)
        assert [(s, e) for _, s, e in segs] == [(0.0, 1.0), (1.0, 2.0)]

    def test_smooth_sequence_c1_at_keyframes(self):
        """flam3 smooth interpolation: adjacent edges share tangents
        at interior keyframes (4-keyframe Catmull-Rom), unlike the
        linear default whose slope jumps."""
        from cuburn_tpu.genome.blend import blend_sequence
        from cuburn_tpu.genome.spline import Spline
        gs = []
        for scale in (100.0, 200.0, 150.0, 300.0):
            g = sierpinski()
            g.scale = Spline(scale)
            g.interpolation = "smooth"
            gs.append(g)
        segs = blend_sequence(gs)
        e0, e1 = segs[0][0], segs[1][0]
        # endpoints exact
        assert e0.scale(0.0) == pytest.approx(100.0)
        assert e0.scale(1.0) == pytest.approx(200.0)
        assert e1.scale(0.0) == pytest.approx(200.0)
        # C1: slope leaving edge0 at t=1 == slope entering edge1 at 0
        h = 1e-4
        s_out = (e0.scale(1.0) - e0.scale(1.0 - h)) / h
        s_in = (e1.scale(h) - e1.scale(0.0)) / h
        assert s_out == pytest.approx(s_in, rel=1e-2)
        # and it's genuinely non-linear (CR tangent != chord slope)
        assert s_out != pytest.approx(100.0, rel=0.2)
        # linear mode by contrast has a slope break
        segs_l = blend_sequence(gs, smooth=False)
        l0, l1 = segs_l[0][0], segs_l[1][0]
        lo = (l0.scale(1.0) - l0.scale(1.0 - h)) / h
        li = (l1.scale(h) - l1.scale(0.0)) / h
        assert abs(lo - li) > 10.0

    def test_smooth_sequence_renders(self):
        from cuburn_tpu.genome.blend import blend_sequence
        from cuburn_tpu.render import Renderer
        gs = [sierpinski(), classic_swirl(), sierpinski()]
        for g in gs:
            g.interpolation = "smooth"
        segs = blend_sequence(gs)
        prof = RenderProfile(width=48, height=48, quality=20,
                             batch=1024, iters_per_chunk=8, fuse=8,
                             hist_backend="scatter", de_enabled=False)
        img, st = Renderer(segs[0][0], prof).render_frame(0.5, seed=2)
        assert st.plotted_samples > 0
        assert img[..., :3].max() > 0

    def test_loop_genome_spins_animated_xforms(self):
        """flam3-animate loops: animate-flagged xforms rotate their
        affine linear part a full turn over [0,1]; others hold."""
        import numpy as np
        from cuburn_tpu.genome.blend import loop_genome
        g = full_feature()
        g.xforms[0].animate = 1.0
        lg = loop_genome(g)
        a0 = np.array([s(0.0) for s in lg.xforms[0].affine])
        a_half = np.array([s(0.5) for s in lg.xforms[0].affine])
        a1 = np.array([s(1.0) for s in lg.xforms[0].affine])
        np.testing.assert_allclose(a1, a0, atol=1e-9)   # full turn
        # half turn: linear part negated, translation fixed
        base = np.array([s(0.0) for s in g.xforms[0].affine])
        np.testing.assert_allclose(
            a_half[[0, 1, 3, 4]], -base[[0, 1, 3, 4]], atol=1e-6)
        np.testing.assert_allclose(a_half[[2, 5]], base[[2, 5]])
        # rotation preserves the linear part's determinant throughout
        det0 = a0[0] * a0[4] - a0[1] * a0[3]
        ah = [s(0.31) for s in lg.xforms[0].affine]
        det = ah[0] * ah[4] - ah[1] * ah[3]
        assert det == pytest.approx(det0, rel=1e-4)
        # non-animated xform untouched
        assert all(s.is_constant for s in lg.xforms[1].affine)

    def test_sequence_with_loops(self):
        from cuburn_tpu.genome.blend import blend_sequence
        gs = [sierpinski(), classic_swirl()]
        gs[0].xforms[0].animate = 1.0
        segs = blend_sequence(gs, loops=1.0)
        # loop(g0), edge, loop(g1)
        assert len(segs) == 3
        assert segs[0][0].name.endswith(":loop")
        assert [(s, e) for _, s, e in segs] == \
            [(0.0, 1.0), (1.0, 2.0), (2.0, 3.0)]

    def test_flame_time_roundtrips(self):
        from cuburn_tpu.genome import convert
        from cuburn_tpu.genome.specs import Genome
        g = sierpinski()
        g.flame_time = 12.5
        [g2] = convert.parse_flam3(convert.genome_to_flame_xml(g))
        assert g2.flame_time == 12.5
        g3 = Genome.from_json(g.to_json())
        assert g3.flame_time == 12.5

    def test_blend_sequence_segments(self):
        from cuburn_tpu.genome.blend import blend_sequence
        gs = [sierpinski(), classic_swirl(), full_feature()]
        seq = blend_sequence(gs)
        assert len(seq) == 2
        (e0, s0, t0), (e1, s1, t1) = seq
        assert (s0, t0, s1, t1) == (0.0, 1.0, 1.0, 2.0)
        # continuity at the junction: e0@1 and e1@0 both equal genome 1
        import numpy as np
        mid_a = e0.eval_at(1.0)
        mid_b = e1.eval_at(0.0)
        k = len(classic_swirl().xforms)
        np.testing.assert_allclose(mid_a.affine[:k], mid_b.affine[:k],
                                   atol=1e-5)

    def test_single_keyframe_raises(self):
        from cuburn_tpu.genome.blend import blend_sequence
        with pytest.raises(ValueError):
            blend_sequence([sierpinski()])

    def test_cli_sequence_animation(self, tmp_path):
        from cuburn_tpu.genome.convert import genome_to_flame_xml
        from cuburn_tpu.main import main
        xml = "<flames>%s%s</flames>" % (
            genome_to_flame_xml(sierpinski()),
            genome_to_flame_xml(classic_swirl()))
        p = tmp_path / "seq.flam3"
        p.write_text(xml)
        out = tmp_path / "seq.y4m"
        rc = main([str(p), "-o", str(out), "--animate",
                   "--profile", "preview", "--width", "48",
                   "--height", "48", "--quality", "10"])
        assert rc == 0
        data = out.read_bytes()
        assert data.count(b"FRAME\n") >= 2

    def test_cli_sequence_no_duplicate_junction_frames(self, tmp_path):
        """Each edge spans [0, 1] inclusive and edge k's end pose IS
        edge k+1's start pose — the CLI must drop the first frame of
        every later segment (regression: 3 keyframes at 3 fps x 1 s
        per segment emitted 6 frames with a stuttered duplicate at
        the interior keyframe; correct is 5)."""
        from cuburn_tpu.genome.convert import genome_to_flame_xml
        from cuburn_tpu.main import main
        xml = "<flames>%s%s%s</flames>" % (
            genome_to_flame_xml(sierpinski()),
            genome_to_flame_xml(classic_swirl()),
            genome_to_flame_xml(sierpinski()))
        p = tmp_path / "seq3.flam3"
        p.write_text(xml)
        out = tmp_path / "seq3.y4m"
        rc = main([str(p), "-o", str(out), "--animate",
                   "--profile", "preview", "--width", "48",
                   "--height", "48", "--quality", "10",
                   "--fps", "3", "--duration", "2"])
        assert rc == 0
        assert out.read_bytes().count(b"FRAME\n") == 5


class TestFarmCLI:
    """The three _main entry points driven in-process: server thread,
    client submit, worker drain, client collect (the reference's dist
    server/worker/client workflow from the shell)."""

    def test_server_worker_client_roundtrip(self, tmp_path):
        import threading
        from cuburn_tpu.parallel.farm import (FarmServer, FarmClient,
                                              run_worker, _main)
        from cuburn_tpu.models import sierpinski

        srv = FarmServer("127.0.0.1", 0, lease_seconds=30)
        srv.serve_background()
        try:
            addr = f"127.0.0.1:{srv.address[1]}"
            # write a genome file for the client CLI
            gpath = tmp_path / "g.json"
            gpath.write_text(sierpinski().to_json())
            outdir = tmp_path / "frames"

            client_rc = {}

            def client():
                client_rc["rc"] = _main([
                    "client", addr, str(gpath), "-o", str(outdir),
                    "--frames", "2", "--profile", "preview"])

            th = threading.Thread(target=client, daemon=True)
            th.start()
            # wait until the client's submit actually landed (the
            # worker exits immediately on an empty queue when
            # --max-tasks is set)
            import time as _t
            deadline = _t.time() + 30
            while not srv.state.tasks and _t.time() < deadline:
                _t.sleep(0.05)
            assert srv.state.tasks, "client never submitted"
            rc = _main(["worker", addr, "--max-tasks", "2"])
            assert rc == 0
            th.join(timeout=120)
            assert client_rc.get("rc") == 0
            frames = sorted(outdir.glob("frame_*.png"))
            assert len(frames) == 2
            from PIL import Image
            img = np.asarray(Image.open(frames[0]))
            assert img.shape[2] == 4 and img[..., :3].max() > 0
        finally:
            srv.shutdown()


class TestHarmonize:
    """harmonize_structures: one compiled program per SEQUENCE instead
    of one per edge (structure keys unified by zero-weight padding)."""

    def _genomes(self):
        from cuburn_tpu.genome.specs import Genome, XForm
        pal = [(0.0, np.zeros((256, 3)))]
        a = Genome(xforms=[XForm(weight=1.0, vars={"linear": 1.0},
                                 affine=(0.5, 0, 0.2, 0, 0.5, 0.1))],
                   palettes=pal, name="a")
        b = Genome(xforms=[
            XForm(weight=1.0, vars={"spherical": 0.8},
                  affine=(0.6, 0, -0.2, 0, 0.6, 0.2),
                  post=(1, 0, 0.1, 0, 1, 0)),
            XForm(weight=0.5, vars={"swirl": 0.5},
                  affine=(0.4, 0.2, 0, -0.2, 0.4, -0.2))],
            xaos=[[1.0, 0.5], [1.0, 1.0]],
            final_xform=XForm(vars={"bubble": 1.0}),
            palettes=pal, name="b")
        c = Genome(xforms=[XForm(weight=1.0,
                                 vars={"sinusoidal": 1.0},
                                 affine=(0.5, 0, 0, 0, 0.5, -0.3))],
                   palettes=pal, name="c")
        return a, b, c

    def test_sequence_edges_share_structure_key(self):
        from cuburn_tpu.genome.blend import blend_sequence
        a, b, c = self._genomes()
        segs = blend_sequence([a, b, c])
        keys = {g.structure_key() for g, _s, _e in segs}
        assert len(keys) == 1, keys
        # and without harmonization they genuinely differ
        segs_raw = blend_sequence([a, b, c], harmonize=False)
        keys_raw = {g.structure_key() for g, _s, _e in segs_raw}
        assert len(keys_raw) > 1

    def test_harmonized_render_is_bit_identical(self):
        """Deterministic-variation genomes: zero-weight padding must
        not change a single bit of the rendered image."""
        from cuburn_tpu.genome.blend import (blend_genomes,
                                             harmonize_structures)
        from cuburn_tpu.profile import RenderProfile
        from cuburn_tpu.render import Renderer
        a, b, c = self._genomes()
        edge = blend_genomes(a, b)
        [h] = harmonize_structures([edge])
        # harmonizing a genome alone is a no-op
        assert h.structure_key() == edge.structure_key()
        # harmonize against c's union to actually add padding
        h2, _ = harmonize_structures([edge, c])
        assert "sinusoidal" in h2.structure_key().variations
        prof = RenderProfile(width=48, height=48, quality=25,
                             batch=2048, iters_per_chunk=8, fuse=12,
                             hist_backend="scatter", de_enabled=False)
        img_raw, _ = Renderer(edge, prof).render_frame(0.5, seed=6)
        img_h, _ = Renderer(h2, prof).render_frame(0.5, seed=6)
        np.testing.assert_array_equal(img_raw, img_h)



    def test_padding_injects_linear_into_every_union(self):
        """Xform-count padding adds identity (linear) xforms, so
        linear must enter EVERY genome's union or keys still differ
        (review repro: 2-xform no-linear vs 1-xform genomes)."""
        from cuburn_tpu.genome.blend import harmonize_structures
        from cuburn_tpu.genome.specs import Genome, XForm
        pal = [(0.0, np.zeros((256, 3)))]
        b = Genome(xforms=[
            XForm(weight=1.0, vars={"spherical": 1.0}),
            XForm(weight=0.5, vars={"swirl": 0.5})],
            palettes=pal, name="b")
        c = Genome(xforms=[XForm(weight=1.0,
                                 vars={"sinusoidal": 1.0})],
                   palettes=pal, name="c")
        hb, hc = harmonize_structures([b, c])
        assert hb.structure_key() == hc.structure_key()
        assert "linear" in hb.structure_key().variations

    def test_empty_vars_final_keeps_implicit_linear(self):
        """A final xform with EMPTY vars is an implicit linear map;
        harmonization must materialize it, not zero it out (review
        repro: final weights went [1.] -> [0.])."""
        from cuburn_tpu.genome.blend import harmonize_structures
        from cuburn_tpu.genome.specs import Genome, XForm
        pal = [(0.0, np.zeros((256, 3)))]
        g1 = Genome(xforms=[XForm(weight=1.0, vars={"linear": 1.0})],
                    final_xform=XForm(affine=(0.9, 0, 0, 0, 0.9, 0)),
                    palettes=pal, name="g1")
        g2 = Genome(xforms=[XForm(weight=1.0, vars={"linear": 1.0})],
                    final_xform=XForm(vars={"bubble": 1.0}),
                    palettes=pal, name="g2")
        h1, h2 = harmonize_structures([g1, g2])
        assert h1.structure_key() == h2.structure_key()
        assert h1.final_xform.vars["linear"](0.0) == 1.0
        p = h1.eval_at(0.0)
        assert p.final_var_weights.max() == 1.0   # not a zero map

    def test_harmonize_preserves_values(self):
        from cuburn_tpu.genome.blend import harmonize_structures
        a, b, c = self._genomes()
        ha, hb, hc = harmonize_structures([a, b, c])
        # original weights/affines untouched
        assert ha.xforms[0].weight(0) == 1.0
        assert ha.xforms[0].vars["linear"](0) == 1.0
        assert ha.xforms[0].vars["spherical"](0.7) == 0.0
        # padded xforms have weight 0 (never selected)
        assert ha.xforms[1].weight(0) == 0.0
        # xaos filled with ones where absent
        assert ha.xaos is not None
        assert all(v(0) == 1.0 for row in ha.xaos for v in row)
        # b keeps its real xaos
        assert hb.xaos[0][1](0) == 0.5


def test_blend_carries_filter_settings():
    """Edge genomes must inherit filter-shape/temporal-filter settings
    instead of resetting them to defaults."""
    from cuburn_tpu.genome.blend import blend_genomes
    from cuburn_tpu.genome.specs import Genome, XForm
    pal = [(0.0, np.zeros((256, 3)))]
    a = Genome(xforms=[XForm(weight=1, vars={"linear": 1.0})],
               spatial_filter_shape="mitchell",
               temporal_filter_type="gaussian",
               temporal_filter_width=1.5,
               palettes=pal, name="a")
    b = Genome(xforms=[XForm(weight=1, vars={"linear": 1.0})],
               temporal_filter_width=0.5, palettes=pal, name="b")
    edge = blend_genomes(a, b)
    assert edge.spatial_filter_shape == "mitchell"
    assert edge.temporal_filter_type == "gaussian"
    assert edge.temporal_filter_width(0.0) == pytest.approx(1.5)
    assert edge.temporal_filter_width(1.0) == pytest.approx(0.5)


def test_blend_empty_vars_final_keeps_linear():
    """Blending against a final xform with EMPTY vars (implicit
    linear): the edge's final must fade linear 1 -> 0, not start as a
    zero map at t=0."""
    from cuburn_tpu.genome.blend import blend_genomes
    from cuburn_tpu.genome.specs import Genome, XForm
    pal = [(0.0, np.zeros((256, 3)))]
    a = Genome(xforms=[XForm(weight=1, vars={"linear": 1.0})],
               final_xform=XForm(affine=(0.8, 0, 0, 0, 0.8, 0)),
               palettes=pal, name="a")
    b = Genome(xforms=[XForm(weight=1, vars={"linear": 1.0})],
               final_xform=XForm(vars={"bubble": 1.0}),
               palettes=pal, name="b")
    edge = blend_genomes(a, b)
    assert edge.final_xform.vars["linear"](0.0) == pytest.approx(1.0)
    assert edge.final_xform.vars["linear"](1.0) == pytest.approx(0.0)
    assert edge.final_xform.vars["bubble"](1.0) == pytest.approx(1.0)
    p0 = edge.eval_at(0.0)
    assert p0.final_var_weights.max() == pytest.approx(1.0)


def test_mutate_variation_saturated_degrades_gracefully():
    """When every xform already carries the whole safe variation set,
    a 'variation' mutation falls back to an affine jitter instead of
    crashing (review finding)."""
    from cuburn_tpu.genome.randgen import _SAFE_VARS, mutate
    from cuburn_tpu.genome.specs import Genome, XForm
    g = Genome(xforms=[XForm(weight=1.0,
                             vars={v: 0.01 for v in _SAFE_VARS})],
               palettes=[(0.0, np.zeros((256, 3)))], name="full")
    m = mutate(g, 3, "variation")
    assert "affine" in m.name
    assert m.xforms[0].affine[0](0) != g.xforms[0].affine[0](0)
