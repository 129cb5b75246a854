"""Renderer/pipeline integration tests (SURVEY.md §4 golden-image row):
tiny genomes, fixed PRNG keys, structural and statistical assertions on
the rendered output — the regression corpus the reference only had as
manual eyeballing."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuburn_tpu.models import (animated_spark, classic_swirl,
                               full_feature, sierpinski)
from cuburn_tpu.profile import RenderProfile, get_profile
from cuburn_tpu.render import Renderer

FAST = RenderProfile(width=96, height=96, quality=60, batch=2048,
                     iters_per_chunk=16, fuse=16,
                     hist_backend="scatter", de_enabled=False)


class TestStillRender:
    def test_sierpinski_structure(self):
        """The attractor has the Sierpinski gasket's self-similar
        structure: the middle of the triangle is empty."""
        img, stats = Renderer(sierpinski(), FAST).render_frame(0.0, 1)
        assert img.shape == (96, 96, 4)
        assert stats.retention > 0.5
        lum = img[..., :3].astype(np.float64).sum(-1)
        # the central removed triangle of the gasket must be empty:
        # its center is the centroid (0, -0.289) in world units
        # (corners (+-1,-0.866),(0,0.866); world +y maps down)
        ppu_eff = 220.0 * 96 / 512
        cy = int(round(48 + (-0.289) * ppu_eff))
        assert lum[cy - 1:cy + 2, 47:50].max() == 0.0
        assert lum.sum() > 0
        # symmetry: left-right mirror approximately equal mass
        assert abs(lum[:, :48].sum() - lum[:, 48:].sum()) \
            / lum.sum() < 0.1

    def test_deterministic_given_seed(self):
        r = Renderer(sierpinski(), FAST)
        img1, _ = r.render_frame(0.0, seed=9)
        img2, _ = r.render_frame(0.0, seed=9)
        np.testing.assert_array_equal(img1, img2)

    def test_different_seeds_statistically_same(self):
        r = Renderer(sierpinski(), FAST)
        img1, _ = r.render_frame(0.0, seed=1)
        img2, _ = r.render_frame(0.0, seed=2)
        m1 = img1[..., :3].astype(np.float64).mean()
        m2 = img2[..., :3].astype(np.float64).mean()
        assert m1 == pytest.approx(m2, rel=0.1)

    def test_classic_swirl_renders(self):
        img, stats = Renderer(classic_swirl(), FAST).render_frame(0.0, 1)
        assert img[..., :3].max() > 0
        assert stats.plotted_samples > 0

    def test_full_feature_renders(self):
        img, stats = Renderer(full_feature(), FAST).render_frame(0.0, 1)
        assert img[..., :3].max() > 0

    def test_de_enabled_spreads_sparse_mass(self):
        """DE must blur low-density regions: count lit pixels with and
        without DE at low quality; DE strictly increases coverage."""
        g = sierpinski()
        g.estimator_radius = __import__(
            "cuburn_tpu.genome.spline", fromlist=["Spline"]
        ).Spline(5.0)
        lowq = dataclasses.replace(FAST, quality=8)
        img_de, _ = Renderer(
            g, dataclasses.replace(lowq, de_enabled=True)
        ).render_frame(0.0, 3)
        img_no, _ = Renderer(
            g, dataclasses.replace(lowq, de_enabled=False)
        ).render_frame(0.0, 3)
        lit_de = (img_de[..., :3].sum(-1) > 0).sum()
        lit_no = (img_no[..., :3].sum(-1) > 0).sum()
        assert lit_de > lit_no * 1.2

    def test_supersampling(self):
        prof = dataclasses.replace(FAST, ss=2)
        img, _ = Renderer(sierpinski(), prof).render_frame(0.0, 1)
        assert img.shape == (96, 96, 4)
        assert img[..., :3].max() > 0

    def test_transparent_mode(self):
        prof = dataclasses.replace(FAST, transparent=True)
        img, _ = Renderer(sierpinski(), prof).render_frame(0.0, 1)
        # alpha varies (not all-opaque), background pixels transparent
        assert img[..., 3].min() == 0
        assert img[..., 3].max() > 0


class TestAnimation:
    def test_motion_blur_differs_from_still(self):
        g = animated_spark()
        prof1 = dataclasses.replace(FAST, temporal_samples=1)
        prof4 = dataclasses.replace(FAST, temporal_samples=4)
        img1, _ = Renderer(g, prof1).render_frame(0.5, seed=2)
        img4, s4 = Renderer(g, prof4).render_frame(0.5, seed=2)
        assert s4.plotted_samples > 0
        assert not np.array_equal(img1, img4)

    def test_frames_iterator(self):
        g = animated_spark()
        prof = dataclasses.replace(FAST, fps=4.0, duration=0.75)
        frames = list(Renderer(g, prof).frames(seed=1))
        assert len(frames) == 3
        # animated genome: successive frames differ
        assert not np.array_equal(frames[0][0], frames[-1][0])

    def test_animated_genome_time_variation(self):
        g = animated_spark()
        r = Renderer(g, FAST)
        img_a, _ = r.render_frame(0.0, seed=5)
        img_b, _ = r.render_frame(1.0, seed=5)
        assert not np.array_equal(img_a, img_b)


class TestOutput:
    def test_png_roundtrip(self, tmp_path):
        from cuburn_tpu.output import write_image
        from PIL import Image
        img, _ = Renderer(sierpinski(), FAST).render_frame(0.0, 1)
        p = tmp_path / "out.png"
        write_image(str(p), img)
        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back, img)

    def test_y4m_sink(self, tmp_path):
        from cuburn_tpu.output import Y4MSink
        p = tmp_path / "out.y4m"
        sink = Y4MSink(str(p), 96, 96, fps=24)
        img = np.zeros((96, 96, 4), np.uint8)
        img[..., 0] = 255
        sink.write_frame(img)
        sink.write_frame(img)
        sink.close()
        data = p.read_bytes()
        assert data.startswith(b"YUV4MPEG2 W96 H96")
        assert data.count(b"FRAME\n") == 2


class TestCLI:
    def test_still_render(self, tmp_path):
        from cuburn_tpu.main import main
        out = tmp_path / "cli.png"
        rc = main(["gallery:sierpinski", "-o", str(out),
                   "--profile", "preview", "--width", "64",
                   "--height", "64", "--quality", "30"])
        assert rc == 0
        assert out.exists()

    def test_convert(self, capsys):
        from cuburn_tpu.main import main
        rc = main(["gallery:full_feature", "--convert"])
        assert rc == 0
        text = capsys.readouterr().out
        from cuburn_tpu.genome.specs import Genome
        g = Genome.from_json(text)
        assert g.structure_key() == full_feature().structure_key()

    def test_flam3_file_input(self, tmp_path):
        from cuburn_tpu.genome.convert import genome_to_flame_xml
        from cuburn_tpu.main import main
        xml = genome_to_flame_xml(classic_swirl())
        p = tmp_path / "g.flam3"
        p.write_text(xml)
        out = tmp_path / "g.png"
        rc = main([str(p), "-o", str(out), "--profile", "preview",
                   "--width", "64", "--height", "64",
                   "--quality", "20"])
        assert rc == 0
        assert out.exists()


class TestCheckpointResume:
    def test_resume_accumulation_doubles_mass(self):
        r = Renderer(sierpinski(), FAST)
        h1, s1 = r.accumulate(0.0, seed=1)
        h2, s2 = r.accumulate(0.0, seed=2, hist0=np.asarray(h1))
        m1 = float(np.asarray(h1)[:-1, 3].sum())
        m2 = float(np.asarray(h2)[:-1, 3].sum())
        assert m2 == pytest.approx(2 * m1, rel=0.05)
        img = r.finalize_frame(h2, 0.0)
        assert img[..., :3].max() > 0

    def test_resume_shape_validation(self):
        r = Renderer(sierpinski(), FAST)
        with pytest.raises(ValueError):
            r.accumulate(0.0, hist0=np.zeros((7, 4), np.float32))

    def test_cli_save_and_resume(self, tmp_path):
        from cuburn_tpu.main import main
        hist_file = str(tmp_path / "ckpt.npy")
        out1 = str(tmp_path / "a.png")
        out2 = str(tmp_path / "b.png")
        base = ["gallery:sierpinski", "--profile", "preview",
                "--width", "64", "--height", "64", "--quality", "20"]
        assert main(base + ["-o", out1, "--save-hist", hist_file]) == 0
        assert main(base + ["-o", out2, "--resume-hist", hist_file,
                            "--seed", "5"]) == 0
        a = np.load(hist_file)
        assert a.shape == (64 * 64 + 1, 4)


class TestShardedCLI:
    def test_devices_flag(self, tmp_path):
        import jax
        if len(jax.devices()) < 4:
            pytest.skip("needs virtual devices")
        from cuburn_tpu.main import main
        out = str(tmp_path / "s.png")
        rc = main(["gallery:sierpinski", "-o", out, "--profile",
                   "preview", "--width", "64", "--height", "64",
                   "--quality", "20", "--devices", "4"])
        assert rc == 0
        from PIL import Image
        img = np.asarray(Image.open(out))
        assert img[..., :3].max() > 0

    def test_metrics_json(self, tmp_path):
        import json
        from cuburn_tpu.main import main
        out = str(tmp_path / "m.png")
        metrics = str(tmp_path / "metrics.jsonl")
        rc = main(["gallery:sierpinski", "-o", out, "--profile",
                   "preview", "--width", "64", "--height", "64",
                   "--quality", "20", "--metrics-json", metrics])
        assert rc == 0
        rec = json.loads(open(metrics).readline())
        assert rec["plotted_samples"] > 0
        assert "iterate_ms" in rec and "retention" in rec
