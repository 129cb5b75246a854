"""Golden-image regression tests.

The reference's de-facto integration test was eyeballing renders
against flam3 output (SURVEY.md §4); here the corpus is machine-checked:
every gallery genome (plus a blended edge) renders at a fixed seed and
must match the stored golden within a small tolerance.  Goldens were
generated on CPU (JAX_PLATFORMS=cpu) — regenerate with
tests/goldens/regen.py after *intentional* semantic changes only.
"""

import dataclasses
import os

import numpy as np
import pytest
from PIL import Image

from cuburn_tpu.genome.blend import blend_genomes
from cuburn_tpu.models import GALLERY
from cuburn_tpu.profile import RenderProfile
from cuburn_tpu.render import Renderer

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
PROF = RenderProfile(width=64, height=64, quality=80, batch=2048,
                     iters_per_chunk=16, fuse=16,
                     hist_backend="scatter", de_enabled=True)


def _check(name, img):
    golden = np.asarray(
        Image.open(os.path.join(GOLDEN_DIR, f"{name}.png")))
    assert img.shape == golden.shape
    diff = np.abs(img.astype(np.int32) - golden.astype(np.int32))
    if os.environ.get("CUBURN_GOLDEN_LOOSE"):
        # cross-version/cross-backend runs: transcendental lowering may
        # legitimately shift a few u8 values
        frac_off = (diff > 2).mean()
        assert frac_off < 0.02, (f"{name}: {frac_off:.1%} of pixels "
                                 f"differ by >2 (max {diff.max()})")
    else:
        # identical RNG + deterministic math: EXACT on the same stack
        # (verified bit-exact round 3).  A loose default (2% of pixels
        # by any amount) would pass systematic ~1% tone drifts or an
        # 81-pixel local corruption; set CUBURN_GOLDEN_LOOSE=1 only
        # when the XLA version actually changed.
        assert diff.max() == 0, \
            (f"{name}: {(diff > 0).mean():.2%} of pixels differ "
             f"(max {diff.max()}); if the XLA stack changed, rerun "
             "with CUBURN_GOLDEN_LOOSE=1 or regenerate goldens")


@pytest.mark.parametrize("name", sorted(GALLERY))
def test_gallery_golden(name):
    img, _ = Renderer(GALLERY[name](), PROF).render_frame(0.37,
                                                          seed=1234)
    _check(name, img)


def test_edge_golden():
    edge = blend_genomes(GALLERY["sierpinski"](),
                         GALLERY["classic_swirl"]())
    img, _ = Renderer(edge, PROF).render_frame(0.5, seed=1234)
    _check("edge", img)


def _motion_genome():
    from cuburn_tpu.genome.convert import load_genomes
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "wild_sheep.flam3")
    return load_genomes(path)[1]        # has <motion> elements


def test_motion_golden():
    """Pins flam3 <motion> semantics (periodic parameter offsets)."""
    img, _ = Renderer(_motion_genome(), PROF).render_frame(0.25,
                                                           seed=1234)
    _check("motion", img)


def test_temporal_filter_golden():
    """Pins gaussian temporal-filter weighting + shutter stepping."""
    g = GALLERY["animated_spark"]()
    g.temporal_filter_type = "gaussian"
    prof = dataclasses.replace(PROF, temporal_samples=4)
    img, _ = Renderer(g, prof).render_frame(0.5, seed=1234)
    _check("tfilter", img)


def test_filter_shape_golden():
    """Pins the flam3 spatial-filter decimation (mitchell, ss=2)."""
    g = GALLERY["classic_swirl"]()
    g.spatial_filter_shape = "mitchell"
    prof = dataclasses.replace(PROF, ss=2)
    img, _ = Renderer(g, prof).render_frame(0.37, seed=1234)
    _check("fshape", img)
