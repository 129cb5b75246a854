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
    # identical RNG + deterministic math should be exact on the same
    # stack; allow a little slack for cross-version XLA changes
    frac_off = (diff > 2).mean()
    assert frac_off < 0.02, \
        f"{name}: {frac_off:.1%} of pixels differ by >2 (max {diff.max()})"


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
