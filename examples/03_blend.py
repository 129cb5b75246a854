"""Keyframe blending: morph one flame into another.

Usage: python examples/03_blend.py [out_prefix]
"""
import sys

from cuburn_tpu.genome.blend import blend_genomes
from cuburn_tpu.genome.randgen import random_genome
from cuburn_tpu.output import write_image
from cuburn_tpu.profile import get_profile
from cuburn_tpu.render import Renderer

prefix = sys.argv[1] if len(sys.argv) > 1 else "blend"

a, b = random_genome(7), random_genome(21)
edge = blend_genomes(a, b, spin=1.0)        # one extra camera turn
profile = get_profile("preview", width=256, height=256, quality=60)
renderer = Renderer(edge, profile)

for t in (0.0, 0.5, 1.0):
    img, _ = renderer.render_frame(t, seed=2)
    write_image(f"{prefix}_{t:.1f}.png", img)
    print(f"{prefix}_{t:.1f}.png")
