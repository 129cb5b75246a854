"""Render a still frame through the library API.

Usage: python examples/01_still.py [out.png]
"""
import sys

from cuburn_tpu.genome.convert import load_genomes
from cuburn_tpu.models import get_genome
from cuburn_tpu.output import write_image
from cuburn_tpu.profile import get_profile
from cuburn_tpu.render import Renderer

out = sys.argv[1] if len(sys.argv) > 1 else "still.png"

genome = get_genome("classic_swirl")        # or load_genomes("my.flam3")[0]
profile = get_profile("preview", quality=100)
renderer = Renderer(genome, profile)

img, stats = renderer.render_frame(t=0.0, seed=1)
write_image(out, img)
print(f"{out}: {stats.plotted_samples / 1e6:.1f} M samples at "
      f"{stats.samples_per_sec / 1e6:.1f} M samples/s, "
      f"filters {stats.filter_s * 1e3:.0f} ms")
