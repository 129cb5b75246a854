"""High-quality still via checkpointed accumulation passes.

Each pass adds fresh samples to the saved histogram; finalize when
satisfied (the SURVEY.md §5 checkpoint/resume workflow).
"""
import numpy as np

from cuburn_tpu.models import get_genome
from cuburn_tpu.output import write_image
from cuburn_tpu.profile import get_profile
from cuburn_tpu.render import Renderer

genome = get_genome("classic_swirl")
profile = get_profile("preview", quality=80)
renderer = Renderer(genome, profile)

hist = None
for p in range(3):
    hist, stats = renderer.accumulate(0.0, seed=1, hist0=hist)
    print(f"pass {p}: total mass "
          f"{float(np.asarray(hist)[:-1, 3].sum()) / 1e6:.1f} M")
img = renderer.finalize_frame(hist, 0.0)
write_image("checkpointed.png", img)
print("wrote checkpointed.png")
