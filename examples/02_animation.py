"""Motion-blurred animation to y4m (pipe into ffmpeg for mp4).

Usage: python examples/02_animation.py [out.y4m]
"""
import sys

from cuburn_tpu.models import get_genome
from cuburn_tpu.output import Y4MSink
from cuburn_tpu.profile import get_profile
from cuburn_tpu.render import Renderer

out = sys.argv[1] if len(sys.argv) > 1 else "anim.y4m"

genome = get_genome("animated_spark")
profile = get_profile("preview", width=320, height=180, quality=60,
                      temporal_samples=4, fps=12.0)
renderer = Renderer(genome, profile)

sink = Y4MSink(out, profile.width, profile.height, profile.fps)
# frames_overlapped pipelines frame N's device work with frame N-1's
# readback + encode (bit-identical to frames(); ~1.5x measured)
for i, (img, stats) in enumerate(renderer.frames_overlapped(seed=3)):
    sink.write_frame(img)
    print(f"frame {i}: retention {stats.retention:.2f}")
sink.close()
print(f"wrote {out}")
