"""Multi-keyframe animation: blend a list of stills into edges.

blend_sequence harmonizes every segment to ONE structure key, so the
whole animation compiles a single XLA program regardless of how many
edges it has.

Usage: python examples/06_sequence.py [out.y4m]
"""
import sys

from cuburn_tpu.genome.blend import blend_sequence
from cuburn_tpu.genome.randgen import random_genome
from cuburn_tpu.output import Y4MSink
from cuburn_tpu.profile import get_profile
from cuburn_tpu.render import Renderer

out = sys.argv[1] if len(sys.argv) > 1 else "sequence.y4m"

keys = [random_genome(s, size=(256, 256)) for s in (3, 14, 15)]
segments = blend_sequence(keys)             # 2 edges, 1 structure key
assert len({g.structure_key() for g, _s, _e in segments}) == 1

profile = get_profile("preview", width=256, height=256, quality=50,
                      fps=6.0, duration=1.0)
sink = Y4MSink(out, profile.width, profile.height, profile.fps)
n = 0
for k, (edge, _s, _e) in enumerate(segments):
    frames = Renderer(edge, profile).frames(seed=k)
    if k > 0:
        # edge k's t=1 pose IS edge k+1's t=0 pose: skip the
        # duplicate so the video doesn't stutter at keyframes
        next(frames, None)
    for img, _stats in frames:
        sink.write_frame(img)
        n += 1
sink.close()
print(f"wrote {n} frames to {out} (one compile for "
      f"{len(segments)} segments)")
