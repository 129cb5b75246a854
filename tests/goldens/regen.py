"""Regenerate the golden corpus (run on CPU after INTENTIONAL semantic
changes):  python tests/goldens/regen.py"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from cuburn_tpu.genome.blend import blend_genomes
    from cuburn_tpu.models import GALLERY
    from cuburn_tpu.output import write_image
    from cuburn_tpu.render import Renderer
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_goldens import GOLDEN_DIR, PROF

    for name, make in GALLERY.items():
        img, _ = Renderer(make(), PROF).render_frame(0.37, seed=1234)
        write_image(os.path.join(GOLDEN_DIR, f"{name}.png"), img)
        print("regenerated", name)
    edge = blend_genomes(GALLERY["sierpinski"](),
                         GALLERY["classic_swirl"]())
    img, _ = Renderer(edge, PROF).render_frame(0.5, seed=1234)
    write_image(os.path.join(GOLDEN_DIR, "edge.png"), img)
    print("regenerated edge")

    import dataclasses
    from test_goldens import _motion_genome
    img, _ = Renderer(_motion_genome(), PROF).render_frame(0.25,
                                                           seed=1234)
    write_image(os.path.join(GOLDEN_DIR, "motion.png"), img)
    print("regenerated motion")

    g = GALLERY["animated_spark"]()
    g.temporal_filter_type = "gaussian"
    prof = dataclasses.replace(PROF, temporal_samples=4)
    img, _ = Renderer(g, prof).render_frame(0.5, seed=1234)
    write_image(os.path.join(GOLDEN_DIR, "tfilter.png"), img)
    print("regenerated tfilter")

    g = GALLERY["classic_swirl"]()
    g.spatial_filter_shape = "mitchell"
    prof = dataclasses.replace(PROF, ss=2)
    img, _ = Renderer(g, prof).render_frame(0.37, seed=1234)
    write_image(os.path.join(GOLDEN_DIR, "fshape.png"), img)
    print("regenerated fshape")


if __name__ == "__main__":
    main()
