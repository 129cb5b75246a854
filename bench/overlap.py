#!/usr/bin/env python
"""Measure cross-frame pipeline overlap: serial frames() vs the
double-buffered frames_overlapped() on a real animation, PNG encode
included per frame (the host work the overlap is supposed to hide —
cuburn/render.py 2-stream iter(N) ‖ filter/copy(N-1), SURVEY.md §3.1).

Usage: python bench/overlap.py [n_frames=8] [dim=512] [quality=150]
Emits per-driver wall clocks and the overlap speedup.
"""


import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
import jax as _jax
_jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    quality = int(sys.argv[3]) if len(sys.argv) > 3 else 150

    import dataclasses

    import numpy as np

    from cuburn_tpu.models import animated_spark
    from cuburn_tpu.output import write_image
    from cuburn_tpu.profile import RenderProfile
    from cuburn_tpu.render import Renderer

    g = animated_spark()
    prof = RenderProfile(width=dim, height=dim, quality=quality,
                         fps=float(n_frames),
                         duration=1.0, temporal_samples=1)
    r = Renderer(g, prof)

    def run(driver, label):
        # warm: compile both programs once
        imgs = []
        t0 = time.perf_counter()
        n = 0
        for img, stats in driver(seed=1):
            write_image(f"/tmp/overlap_{label}_{n:03d}.png", img)
            imgs.append(np.asarray(img))
            n += 1
        dt = time.perf_counter() - t0
        print(json.dumps({"driver": label, "frames": n,
                          "wall_s": round(dt, 2),
                          "ms_per_frame": round(dt / n * 1e3, 1)}))
        return dt, imgs

    # one throwaway frame to absorb compile time for both paths
    next(iter(r.frames(seed=0)))
    next(iter(r.frames_overlapped(seed=0)))

    # timed runs use DIFFERENT seeds: the tunnel caches identical
    # executions (CLAUDE.md), so re-running the serial run's exact
    # programs would time dispatch only and inflate the speedup
    t_serial, imgs_s = run(r.frames, "serial")
    t_overlap, _ = run(lambda seed: r.frames_overlapped(seed=seed + 1),
                       "overlapped")
    # bit-identity is value-level (cache can't change values): one
    # untimed overlapped pass at the serial seed
    imgs_o = [np.asarray(img) for img, _ in r.frames_overlapped(seed=1)]
    identical = all(np.array_equal(a, b)
                    for a, b in zip(imgs_s, imgs_o))
    print(json.dumps({
        "identical_frames": identical,
        "speedup": round(t_serial / t_overlap, 3)}))


if __name__ == "__main__":
    main()
