#!/usr/bin/env python
"""End-to-end TPU-vs-CPU frame parity.

Renders the same genome/profile on the TPU (this process) and on XLA
CPU (a fresh subprocess — the axon plugin force-registers in-process,
so CPU needs its own interpreter), then compares the normalized
density measures by total-variation distance against a same-backend
two-seed noise floor.

Why distributional: the chaos game is chaotic, so cross-backend
bitwise equality is impossible — one ULP of transcendental difference
decorrelates trajectories.  What must agree is the attractor measure,
exactly the protocol the independent NumPy anchor uses
(tests/reference_impl.py, tests/test_render.py TV tests).  This probe
closes the one layer those CPU-only tests can't see: whole-pipeline
divergence on real Mosaic/XLA-TPU (lowering bugs, precision defaults,
layout aliasing) — per-kernel on-device differentials (bench.py
per-bin, bench/tileddiff.py) check the histogram kernels in
isolation; this checks iterate -> sort -> flush end to end.

Usage: python bench/tpuparity.py [n_samples=600000]
Emits one JSON line per comparison and a final verdict line.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import jax as _jax
_jax.config.update("jax_compilation_cache_dir",
                   os.environ["JAX_COMPILATION_CACHE_DIR"])
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np

W = H = 32

_CPU_SCRIPT = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from cuburn_tpu.models import full_feature
from cuburn_tpu.profile import RenderProfile
from cuburn_tpu.render import Renderer

out, seed, quality, w, h = (sys.argv[1], int(sys.argv[2]),
                            int(sys.argv[3]), int(sys.argv[4]),
                            int(sys.argv[5]))
prof = RenderProfile(width=w, height=h, quality=quality, batch=4096,
                     iters_per_chunk=16, fuse=20,
                     hist_backend="scatter", de_enabled=False)
hist, _ = Renderer(full_feature(), prof).accumulate(0.0, seed=seed)
np.save(out, np.asarray(hist, np.float64))
"""


def density(hist):
    d = np.asarray(hist, np.float64)[:-1, 3]
    return d / d.sum()


def tv(a, b):
    return 0.5 * np.abs(density(a) - density(b)).sum()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    quality = int(np.ceil(n / (W * H)))

    import jax
    from cuburn_tpu.models import full_feature
    from cuburn_tpu.profile import RenderProfile
    from cuburn_tpu.render import Renderer

    backend = jax.default_backend()
    g = full_feature()

    def accumulate_tpu(hist_backend, seed):
        prof = RenderProfile(width=W, height=H, quality=quality,
                             batch=4096, iters_per_chunk=16, fuse=20,
                             hist_backend=hist_backend,
                             de_enabled=False)
        hist, _ = Renderer(g, prof).accumulate(0.0, seed=seed)
        return np.asarray(hist, np.float64)

    # CPU references in subprocesses (two seeds: the second one is the
    # same-implementation noise floor at this sample budget)
    cpu = {}
    with tempfile.TemporaryDirectory() as td:
        for seed in (11, 12):
            out = os.path.join(td, f"cpu_{seed}.npy")
            t0 = time.perf_counter()
            subprocess.run(
                [sys.executable, "-c", _CPU_SCRIPT, out, str(seed),
                 str(quality), str(W), str(H)],
                check=True, cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))
            cpu[seed] = np.load(out)
            print(json.dumps({"cpu_render": {"seed": seed, "s": round(
                time.perf_counter() - t0, 1)}}))

    floor = tv(cpu[11], cpu[12])
    print(json.dumps({"noise_floor_tv_cpu_seed11_vs_12": round(floor, 4)}))

    results = {"noise_floor": round(floor, 4), "backend": backend}
    ok = True
    for hb in ("scatter", "pallas_win"):
        hist = accumulate_tpu(hb, seed=11)
        mass = float(hist[:-1, 3].sum())
        d = tv(hist, cpu[11])
        # pass rule: within the anchor tests' absolute bound and not
        # wildly above the two-seed floor (chaotic decorrelation means
        # tv ~ floor when the backends agree)
        this_ok = bool(d < 0.05 and d < max(4.0 * floor, 0.03))
        ok = ok and this_ok
        results[f"tv_{hb}_vs_cpu"] = round(d, 4)
        print(json.dumps({"device_backend": hb, "mass": mass,
                          "tv_vs_cpu": round(d, 4), "ok": this_ok}))

    results["ok"] = ok
    print(json.dumps({"tpu_cpu_parity": results}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
