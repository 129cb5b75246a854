#!/usr/bin/env python
"""Attribution of the iterate interior (round-5 verdict item 1).

The headline render runs at ~60% of its own iterate-only ceiling, and
that ceiling (235.8 M it/s on full_feature vs 645 M pure chaos game,
BENCH_r04.json) is the binding obstacle to the 400 M-class target.
Nobody had measured WHERE the full_feature iterate time goes, so this
probe produces the attribution table (BASELINE.md):

  A. chip primitive rates — M element-ops/s for each transcendental
     the variation union uses (sin, cos, atan2, pow, exp, log, div,
     sqrt, rsqrt) plus an int-op baseline, measured in-loop, chained.
     These set the roofline: the iterate body is a fixed op sequence,
     so its ceiling is 1 / sum(count_i / rate_i).

  B. in-situ genome ablation — iterate-only (discard) rate for
     full_feature and for variants with one piece removed at a time
     (each union variation swapped to linear, final xform dropped,
     xaos dropped, post dropped, everything->linear).  The DELTA of
     1/rate vs full attributes ns/iter to each piece in situ, where
     XLA fusion and the scan carry are real.

  C. loop-frame components — RNG-draw-only and RNG+select_and_fetch
     loops, so the non-variation floor (selection matmuls, carry) is
     separated from the union math.

All timings chained through the previous output and hard-synced
(CLAUDE.md: the tunnel caches identical executions and
block_until_ready does not block).

Usage: python bench/iterprof.py [batch_log2=15] [K=64] [--quick]
"""

import copy
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import jax as _jax
_jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax
import jax.numpy as jnp
import numpy as np


def _timed_loop(fn, state, n_chunks):
    """warmup + chained timed call; returns seconds."""
    from cuburn_tpu.utils.timing import hard_sync
    out = fn(state, jnp.int32(n_chunks))
    hard_sync(out)
    st2 = out[0] if isinstance(out, tuple) else out
    t0 = time.perf_counter()
    out2 = fn(st2, jnp.int32(n_chunks))
    hard_sync(out2)
    return time.perf_counter() - t0


# --------------------------------------------------------------------------
# A. primitive rates
# --------------------------------------------------------------------------

def _op_loop(op, B, K):
    """Chained elementwise-op loop: x_{i+1} = op(x_i) K times per
    chunk, n chunks (fori, traced n).  op must keep values finite."""
    from functools import partial

    @jax.jit
    def run(x, n):
        def chunk(_, x):
            def body(x, __):
                return op(x), ()
            x, _ = jax.lax.scan(body, x, None, length=K)
            return x
        return jax.lax.fori_loop(0, n, chunk, x)

    return run


PRIM_OPS = {
    # keep iterates bounded; one transcendental (or marked count) each
    "sin": lambda x: jnp.sin(x * 1.1 + 0.3),
    "cos": lambda x: jnp.cos(x * 1.1 + 0.3),
    "atan2": lambda x: jnp.arctan2(x, 1.0 - x),
    "pow": lambda x: jnp.power(1.5 + x, 0.37) - 1.0,
    "exp": lambda x: jnp.exp(-jnp.abs(x)) * 2.0 - 0.5,
    "log": lambda x: jnp.log1p(jnp.abs(x)) - 0.4,
    "div": lambda x: x / (1.25 + x * x),
    "sqrt": lambda x: jnp.sqrt(jnp.abs(x) + 0.01) - 0.6,
    "rsqrt": lambda x: jax.lax.rsqrt(jnp.abs(x) + 0.7) - 0.8,
    "mul_add": lambda x: x * 0.9 + 0.05 - x * x * 0.1,
}


def prim_rates(B, K, n_chunks):
    rates = {}
    x0 = jnp.linspace(-0.5, 0.5, B, dtype=jnp.float32)
    for name, op in PRIM_OPS.items():
        fn = _op_loop(op, B, K)
        dt = _timed_loop(fn, x0, n_chunks)
        r = B * K * n_chunks / dt / 1e6
        rates[name] = round(r, 1)
        print(json.dumps({"prim": name, "M_ops_per_s": rates[name]}))
    return rates


# --------------------------------------------------------------------------
# B. genome ablation
# --------------------------------------------------------------------------

def _w0(v):
    """Spline or number -> value at t=0."""
    if v is None:
        return 0.0
    return float(v(0.0)) if callable(v) else float(v)


def _swap_var(g, name):
    """full_feature with every occurrence of variation `name` replaced
    by linear at the same weight (params dropped if orphaned)."""
    from cuburn_tpu.genome.spline import spline
    g = copy.deepcopy(g)
    for xf in g.xforms + ([g.final_xform] if g.final_xform else []):
        if name in xf.vars:
            w = _w0(xf.vars.pop(name))
            xf.vars["linear"] = spline(
                _w0(xf.vars.get("linear")) + w)
            xf.params = {k: v for k, v in xf.params.items()
                         if not k.startswith(name + "_")}
    return g


def genome_variants():
    from cuburn_tpu.models import full_feature
    g = full_feature()
    out = {"full": g}
    for name in ("julian", "pdj", "blur", "curl", "spherical"):
        out[f"-{name}"] = _swap_var(g, name)
    nf = copy.deepcopy(g)
    nf.final_xform = None
    out["-final"] = nf
    nx = copy.deepcopy(g)
    nx.xaos = None
    out["-xaos"] = nx
    np_ = copy.deepcopy(g)
    for xf in np_.xforms:
        xf.post = None
    out["-post"] = np_
    from cuburn_tpu.genome.spline import spline
    allin = copy.deepcopy(g)
    for xf in allin.xforms + [allin.final_xform]:
        w = sum(_w0(v) for v in xf.vars.values())
        xf.vars = {"linear": spline(w)}
        xf.params = {}
    out["all-linear"] = allin
    return out


def iterate_rate(g, B, K, n_chunks, cam):
    from functools import partial

    from cuburn_tpu.ops.iterate import (init_state, iterate_step,
                                        xform_cdf_rows)
    key = g.structure_key()
    params = jax.tree_util.tree_map(jnp.asarray, g.eval_at(0.0))
    cdf = xform_cdf_rows(params)
    ppu = params.ppu * jnp.float32(cam.width / g.size[0])

    @jax.jit
    def run(state, n):
        def chunk(_, carry):
            state, acc = carry

            def body(state, __):
                state, addr, pcolor, opacity = iterate_step(
                    key, cam, 32, params, cdf, ppu, state)
                return state, jnp.sum(addr)

            state, sums = jax.lax.scan(body, state, None, length=K)
            return state, acc + jnp.sum(sums)
        return jax.lax.fori_loop(0, n, chunk, (state, jnp.int32(0)))

    from cuburn_tpu.ops.iterate import init_state
    state = init_state(jax.random.PRNGKey(0), B)
    dt = _timed_loop(lambda s, n: run(s, n), state, n_chunks)
    return B * K * n_chunks / dt / 1e6


# --------------------------------------------------------------------------
# C. loop-frame components
# --------------------------------------------------------------------------

def frame_rates(B, K, n_chunks):
    """RNG-only and RNG+select loops: the non-variation floor."""
    from cuburn_tpu.models import full_feature
    from cuburn_tpu.ops import rng as rng_mod
    from cuburn_tpu.ops.iterate import xform_cdf_rows
    from cuburn_tpu.ops.xform import build_xform_table, select_and_fetch

    g = full_feature()
    key = g.structure_key()
    params = jax.tree_util.tree_map(jnp.asarray, g.eval_at(0.0))
    cdf = xform_cdf_rows(params)

    @jax.jit
    def rng_only(rng, n):
        def chunk(_, carry):
            rng, acc = carry

            def body(rng, __):
                s = rng_mod.RngStream(rng)
                b = s.bits()
                return s.state, b
            rng, bs = jax.lax.scan(body, rng, None, length=K)
            return rng, acc + jnp.sum(bs.astype(jnp.int32))
        return jax.lax.fori_loop(0, n, chunk, (rng, jnp.int32(0)))

    @jax.jit
    def rng_select(carry0, n):
        def chunk(_, carry):
            rng, last, acc = carry
            table = build_xform_table(key, params)

            def body(c, __):
                rng, last = c
                s = rng_mod.RngStream(rng)
                bits = s.bits()
                u = (bits >> jnp.uint32(8)).astype(jnp.int32)\
                    .astype(jnp.float32) * np.float32(1.0 / (1 << 24))
                idx, row = select_and_fetch(key, cdf, table, last, u)
                return (s.state, idx), jnp.sum(row[:, 0])
            (rng, last), sums = jax.lax.scan(
                body, (rng, last), None, length=K)
            return rng, last, acc + jnp.sum(sums)
        return jax.lax.fori_loop(0, n, chunk, carry0)

    rng0 = rng_mod.seed(jax.random.PRNGKey(1), B)
    last0 = jnp.zeros((B,), jnp.int32)

    out = {}
    dt = _timed_loop(lambda s, n: rng_only(s, n), rng0, n_chunks)
    out["rng_only"] = round(B * K * n_chunks / dt / 1e6, 1)
    print(json.dumps({"frame": "rng_only",
                      "M_iters_per_s": out["rng_only"]}))

    res = rng_select((rng0, last0, jnp.float32(0)), jnp.int32(n_chunks))
    from cuburn_tpu.utils.timing import hard_sync
    hard_sync(res)
    t0 = time.perf_counter()
    res2 = rng_select((res[0], res[1], jnp.float32(0)),
                      jnp.int32(n_chunks))
    hard_sync(res2)
    dt = time.perf_counter() - t0
    out["rng_select"] = round(B * K * n_chunks / dt / 1e6, 1)
    print(json.dumps({"frame": "rng_select",
                      "M_iters_per_s": out["rng_select"]}))
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    quick = "--quick" in sys.argv
    b_log = int(args[0]) if len(args) > 0 else 15
    K = int(args[1]) if len(args) > 1 else 64
    B = 1 << b_log
    n_chunks = max(1, ((1 << 23) if quick else (1 << 25)) // (B * K))
    total = B * K * n_chunks
    print(f"# iterprof backend={jax.default_backend()} B={B} K={K} "
          f"chunks={n_chunks} total={total / 1e6:.1f}M")

    from cuburn_tpu.ops.camera import CameraSpec
    cam = CameraSpec(512, 512, 1)

    results = {"prims": prim_rates(B, K, n_chunks)}

    results["frame"] = frame_rates(B, K, n_chunks)

    results["ablation"] = {}
    full_rate = None
    for label, g in genome_variants().items():
        r = iterate_rate(g, B, K, n_chunks, cam)
        results["ablation"][label] = round(r, 1)
        extra = {}
        if label == "full":
            full_rate = r
        elif full_rate:
            # ns/iter attributed to the removed piece
            extra["ns_per_iter_delta"] = round(
                (1.0 / full_rate - 1.0 / r) * 1e3, 3)
        print(json.dumps({"ablation": label,
                          "M_iters_per_s": round(r, 1), **extra}))

    print(json.dumps({"iterprof": results}))


if __name__ == "__main__":
    main()
