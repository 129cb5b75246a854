#!/usr/bin/env python
"""Probe: can Mosaic lower the REAL chaos-game step inside a Pallas
kernel?  Runs iterate_step (full union-variation evaluation, one-hot
MXU parameter fetch, xorshift RNG, camera projection, record packing)
for T steps on VMEM-resident state, writing packed records to a VMEM
log.  Pass/fail + timing decides whether the fully fused
iterate+sort+flush kernel is worth building (KERNEL_DESIGN.md).

Usage: python bench/fusedprobe.py [batch_log2=13] [T=16]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import jax as _jax
_jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    b_log = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    B = 1 << b_log

    from cuburn_tpu.models import full_feature
    from cuburn_tpu.ops.camera import CameraSpec
    from cuburn_tpu.ops.iterate import (IterState, init_state,
                                        iterate_step, pack_records,
                                        xform_cdf_rows)
    from cuburn_tpu.utils.timing import hard_sync

    g = full_feature()
    key = g.structure_key()
    params = jax.tree_util.tree_map(jnp.asarray, g.eval_at(0.0))
    cam = CameraSpec(512, 512, 1)
    cdf = xform_cdf_rows(params)
    ppu = params.ppu * jnp.float32(512 / g.size[0])
    print(f"backend={jax.default_backend()} B={B} T={T} "
          f"variations={key.variations}")

    # params (and ppu) must enter the kernel as explicit inputs —
    # Pallas rejects captured traced constants.  Wrap every leaf to
    # rank >= 2 for VMEM, unwrap inside.
    p_leaves, p_tree = jax.tree_util.tree_flatten(params)
    p_shapes = [l.shape for l in p_leaves]

    def wrap(l):
        l = jnp.asarray(l)
        while l.ndim < 2:
            l = l[None]
        return l

    def kernel(*refs):
        np_ = len(p_leaves)
        x_ref, y_ref, c_ref, lx_ref, age_ref, rng_ref, cdf_ref, \
            ppu_ref = refs[:8]
        p_refs = refs[8:8 + np_]
        log_ref, xo_ref, yo_ref, co_ref, lxo_ref, ageo_ref, \
            rngo_ref = refs[8 + np_:]
        leaves = [r[:].reshape(s) for r, s in zip(p_refs, p_shapes)]
        kp = jax.tree_util.tree_unflatten(p_tree, leaves)
        kppu = ppu_ref[0, 0]
        state = IterState(x=x_ref[:], y=y_ref[:], color=c_ref[:],
                          last_xf=lx_ref[:], age=age_ref[:],
                          rng=rng_ref[:])
        cdf_rows = cdf_ref[:]

        def step(t, state):
            state, addr, pcolor, _op = iterate_step(
                key, cam, 32, kp, cdf_rows, kppu, state)
            rec = pack_records(10, addr, pcolor)
            log_ref[t, :] = rec.astype(jnp.int32)
            return state

        state = jax.lax.fori_loop(0, T, step, state)
        xo_ref[:] = state.x
        yo_ref[:] = state.y
        co_ref[:] = state.color
        lxo_ref[:] = state.last_xf
        ageo_ref[:] = state.age
        rngo_ref[:] = state.rng

    def run(state):
        ins = [state.x, state.y, state.color, state.last_xf,
               state.age, state.rng, cdf, wrap(ppu)] \
            + [wrap(l) for l in p_leaves]
        outs = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            * len(ins),
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)]
                            * 7),
            out_shape=(
                jax.ShapeDtypeStruct((T, B), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.float32),
                jax.ShapeDtypeStruct((B,), jnp.float32),
                jax.ShapeDtypeStruct((B,), jnp.float32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B, 4), jnp.uint32),
            ),
            interpret=jax.default_backend() != "tpu",
        )(*ins)
        log, x, y, c, lx, age, rng = outs
        return log, IterState(x=x, y=y, color=c, last_xf=lx, age=age,
                              rng=rng)

    jrun = jax.jit(run)
    state = init_state(jax.random.PRNGKey(0), B)
    t0 = time.perf_counter()
    log, state2 = jrun(state)
    hard_sync(log)
    print(f"COMPILED+RAN in {time.perf_counter() - t0:.1f}s")

    # differential vs the XLA scan path (identical math -> identical
    # records and state, bit for bit)
    from cuburn_tpu.ops.iterate import iterate_chunk
    st_x, addrs, _ = iterate_chunk(key, cam, params, cdf, state, ppu,
                                   T, 32)
    got_addr = np.asarray(log).astype(np.uint32) >> 10
    np.testing.assert_array_equal(got_addr, np.asarray(addrs))
    np.testing.assert_array_equal(np.asarray(state2.rng),
                                  np.asarray(st_x.rng))
    print("EXACT vs XLA scan")

    # throughput (chained through state)
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        log, state = jrun(state)
    hard_sync(log)
    dt = (time.perf_counter() - t0) / reps
    print(f"in-kernel iterate: {dt * 1e3:8.2f} ms  "
          f"{B * T / dt / 1e6:8.1f} M iters/s")


if __name__ == "__main__":
    main()
