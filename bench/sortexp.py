#!/usr/bin/env python
"""Sort-primitive experiments: can an LSD radix sort (cumsum ranks +
unique-index permutation) beat the roll-based bitonic on this chip?

The bitonic moves ~log^2(N)/2 * 16 MB per 2M-record flush; a binary
LSD radix moves ~key_bits * (3 traversals + 1 permutation).  Whether
that wins hinges entirely on random-permutation throughput, so this
measures the primitives first and then a full radix sort, all
chained + in-loop (single-call timings on this chip are dispatch
noise — see CLAUDE.md).

Usage: python bench/sortexp.py [n_log2=21] [key_bits=26]
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


def radix_sort_u32(x, key_bits: int):
    """Stable binary LSD radix sort via cumsum ranks + one
    unique-index set-scatter per bit."""
    n = x.shape[0]

    def bit_pass(b, x):
        bit = ((x >> b) & jnp.uint32(1)).astype(jnp.int32)
        ones = jnp.cumsum(bit)
        zeros = jnp.arange(1, n + 1, dtype=jnp.int32) - ones
        total0 = zeros[-1]
        pos = jnp.where(bit == 0, zeros - 1, total0 + ones - 1)
        return jnp.zeros_like(x).at[pos].set(x, unique_indices=True)

    return jax.lax.fori_loop(0, key_bits, bit_pass, x)


def main():
    n_log = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    key_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 26
    N = 1 << n_log
    from cuburn_tpu.ops.sort import bitonic_sort_u32
    from cuburn_tpu.utils.timing import hard_sync

    print(f"backend={jax.default_backend()} N={N} key_bits={key_bits}")
    rng = np.random.RandomState(0)
    keys = jnp.asarray(
        rng.randint(0, 1 << key_bits, N, dtype=np.uint32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))

    def timed(label, fn, x, reps=4):
        out = fn(x)
        hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            x = fn(x)                      # chained
        hard_sync(x)
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:<28} {dt * 1e3:9.2f} ms  "
              f"{N / dt / 1e6:8.1f} M elem/s")
        return x

    # primitives
    timed("gather (random perm)",
          jax.jit(lambda x: jnp.take(x, perm) + jnp.uint32(1)), keys)
    timed("scatter-set (unique)",
          jax.jit(lambda x: jnp.zeros_like(x).at[perm].set(x)
                  + jnp.uint32(1)), keys)
    timed("cumsum i32",
          jax.jit(lambda x: (jnp.cumsum(x.astype(jnp.int32))
                             .astype(jnp.uint32) & jnp.uint32(0xFFFF))
                  + jnp.uint32(7)), keys)

    # full sorts (chain by re-randomizing with a cheap hash)
    unsort = jnp.uint32(0x9E3779B9)

    def chainable(sort_fn):
        def f(x):
            return sort_fn((x * unsort) & jnp.uint32((1 << key_bits)
                                                     - 1))
        return jax.jit(f)

    out_b = timed("bitonic (roll, looped)", chainable(bitonic_sort_u32),
                  keys)
    from cuburn_tpu.ops.pallas_sort import bitonic_sort_u32_tiled
    interp = jax.default_backend() != "tpu"
    out_t = timed("bitonic tiled (VMEM)",
                  chainable(lambda x: bitonic_sort_u32_tiled(
                      x, interpret=interp)), keys)
    got_t = np.asarray(out_t)
    print("tiled correctness:",
          "OK" if (got_t == np.sort(got_t)).all() and
          got_t.shape[0] == N else "FAIL")
    out_r = timed("radix LSD (cumsum+scatter)",
                  chainable(lambda x: radix_sort_u32(x, key_bits)),
                  keys)
    # validate radix against numpy on the last chained input
    seed_in = np.asarray((out_b * unsort)
                         & jnp.uint32((1 << key_bits) - 1))
    got = np.asarray(radix_sort_u32(jnp.asarray(seed_in), key_bits))
    ok = (got == np.sort(seed_in)).all()
    print("radix correctness:", "OK" if ok else "FAIL")


if __name__ == "__main__":
    main()
