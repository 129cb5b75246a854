"""Tiled bitonic sort: VMEM-local fused substage phases.

The XLA roll-based bitonic (ops/sort.py) is HBM-bound: every substage
is a full read+write pass over the array (231 passes for 2^21 keys).
Classic fix (GPU shared-memory bitonic, recast for TPU VMEM): all
substages whose stride fits inside a 64K-element tile run fused in ONE
Pallas pass per bitonic stage —

    local_pass(stages 1..16)                 # full tile-local sort
    for stage in 17..log N:
        XLA substages for strides >= 2^16    # (stage-16) passes
        local_pass(strides 2^15..1)          # one fused pass

~21 HBM passes instead of 231 for 2^21 keys.  The in-kernel flat roll
by a traced stride k = 128*m + kl decomposes into a lane roll by kl
plus two sublane rolls (m, m+1) selected by lane index (wrap carry).

The direction bit uses GLOBAL flat indices, so each local pass
produces exactly the bitonic intermediate state the next global stage
expects (tiles alternate ascending/descending as required).

Exactness: tests/test_sort.py differential vs numpy; the dev-chip
speed verdict lives in bench/sortexp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_LOG = 16
TILE = 1 << TILE_LOG          # 64K elements = 256 KB VMEM
TILE_ROWS = TILE // 128


def _tile_kernel(sizes_ref, strides_ref, x_ref, o_ref):
    """One grid step = one 64K tile; runs the whole prefetched
    (size, stride) substage schedule in VMEM."""
    gi = pl.program_id(0)
    base = gi * TILE
    riota = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 1)
    idx = base + riota * 128 + liota
    # Mosaic has no unsigned vector min/max (arith.minui fails to
    # legalize): flip the sign bit and compare as int32
    flip = jnp.uint32(0x80000000)

    def substage(i, x):
        size = sizes_ref[i]
        k = strides_ref[i]
        m = k // 128
        kl = k % 128
        # partner at flat j-k (for lanes whose k-bit is set)
        lrp = pltpu.roll(x, kl, axis=1)
        pa = pltpu.roll(lrp, m, axis=0)
        pb = pltpu.roll(lrp, m + 1, axis=0)
        part_pos = jnp.where(liota >= kl, pa, pb)
        # partner at flat j+k (k-bit clear)
        lrn = pltpu.roll(x, -kl, axis=1)
        na = pltpu.roll(lrn, -m, axis=0)
        nb = pltpu.roll(lrn, -(m + 1), axis=0)
        part_neg = jnp.where(liota < 128 - kl, na, nb)

        bit = (idx & k) != 0
        partner = jnp.where(bit, part_pos, part_neg)
        desc = (idx & size) != 0
        lo = jnp.minimum(x, partner)
        hi = jnp.maximum(x, partner)
        return jnp.where(bit ^ desc, hi, lo)

    x0 = pltpu.bitcast(x_ref[:] ^ flip, jnp.int32)
    xs = jax.lax.fori_loop(0, sizes_ref.shape[0], substage, x0)
    o_ref[:] = pltpu.bitcast(xs, jnp.uint32) ^ flip


def _local_pass(x2d, sched, interpret: bool):
    """Run `sched` [(size, stride), ...] (strides < TILE) on every
    tile of the flat array x2d viewed as (n_tiles*TILE_ROWS, 128)."""
    n_rows = x2d.shape[0]
    n_tiles = n_rows // TILE_ROWS
    sizes = jnp.asarray([s for s, _ in sched], jnp.int32)
    strides = jnp.asarray([k for _, k in sched], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((TILE_ROWS, 128),
                               lambda i, s, t: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_ROWS, 128),
                               lambda i, s, t: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _tile_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=interpret,
    )(sizes, strides, x2d)


def _xla_substage(x, idx, size: int, k: int):
    desc = (idx & jnp.uint32(size)) != 0
    bit = (idx & jnp.uint32(k)) != 0
    partner = jnp.where(bit, jnp.roll(x, k), jnp.roll(x, -k))
    lo = jnp.minimum(x, partner)
    hi = jnp.maximum(x, partner)
    return jnp.where(bit ^ desc, hi, lo)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_u32_tiled(keys: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Ascending sort of (N,) uint32, N a power of two >= TILE."""
    n = keys.shape[0]
    if n & (n - 1):
        raise ValueError(f"N must be a power of two, got {n}")
    if n < 2 * TILE:
        from cuburn_tpu.ops.sort import bitonic_sort_u32
        return bitonic_sort_u32(keys)
    log_n = n.bit_length() - 1
    x2d = keys.astype(jnp.uint32).reshape(-1, 128)

    # stages 1..TILE_LOG entirely inside tiles: one fused pass
    sched = [(1 << s, 1 << sub)
             for s in range(1, TILE_LOG + 1)
             for sub in range(s - 1, -1, -1)]
    x2d = _local_pass(x2d, sched, interpret)

    idx = jnp.arange(n, dtype=jnp.uint32)
    for stage in range(TILE_LOG + 1, log_n + 1):
        size = 1 << stage
        x = x2d.reshape(-1)
        for sub in range(stage - 1, TILE_LOG - 1, -1):
            x = _xla_substage(x, idx, size, 1 << sub)
        x2d = _local_pass(
            x.reshape(-1, 128),
            [(size, 1 << sub) for sub in range(TILE_LOG - 1, -1, -1)],
            interpret)
    return x2d.reshape(-1)
