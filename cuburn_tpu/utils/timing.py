"""Timing harness with *hard* device synchronization.

The reference timed kernels with CUDA events (cuburn/render.py,
SURVEY.md §5).  JAX's `block_until_ready` is the usual analog, but on
tunneled/experimental PJRT backends (the axon plugin in this
environment) it can return before device work completes, producing
timings that are off by orders of magnitude.  `hard_sync` forces a
device-to-host readback of a value that data-depends on the computation
— a sync that cannot lie.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import numpy as np


def hard_sync(x) -> float:
    """Force completion of everything `x` depends on.  The return value
    is the SUM of one element from every pytree leaf — a synchronization
    side effect only, not a probe of any specific array.

    For device arrays, a one-element slice is dispatched (ordered after
    every producer of the buffer by data dependence) and THAT scalar is
    read back — a 4-byte transfer instead of the whole array, so
    syncing a multi-MB histogram doesn't cost a multi-second D2H copy
    on the tunneled dev chip."""
    # sync EVERY leaf: different leaves may come from different
    # dispatches, and only a leaf's own readback is ordered after its
    # producers by data dependence.  One batched device_get keeps it a
    # single host round-trip regardless of leaf count.
    scalars = [leaf.ravel()[0] if isinstance(leaf, jax.Array)
               else np.asarray(leaf).ravel()[0]
               for leaf in jax.tree_util.tree_leaves(x)]
    return float(sum(float(v) for v in jax.device_get(scalars)))


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 3,
            chain: Callable = None) -> Tuple[float, object]:
    """Time fn(*args) with hard syncs.

    If `chain` is given, it maps (prev_output, args) -> next args so
    successive calls are data-dependent (defeats any execution caching
    in the backend).  `warmup=0` times the very first (compiling)
    call.  Returns (seconds_per_call, last_output)."""
    out = None
    for _ in range(warmup):
        if chain is not None and out is not None:
            args = chain(out, args)
        out = fn(*args)
    if out is not None:
        hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        # `out is not None` guard: with warmup=0 the first timed call
        # has no previous output to chain from
        if chain is not None and out is not None:
            args = chain(out, args)
        out = fn(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / iters, out
