"""Intra-frame multi-chip rendering: shard_map over a device mesh.

TPU-native replacement for the reference's single-GPU-per-frame model
(SURVEY.md §2b parallelism table, last row): instead of farming whole
frames, a frame's trajectory batch is sharded across every chip of a
`jax.sharding.Mesh`; each chip runs the identical chaos-game program on
its shard and accumulates a *local* partial histogram; one `psum` over
ICI per frame (not per chunk!) produces the full histogram.  The filter
stages then run on the (replicated) histogram.

This is the renderer's entire collective footprint — the histogram
reduce (SURVEY.md §2b distributed-communication row).

The chunk loop lives *inside* the shard_map region so partial
histograms never masquerade as replicated values between calls; the
reduction happens exactly once, on the way out.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuburn_tpu.genome.specs import Genome, StructureKey
from cuburn_tpu.ops import histogram as hist_mod
from cuburn_tpu.ops.camera import CameraSpec
from cuburn_tpu.ops.iterate import (IterState, init_state,
                                    iterate_accumulate, xform_cdf_rows)
from cuburn_tpu.profile import RenderProfile

BATCH_AXIS = "batch"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-D mesh over the first n (default all) local devices.

    Trajectory parallelism is the data parallelism of this problem
    (SURVEY.md §2b): a 1-D axis suffices; the histogram psum rides ICI.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (BATCH_AXIS,))


@functools.partial(
    jax.jit,
    static_argnames=("key", "cam", "backend", "mesh", "n_chunks",
                     "n_iters", "fuse"))
def sharded_accumulate(
    key: StructureKey,
    cam: CameraSpec,
    backend: str,
    mesh: Mesh,
    params,
    cdf_rows,
    state: IterState,
    hist,
    ppu,
    n_chunks: int,
    n_iters: int,
    fuse: int,
):
    """Run n_chunks x n_iters chaos-game steps across the mesh.

    state is sharded on the batch axis; params/hist are replicated.
    Returns (state', hist', plotted_count) with hist' fully reduced
    (replicated) — the one ICI collective per call.
    """
    def device_body(params, cdf_rows, state, hist, ppu):
        state, hist, n = iterate_accumulate(
            key, cam, backend, params, cdf_rows, state, hist, ppu,
            jnp.int32(n_chunks), n_iters, fuse)
        # the single collective: reduce partial histograms over ICI
        hist = jax.lax.psum(hist, BATCH_AXIS)
        plotted = jax.lax.psum(n, BATCH_AXIS)
        return state, hist, plotted

    # check_vma=False: the replicated zero histogram and plot counter
    # become device-varying inside iterate_accumulate's private loop
    # carries; the explicit psums above restore replication on the way
    # out, which the static vma checker can't see through the shared
    # single-chip code path.
    shard = jax.shard_map(
        device_body, mesh=mesh,
        in_specs=(P(), P(), P(BATCH_AXIS), P(), P()),
        out_specs=(P(BATCH_AXIS), P(), P()),
        check_vma=False,
    )
    return shard(params, cdf_rows, state, hist, ppu)


class ShardedRenderer:
    """Multi-chip version of render.Renderer (same output contract).

    Scaling model per SURVEY.md §5 long-context row: each chip owns a
    full histogram replica (HBM-resident), trajectories shard across
    chips, psum once per accumulate call."""

    def __init__(self, genome: Genome, profile: RenderProfile,
                 mesh: Optional[Mesh] = None):
        self.genome = genome
        self.profile = profile
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = self.mesh.devices.size
        if profile.batch % self.n_devices:
            raise ValueError(
                f"batch {profile.batch} must divide over "
                f"{self.n_devices} devices")
        self.key = genome.structure_key()
        self.cam = CameraSpec(profile.width, profile.height, profile.ss)
        backend = profile.hist_backend
        if backend == "auto":
            backend = "sortcum" if jax.default_backend() == "tpu" \
                else "scatter"
        self.backend = backend

    def render_frame(self, t: float = 0.0, seed: int = 0):
        import time as _time
        from cuburn_tpu.render import (FrameStats, _filter_frame,
                                       _to_device)
        prof, cam = self.profile, self.cam
        stats = FrameStats()
        params = _to_device(self.genome.eval_at(t))
        cdf_rows = xform_cdf_rows(params)
        ppu = params.ppu * jnp.float32(prof.width / self.genome.size[0])

        state = init_state(jax.random.PRNGKey(seed), prof.batch)
        state = jax.device_put(
            state, NamedSharding(self.mesh, P(BATCH_AXIS)))
        hist = hist_mod.alloc(cam.n_bins)

        per_chunk = prof.batch * prof.iters_per_chunk
        n_chunks = max(1, int(np.ceil(prof.total_iters / per_chunk)))
        t0 = _time.perf_counter()
        state, hist, plotted = sharded_accumulate(
            self.key, cam, self.backend, self.mesh, params, cdf_rows,
            state, hist, ppu, n_chunks, prof.iters_per_chunk, prof.fuse)
        hist.block_until_ready()
        stats.iterate_s = _time.perf_counter() - t0
        stats.plotted_samples = int(plotted)
        stats.total_iters = n_chunks * per_chunk

        t1 = _time.perf_counter()
        q_cell = jnp.float32(prof.quality / (cam.ss * cam.ss))
        de_on = prof.de_enabled and float(params.estimator_radius) > 0
        img = _filter_frame(cam, prof.transparent, de_on,
                            hist_mod.finalize(hist), params, q_cell)
        img = np.asarray(img)
        stats.filter_s = _time.perf_counter() - t1
        return img, stats
