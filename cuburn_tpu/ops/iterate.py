"""The chaos-game iteration kernel: the hot loop of the renderer.

TPU-native equivalent of the reference's generated iter kernel
(cuburn/code/iter.py, SURVEY.md §3.5): where cuburn runs one point per
CUDA thread with divergent branches, this advances a batch of B
trajectories in SIMD lockstep under `lax.scan`:

  per iteration, for every point:
    u      = rng.uniform()
    xf     = branch-free CDF selection (xaos-conditioned on the
             previous xform when present)
    (x,y)  = post( sum_v w_v * V_v( affine * (x,y) ) )   [ops/xform.py]
    c      = c*(1-speed) + xf.color*speed
    badvalue (non-finite / |x|>1e10) -> respawn in bi-unit square,
             restart fuse (flam3 rule)
    if age >= fuse: plot final-xform copy through the camera,
             palette-lookup rgba * opacity -> (addr, rgba) record

cuburn's intra-warp point shuffle is unnecessary here — there is no
warp divergence on SIMD; per-lane independent RNG streams provide the
decorrelation instead (SURVEY.md §2b parallelism table).

The scan *collects* (addr, rgba) chunks; histogram accumulation is a
separate pluggable stage (ops/histogram.py), mirroring the reference's
deferred-writeback split (iter -> sort -> write).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cuburn_tpu.genome.specs import GenomeParams, StructureKey
from cuburn_tpu.ops import rng as rng_mod
from cuburn_tpu.ops.camera import CameraSpec, project
from cuburn_tpu.ops.xform import apply_final_xform, apply_xforms

BADVALUE_LIMIT = np.float32(1e10)


@dataclass
class IterState:
    """Per-trajectory mutable state (all (B,) except rng (B, 4));
    batch leads every leaf so shard_map can shard the whole pytree with
    one PartitionSpec prefix (parallel/shard.py)."""
    x: jnp.ndarray
    y: jnp.ndarray
    color: jnp.ndarray
    last_xf: jnp.ndarray   # int32
    age: jnp.ndarray       # int32, iterations since (re)spawn
    rng: jnp.ndarray       # (B, 4) uint32


jax.tree_util.register_dataclass(
    IterState, data_fields=["x", "y", "color", "last_xf", "age", "rng"],
    meta_fields=[])


def init_state(key: jax.Array, batch: int) -> IterState:
    """Fresh trajectories: uniform in the bi-unit square, random color,
    age 0 (must run `fuse` warmup iterations before plotting)."""
    kp, kc, kr = jax.random.split(key, 3)
    xy = jax.random.uniform(kp, (2, batch), jnp.float32, -1.0, 1.0)
    color = jax.random.uniform(kc, (batch,), jnp.float32)
    return IterState(
        x=xy[0], y=xy[1], color=color,
        last_xf=jnp.zeros((batch,), jnp.int32),
        age=jnp.zeros((batch,), jnp.int32),
        rng=rng_mod.seed(kr, batch))


def xform_cdf_rows(params: GenomeParams) -> jnp.ndarray:
    """(N, N) row-normalized CDFs: row i is the selection CDF over next
    xforms given previous xform i (weights row-conditioned by xaos,
    SURVEY.md §1 item 2)."""
    probs = params.weights[None, :] * params.xaos
    cdf = jnp.cumsum(probs, axis=1)
    total = jnp.maximum(cdf[:, -1:], np.float32(1e-20))
    return cdf / total


def _select_xform(key: StructureKey, cdf_rows, last_xf, u):
    n = key.n_xforms
    if key.has_xaos:
        rows = jnp.take(cdf_rows, last_xf, axis=0)       # (B, N)
        idx = jnp.sum(u[:, None] >= rows, axis=1)
    else:
        cdf = cdf_rows[0]                                # (N,)
        idx = jnp.sum(u[:, None] >= cdf[None, :], axis=1)
    return jnp.minimum(idx, n - 1).astype(jnp.int32)


def _palette_rgb(palette, color):
    """Linear-interp palette lookup; palette (256, 3), color (B,) in
    [0,1].  Equivalent of cuburn's palette texture fetch."""
    f = jnp.clip(color, 0.0, 1.0) * np.float32(255.0)
    i0 = jnp.floor(f).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, 255)
    frac = (f - i0.astype(jnp.float32))[:, None]
    return (jnp.take(palette, i0, axis=0) * (1.0 - frac) +
            jnp.take(palette, i1, axis=0) * frac)


@partial(jax.jit, static_argnames=("key", "cam", "n_iters", "fuse"))
def iterate_chunk(
    key: StructureKey,
    cam: CameraSpec,
    params: GenomeParams,
    cdf_rows: jnp.ndarray,
    state: IterState,
    ppu: jnp.ndarray,
    n_iters: int,
    fuse: int,
):
    """Advance every trajectory n_iters steps, emitting plot records.

    `ppu` is the profile-scaled pixels-per-unit (see ops/camera.py).
    Returns (new_state, addr (n_iters, B) int32, rgba (n_iters, B, 4)).
    Non-plottable records carry the junk-bin address.
    """

    def body(state: IterState, _):
        stream = rng_mod.RngStream(state.rng)
        u = stream.uniform()
        idx = _select_xform(key, cdf_rows, state.last_xf, u)

        nx, ny, ncolor = apply_xforms(
            key, params, idx, state.x, state.y, state.color, stream)

        bad = ~(jnp.isfinite(nx) & jnp.isfinite(ny)) \
            | (jnp.abs(nx) > BADVALUE_LIMIT) \
            | (jnp.abs(ny) > BADVALUE_LIMIT)
        rx = stream.uniform() * 2.0 - 1.0
        ry = stream.uniform() * 2.0 - 1.0
        rc = stream.uniform()
        nx = jnp.where(bad, rx, nx)
        ny = jnp.where(bad, ry, ny)
        ncolor = jnp.where(bad, rc, ncolor)
        age = jnp.where(bad, 0, state.age + 1)

        # plot (display-only final xform on a copy)
        px, py, pcolor = apply_final_xform(
            key, params, nx, ny, ncolor, stream)
        addr, in_bounds = project(
            cam, params.center, ppu, params.rotate, px, py)
        opacity = jnp.take(params.opacity, idx, axis=0)
        visible = (age >= fuse) & in_bounds & (opacity > 0.0)
        addr = jnp.where(visible, addr, cam.junk_bin)

        rgb = _palette_rgb(params.palette, pcolor)
        rgba = jnp.concatenate(
            [rgb * opacity[:, None], opacity[:, None]], axis=1)

        new_state = IterState(
            x=nx, y=ny, color=ncolor, last_xf=idx, age=age,
            rng=stream.state)
        return new_state, (addr, rgba)

    new_state, (addrs, rgbas) = jax.lax.scan(
        body, state, None, length=n_iters)
    return new_state, addrs, rgbas
