"""Packed-knot genome interpolation: all animated parameters x all
temporal-sample times in one jitted evaluation.

Equivalent of the reference's GPU interp kernels (cuburn/code/interp.py
GenomePacker, SURVEY.md §2b): cuburn uploads spline knots once and
evaluates every packed parameter at each temporal sample on-device so
the host never re-uploads parameters per frame.  Here the same packing
feeds a vectorized Catmull-Rom evaluator; together with the in-program
temporal-sample loop (render.py) a whole motion-blurred frame is a
single device dispatch.

Semantics match genome/spline.py `Spline.evaluate` exactly (non-uniform
Catmull-Rom, end clamping) and are differential-tested against it.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from cuburn_tpu.genome.specs import Genome, GenomeParams
from cuburn_tpu.genome.spline import Spline


@dataclasses.dataclass
class PackedGenome:
    """Device-resident knot tables + the recipe to rebuild GenomeParams.

    knot_t / knot_v: (P, Kmax) f32, padded by repeating the last knot
    counts:          (P,) int32 — real knots per slot
    palettes:        (Q, 256, 3) f32 keyframes, palette_times (Q,)
    """
    knot_t: jnp.ndarray
    knot_v: jnp.ndarray
    counts: jnp.ndarray
    palettes: jnp.ndarray
    palette_times: jnp.ndarray
    _rebuild: Callable  # (values (P,), palette) -> GenomeParams

    def eval_params(self, ts) -> GenomeParams:
        """Evaluate at times ts (T,) -> GenomeParams with a leading
        temporal axis (T, ...) on every leaf."""
        ts = jnp.atleast_1d(jnp.asarray(ts, jnp.float32))
        vals = eval_packed(self.knot_t, self.knot_v, self.counts, ts)
        pals = _palette_at(self.palettes, self.palette_times, ts)
        return jax.vmap(self._rebuild)(vals, pals)


def eval_packed(knot_t, knot_v, counts, ts):
    """Batched non-uniform Catmull-Rom: (P, K) knots at (T,) times ->
    (T, P) values.  Mirrors Spline.evaluate."""
    T = ts.shape[0]
    P, K = knot_t.shape

    def at_time(t):
        # segment index per slot
        i = jnp.sum(knot_t <= t, axis=1) - 1           # (P,)
        i = jnp.clip(i, 0, counts - 2)
        i = jnp.maximum(i, 0)

        def g(arr, idx):
            return jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]

        im1 = jnp.maximum(i - 1, 0)
        ip1 = jnp.minimum(i + 1, counts - 1)
        ip2 = jnp.minimum(i + 2, counts - 1)
        t0, t1 = g(knot_t, i), g(knot_t, ip1)
        p0, p1, p2, p3 = (g(knot_v, im1), g(knot_v, i),
                          g(knot_v, ip1), g(knot_v, ip2))
        t_prev, t_next = g(knot_t, im1), g(knot_t, ip2)
        dt = jnp.where(t1 > t0, t1 - t0, 1.0)
        s = jnp.clip((t - t0) / dt, 0.0, 1.0)
        d_prev = jnp.where(t1 - t_prev > 0, t1 - t_prev, 1.0)
        d_next = jnp.where(t_next - t0 > 0, t_next - t0, 1.0)
        m1 = (p2 - p0) * dt / d_prev
        m2 = (p3 - p1) * dt / d_next
        s2, s3 = s * s, s * s * s
        h00 = 2 * s3 - 3 * s2 + 1
        h10 = s3 - 2 * s2 + s
        h01 = -2 * s3 + 3 * s2
        h11 = s3 - s2
        out = h00 * p1 + h10 * m1 + h01 * p2 + h11 * m2
        first_t = knot_t[:, 0]
        last_idx = jnp.maximum(counts - 1, 0)
        last_t = g(knot_t, last_idx)
        first_v = knot_v[:, 0]
        last_v = g(knot_v, last_idx)
        out = jnp.where(t <= first_t, first_v, out)
        out = jnp.where(t >= last_t, last_v, out)
        out = jnp.where(counts == 1, first_v, out)
        return out

    return jax.vmap(at_time)(ts)


def _palette_at(palettes, times, ts):
    """(Q, 256, 3) keyframes at (T,) times -> (T, 256, 3), linear."""
    def one(t):
        q = palettes.shape[0]
        hi = jnp.clip(jnp.sum(times <= t), 1, q - 1) if q > 1 else 1
        if q == 1:
            return palettes[0]
        lo = hi - 1
        t0, t1 = times[lo], times[hi]
        w = jnp.where(t1 > t0, (t - t0) / jnp.maximum(t1 - t0, 1e-20),
                      0.0)
        w = jnp.clip(w, 0.0, 1.0)
        return (1.0 - w) * palettes[lo] + w * palettes[hi]
    return jax.vmap(one)(ts)


def pack_genome(genome: Genome) -> PackedGenome:
    """Walk the genome exactly like Genome.eval_at and register every
    spline into packed knot tables (the DataPacker analog,
    cuburn/code/util.py, SURVEY.md §2b)."""
    key = genome.structure_key()
    n = len(genome.xforms)
    splines: List[Spline] = []

    def reg(s) -> int:
        splines.append(s)
        return len(splines) - 1

    def reg_affine(coefs):
        return [reg(c) for c in coefs]

    from cuburn_tpu.genome.specs import IDENTITY_AFFINE

    idx = {}
    idx["weights"] = [reg(xf.weight) for xf in genome.xforms]
    idx["affine"] = [reg_affine(xf.affine) for xf in genome.xforms]
    const = lambda v: reg(Spline(v))
    idx["post"] = [
        reg_affine(xf.post) if xf.post is not None
        else [const(v) for v in IDENTITY_AFFINE]
        for xf in genome.xforms]
    idx["color"] = [reg(xf.color) for xf in genome.xforms]
    idx["color_speed"] = [reg(xf.color_speed) for xf in genome.xforms]
    idx["opacity"] = [reg(xf.opacity) for xf in genome.xforms]

    V = len(key.variations)
    # empty vars = implicit linear weight 1 (Genome.eval_at's rule)
    idx["var_weights"] = [
        [reg(xf.vars[v]) if v in xf.vars
         else const(1.0 if (not xf.vars and v == "linear") else 0.0)
         for v in key.variations]
        for xf in genome.xforms]
    slots = key.param_slots
    idx["var_params"] = [
        [reg(xf.params[attr]) if attr in xf.params
         else const(_param_default(attr))
         for (_v, attr) in slots] or [const(0.0)]
        for xf in genome.xforms]

    if genome.xaos is not None:
        idx["xaos"] = [[reg(v) for v in row] for row in genome.xaos]
    else:
        idx["xaos"] = [[const(1.0)] * n for _ in range(n)]

    fx = genome.final_xform
    if fx is not None:
        fvars = key.final_variations
        idx["final_affine"] = reg_affine(fx.affine)
        idx["final_post"] = (reg_affine(fx.post) if fx.post is not None
                             else [const(v) for v in IDENTITY_AFFINE])
        idx["final_color"] = reg(fx.color)
        idx["final_color_speed"] = reg(fx.color_speed)
        idx["final_var_weights"] = [
            reg(fx.vars[v]) if v in fx.vars
            else const(1.0 if (not fx.vars and v == "linear") else 0.0)
            for v in fvars]
        fslots = key.final_param_slots
        idx["final_var_params"] = [
            reg(fx.params[attr]) if attr in fx.params
            else const(_param_default(attr))
            for (_v, attr) in fslots] or [const(0.0)]
    else:
        idx["final_affine"] = [const(v) for v in IDENTITY_AFFINE]
        idx["final_post"] = [const(v) for v in IDENTITY_AFFINE]
        idx["final_color"] = const(0.0)
        idx["final_color_speed"] = const(0.0)
        idx["final_var_weights"] = [const(0.0)]
        idx["final_var_params"] = [const(0.0)]

    idx["center"] = [reg(genome.center[0]), reg(genome.center[1])]
    rc = genome.rot_center or genome.center
    idx["rot_center"] = [reg(rc[0]), reg(rc[1])]
    idx["ppu"] = reg(genome.scale)
    idx["zoom"] = reg(genome.zoom)
    idx["rotate"] = reg(genome.rotate)
    for name in ("brightness", "gamma", "gamma_threshold", "vibrancy",
                 "highlight_power"):
        idx[name] = reg(getattr(genome, name))
    idx["background"] = [reg(s) for s in genome.background]
    idx["estimator_radius"] = reg(genome.estimator_radius)
    idx["estimator_minimum"] = reg(genome.estimator_minimum)
    idx["estimator_curve"] = reg(genome.estimator_curve)
    idx["spatial_filter"] = reg(genome.spatial_filter)
    idx["cam3d"] = [reg(getattr(genome, k)) for k in
                    ("cam_yaw", "cam_pitch", "cam_perspective",
                     "cam_zpos", "cam_dof")]

    # pack knots
    kmax = max(len(s.knots) for s in splines)
    P = len(splines)
    knot_t = np.zeros((P, kmax), np.float32)
    knot_v = np.zeros((P, kmax), np.float32)
    counts = np.zeros((P,), np.int32)
    for p, s in enumerate(splines):
        k = len(s.knots)
        knot_t[p, :k] = s.knots[:, 0]
        knot_v[p, :k] = s.knots[:, 1]
        # pad by repeating the final knot (keeps searchsorted monotone)
        knot_t[p, k:] = s.knots[-1, 0]
        knot_v[p, k:] = s.knots[-1, 1]
        counts[p] = k

    pal_times = np.asarray([t for t, _ in genome.palettes], np.float32)
    pals = np.stack([p for _, p in genome.palettes]).astype(np.float32)

    def rebuild(vals: jnp.ndarray, palette: jnp.ndarray) -> GenomeParams:
        a = lambda ix: vals[jnp.asarray(ix)]
        return GenomeParams(
            weights=a(idx["weights"]),
            xaos=a(idx["xaos"]),
            affine=a(idx["affine"]),
            post=a(idx["post"]),
            color=a(idx["color"]),
            color_speed=a(idx["color_speed"]),
            opacity=a(idx["opacity"]),
            var_weights=a(idx["var_weights"]),
            var_params=a(idx["var_params"]),
            final_affine=a(idx["final_affine"]),
            final_post=a(idx["final_post"]),
            final_color=a(idx["final_color"]),
            final_color_speed=a(idx["final_color_speed"]),
            final_var_weights=a(idx["final_var_weights"]),
            final_var_params=a(idx["final_var_params"]),
            palette=palette,
            center=a(idx["center"]),
            rot_center=a(idx["rot_center"]),
            # flam3 zoom: effective ppu = scale * 2^zoom (specs.eval_at)
            ppu=a(idx["ppu"]) * 2.0 ** a(idx["zoom"]),
            rotate=a(idx["rotate"]),
            brightness=a(idx["brightness"]),
            gamma=a(idx["gamma"]),
            gamma_threshold=a(idx["gamma_threshold"]),
            vibrancy=a(idx["vibrancy"]),
            highlight_power=a(idx["highlight_power"]),
            background=a(idx["background"]),
            estimator_radius=a(idx["estimator_radius"]),
            estimator_minimum=a(idx["estimator_minimum"]),
            estimator_curve=a(idx["estimator_curve"]),
            spatial_filter=a(idx["spatial_filter"]),
            cam3d=a(idx["cam3d"]),
        )

    return PackedGenome(
        knot_t=jnp.asarray(knot_t), knot_v=jnp.asarray(knot_v),
        counts=jnp.asarray(counts), palettes=jnp.asarray(pals),
        palette_times=jnp.asarray(pal_times), _rebuild=rebuild)


def _param_default(attr: str) -> float:
    # PARAM_DEFAULTS is the flat attr -> default map the schema
    # already maintains (genome/variations.py guarantees attr-name
    # uniqueness) — one source of truth for the fallback
    from cuburn_tpu.genome.variations import PARAM_DEFAULTS
    return PARAM_DEFAULTS[attr]
