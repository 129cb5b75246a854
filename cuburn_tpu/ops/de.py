"""Adaptive density-estimation filtering, TPU-style.

Equivalent of the reference's DE kernel (cuburn/code/filtering.py
density_est, SURVEY.md §2b item 6): flam3's adaptive blur where each
accumulator cell splats its (log-scaled) energy with a Gaussian whose
radius *shrinks* with the cell's own density:

    r(d) = clamp(max_radius / d^curve, min_radius, max_radius)

A direct port would be a data-dependent scatter (cuburn's scatter-style
kernel); on TPU we instead use the **banded decomposition**, which is
exactly equivalent in structure and maps onto dense convs:

    quantize r into K geometric levels r_k
    out = sum_k  separable_gaussian_blur(img * [band(px) == k], r_k)

Each source pixel contributes through its own radius band, preserving
flam3's scatter semantics (per-SOURCE radius, not per-dest), while all
the work is K separable convolutions — dense, fusable, MXU/VPU-friendly
(SURVEY.md §7 "hard parts" item 2 names this fallback; here it is the
primary implementation, with kernel LUT rows computed at trace time).

Radius is measured in accumulator (supersampled) pixels; callers
pre-scale genome estimator_radius by ss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Static geometry of the band decomposition (compile-time).
N_BANDS = 8
MAX_TAP_RADIUS = 16          # kernel half-width; radii clamp to this
MIN_BAND_RADIUS = 0.5        # radii below this are effectively identity


def _band_radii(max_radius):
    """Traced (N_BANDS,) geometric radius ladder from max_radius down to
    MIN_BAND_RADIUS."""
    max_r = jnp.clip(max_radius, MIN_BAND_RADIUS, MAX_TAP_RADIUS)
    g = (MIN_BAND_RADIUS / max_r) ** (1.0 / (N_BANDS - 1))
    k = jnp.arange(N_BANDS, dtype=jnp.float32)
    return max_r * g ** k     # r_0 = max_r ... r_{K-1} = MIN_BAND_RADIUS


def _gaussian_taps(radius):
    """Normalized (2*MAX_TAP_RADIUS+1,) Gaussian for a traced radius.
    sigma = r/2 so the kernel is ~0 beyond r; r -> 0 degenerates to a
    delta (identity blur), which is how the sharpest band stays sharp."""
    x = jnp.arange(-MAX_TAP_RADIUS, MAX_TAP_RADIUS + 1,
                   dtype=jnp.float32)
    sigma = jnp.maximum(radius * 0.5, np.float32(1e-3))
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _sep_blur(img, taps):
    """Separable blur of (H, W, C) with 1-D taps along both axes."""
    H, W, C = img.shape
    x = img.transpose(2, 0, 1)[None]          # (1, C, H, W)
    kh = jnp.broadcast_to(taps[None, None, :, None],
                          (C, 1, taps.shape[0], 1))
    kw = jnp.broadcast_to(taps[None, None, None, :],
                          (C, 1, 1, taps.shape[0]))
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    pad = MAX_TAP_RADIUS
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn,
        feature_group_count=C)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
        feature_group_count=C)
    return x[0].transpose(1, 2, 0)


def radius_for_density(density, max_radius, min_radius, curve):
    """flam3's estimator formula, vectorized (density in raw counts)."""
    d = jnp.maximum(density, 1.0)
    r = max_radius / jnp.power(d, curve)
    return jnp.clip(r, min_radius, jnp.maximum(max_radius, min_radius))


def density_filter(img, density, max_radius, min_radius, curve):
    """Banded adaptive DE blur.

    img     (H, W, 4) log-scaled premultiplied rgba
    density (H, W)    raw accumulator counts (pre-logscale)
    radii in accumulator pixels (already ss-scaled by the caller).
    """
    radii = _band_radii(max_radius)
    r_px = radius_for_density(density, jnp.clip(max_radius, 0.0,
                                                MAX_TAP_RADIUS),
                              min_radius, curve)
    # nearest band in log space
    logr = jnp.log(jnp.maximum(r_px, MIN_BAND_RADIUS))
    log_bands = jnp.log(radii)                          # (K,)
    band = jnp.argmin(
        jnp.abs(logr[..., None] - log_bands[None, None, :]), axis=-1)

    out = jnp.zeros_like(img)
    for k in range(N_BANDS):
        mask = (band == k)[..., None].astype(img.dtype)
        taps = _gaussian_taps(radii[k])
        out = out + _sep_blur(img * mask, taps)
    return out
