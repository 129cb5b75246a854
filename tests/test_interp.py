"""Packed-knot interpolation vs host spline evaluation (differential),
mirroring cuburn's interp-kernel-vs-SplEval contract (SURVEY.md §2b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuburn_tpu.genome.spline import Spline
from cuburn_tpu.models import animated_spark, full_feature, sierpinski
from cuburn_tpu.ops.interp import eval_packed, pack_genome


def test_eval_packed_matches_host_spline():
    rng = np.random.RandomState(0)
    splines = []
    for _ in range(40):
        nk = rng.randint(1, 6)
        ts = np.sort(rng.rand(nk) * 2.0)
        vs = rng.randn(nk)
        splines.append(Spline(np.stack([ts, vs], 1)))
    kmax = max(len(s.knots) for s in splines)
    knot_t = np.zeros((40, kmax), np.float32)
    knot_v = np.zeros((40, kmax), np.float32)
    counts = np.zeros((40,), np.int32)
    for p, s in enumerate(splines):
        k = len(s.knots)
        knot_t[p, :k] = s.knots[:, 0]
        knot_v[p, :k] = s.knots[:, 1]
        knot_t[p, k:] = s.knots[-1, 0]
        knot_v[p, k:] = s.knots[-1, 1]
        counts[p] = k
    query = np.linspace(-0.2, 2.2, 23).astype(np.float32)
    got = np.asarray(eval_packed(jnp.asarray(knot_t),
                                 jnp.asarray(knot_v),
                                 jnp.asarray(counts),
                                 jnp.asarray(query)))
    for p, s in enumerate(splines):
        expect = s.evaluate(query.astype(np.float64))
        np.testing.assert_allclose(got[:, p], expect, rtol=2e-4,
                                   atol=2e-5)


def _kaleido():
    from cuburn_tpu.models import get_genome
    return get_genome("kaleido")


@pytest.mark.parametrize("make", [sierpinski, full_feature,
                                  animated_spark, _kaleido])
def test_pack_genome_matches_eval_at(make):
    """EVERY GenomeParams field (enumerated via dataclasses.fields so
    new fields can't silently escape coverage — a hardcoded list once
    left post/final-color/DE params unchecked) must round-trip through
    the packed-knot device interpolation."""
    import dataclasses
    from cuburn_tpu.genome.specs import GenomeParams
    g = make()
    packed = pack_genome(g)
    for t in (0.0, 0.3, 0.77, 1.0):
        dev = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[0], packed.eval_params(np.array([t])))
        host = g.eval_at(t)
        for f in dataclasses.fields(GenomeParams):
            np.testing.assert_allclose(
                getattr(dev, f.name), getattr(host, f.name),
                rtol=2e-4, atol=2e-5, err_msg=f"{f.name} at t={t}")


def test_temporal_axis_shapes():
    g = animated_spark()
    packed = pack_genome(g)
    p = packed.eval_params(np.linspace(0, 1, 5))
    assert p.affine.shape[0] == 5
    assert p.palette.shape == (5, 256, 3)
    # values actually animate
    assert not np.allclose(np.asarray(p.affine[0]),
                           np.asarray(p.affine[-1]))
