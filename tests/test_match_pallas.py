"""Streaming Pallas matcher vs the XLA reference matcher.

Runs the kernel in interpret mode on CPU (the real-TPU path compiles the
same kernel); asserts the two matchers agree on the valid mask, and on
idx/dist for every valid row — including tie-breaking (argmin keeps the
lowest index) and the second-best used by the ratio test.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from tinyslam_tpu.ops.hamming import match_descriptors
from tinyslam_tpu.ops.match_pallas import PEN, match_reduce_streaming
from tinyslam_tpu.types import descriptor_signs


def _rand_desc(rng, n, dup_frac=0.2):
    """Random descriptors with deliberate duplicates (tie-break coverage)."""
    d = rng.integers(0, 2**32 - 1, (n, 8), np.uint32)
    ndup = int(n * dup_frac)
    if ndup:
        src = rng.integers(0, n, ndup)
        dst = rng.integers(0, n, ndup)
        d[dst] = d[src]
    return d


def _perturb(rng, d, flips=8):
    """Flip a few bits of each descriptor (Hamming ~flips: matchable)."""
    out = d.copy()
    for k in range(flips):
        word = rng.integers(0, 8, len(out))
        bit = rng.integers(0, 32, len(out))
        out[np.arange(len(out)), word] ^= (np.uint32(1) << bit).astype(
            np.uint32)
    return out


def _streaming_match(da, va, db, vb, *, max_distance, ratio, cross_check,
                     xy_a=None, proj_b=None, radius_px=0.0, nb=8, mb=128):
    n, m = da.shape[0], db.shape[0]
    sa = descriptor_signs(da)
    sbT = descriptor_signs(db).T
    arow = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(
        jnp.where(va, 0.0, float(PEN)))
    bcol = jnp.zeros((4, m), jnp.float32).at[0].set(
        jnp.where(vb, 0.0, float(PEN)))
    guided = xy_a is not None
    if guided:
        arow = arow.at[:, 1:3].set(xy_a)
        bcol = bcol.at[1:3].set(proj_b.T)
    best, second, idx_b, col_idx = match_reduce_streaming(
        sa, sbT, arow, bcol, radius_px=float(radius_px), guided=guided,
        nb=nb, mb=mb, interpret=True)
    ok = (best <= float(max_distance)) & (best <= ratio * second)
    if cross_check:
        ok &= col_idx[idx_b] == jnp.arange(n)
    ok &= va
    return {"idx_b": idx_b, "valid": ok,
            "dist": jnp.minimum(best, 1 << 14).astype(jnp.int32)}


@pytest.mark.parametrize("guided", [False, True])
def test_streaming_matches_xla(guided):
    rng = np.random.default_rng(7)
    N, M = 64, 256
    da_np = _rand_desc(rng, N)
    db_np = _rand_desc(rng, M)
    # Plant matchable (slightly perturbed) copies of A inside B.
    db_np[: N] = _perturb(rng, da_np)
    da, db = jnp.asarray(da_np), jnp.asarray(db_np)
    va = jnp.asarray(rng.random(N) > 0.1)
    vb = jnp.asarray(rng.random(M) > 0.1)

    kw = dict(max_distance=80, ratio=0.9, cross_check=True)
    if guided:
        xy_np = rng.uniform(0, 400, (N, 2)).astype(np.float32)
        proj_np = rng.uniform(0, 400, (M, 2)).astype(np.float32)
        # The planted matches project near their features (inside radius).
        proj_np[: N] = xy_np + rng.normal(0, 5, (N, 2)).astype(np.float32)
        xy_a = jnp.asarray(xy_np)
        proj_b = jnp.asarray(proj_np)
        radius = 30.0
        ref = match_descriptors(da, va, db, vb, xy_a=xy_a, proj_b=proj_b,
                                radius_px=radius, use_streaming=False, **kw)
        out = _streaming_match(da, va, db, vb, xy_a=xy_a, proj_b=proj_b,
                               radius_px=radius, **kw)
    else:
        ref = match_descriptors(da, va, db, vb, use_streaming=False, **kw)
        out = _streaming_match(da, va, db, vb, **kw)

    ref_valid = np.asarray(ref["valid"])
    out_valid = np.asarray(out["valid"])
    np.testing.assert_array_equal(out_valid, ref_valid)
    assert ref_valid.sum() > 5, "test has no power"
    v = ref_valid
    np.testing.assert_array_equal(
        np.asarray(out["idx_b"])[v], np.asarray(ref["idx_b"])[v])
    np.testing.assert_array_equal(
        np.asarray(out["dist"])[v], np.asarray(ref["dist"])[v])


def test_streaming_multi_block_rows():
    """Row accumulators must merge correctly across several j blocks and
    reset across i blocks (nb smaller than N)."""
    rng = np.random.default_rng(11)
    N, M = 32, 512
    da_np = _rand_desc(rng, N, 0.3)
    db_np = _rand_desc(rng, M, 0.3)
    db_np[100:100 + N] = _perturb(rng, da_np)
    da, db = jnp.asarray(da_np), jnp.asarray(db_np)
    va = jnp.ones(N, bool)
    vb = jnp.asarray(rng.random(M) > 0.05)
    ref = match_descriptors(da, va, db, vb, max_distance=128, ratio=0.95,
                            use_streaming=False)
    out = _streaming_match(da, va, db, vb, max_distance=128, ratio=0.95,
                           cross_check=True, nb=8, mb=128)
    v = np.asarray(ref["valid"])
    np.testing.assert_array_equal(np.asarray(out["valid"]), v)
    np.testing.assert_array_equal(
        np.asarray(out["idx_b"])[v], np.asarray(ref["idx_b"])[v])
