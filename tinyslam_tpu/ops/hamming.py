"""Brute-force Hamming matching on the MXU.

The reference has no matcher (matching is unchecked roadmap,
reference README.md:53-57).  The TPU-native formulation (SURVEY §7): a
256-bit descriptor becomes a length-256 vector of {-1, +1} int8; then

    dot(a, b) = 256 - 2 * hamming(a, b)
    hamming   = (256 - dot) / 2

so the all-pairs Hamming matrix is a single (N, 256) x (256, M) int8
``dot_general`` — exactly the systolic-array shape the MXU is built for,
instead of the XOR+popcount scalar loop a GPU would run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tinyslam_tpu.types import descriptor_signs

_BIG = jnp.int32(1 << 14)  # sentinel distance for invalid slots (> 256)


def hamming_distance_matrix(desc_a: jax.Array, desc_b: jax.Array) -> jax.Array:
    """(N, 8) x (M, 8) packed uint32 -> (N, M) int32 Hamming distances."""
    sa = descriptor_signs(desc_a)                      # (N, 256) int8
    sb = descriptor_signs(desc_b)                      # (M, 256) int8
    dot = jax.lax.dot_general(
        sa, sb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                  # (N, M)
    return (256 - dot) // 2


@functools.partial(jax.jit, static_argnames=("max_distance", "ratio", "cross_check"))
def match_descriptors(
    desc_a: jax.Array,
    valid_a: jax.Array,
    desc_b: jax.Array,
    valid_b: jax.Array,
    max_distance: int = 64,
    ratio: float = 0.9,
    cross_check: bool = True,
    pair_mask: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """Mutual-nearest Hamming matching with Lowe ratio test.

    `pair_mask` (N, M) optionally restricts which pairs may match — e.g.
    guided matching, where map points are only eligible near their predicted
    projection.  Restricting candidates both removes wrong matches and makes
    the ratio test meaningful under repetitive texture.

    Returns dict with
      idx_b:  (N,) int32 — best match in B for each A feature.
      dist:   (N,) int32 — its Hamming distance.
      valid:  (N,) bool  — passes distance bound, ratio test and cross-check.
    """
    d = hamming_distance_matrix(desc_a, desc_b)        # (N, M)
    d = jnp.where(valid_a[:, None] & valid_b[None, :], d, _BIG)
    if pair_mask is not None:
        d = jnp.where(pair_mask, d, _BIG)

    idx_b = jnp.argmin(d, axis=1)                      # (N,)
    best = jnp.min(d, axis=1)
    # Second best: mask out the winner column per row.
    n = d.shape[0]
    d2 = d.at[jnp.arange(n), idx_b].set(_BIG)
    second = jnp.min(d2, axis=1)

    ok = best <= max_distance
    ok &= best.astype(jnp.float32) <= ratio * second.astype(jnp.float32)
    if cross_check:
        idx_a_of_b = jnp.argmin(d, axis=0)             # (M,)
        ok &= idx_a_of_b[idx_b] == jnp.arange(n)
    ok &= valid_a
    return {"idx_b": idx_b, "dist": best, "valid": ok}
