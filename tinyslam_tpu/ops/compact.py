"""Deterministic feature compaction: dense score map -> fixed-capacity list.

Replaces the reference's two-level atomic compaction (workgroup atomicAdd +
global range reservation, reference src/shaders/fast.wgsl:122-147).  Atomics
give a nondeterministic feature order and an un-ranked, first-come selection
when the buffer fills; ``jax.lax.top_k`` over the score map is deterministic
(same input => bit-identical output, testable in CI — SURVEY §5 'race
detection') and keeps the *best* k corners instead of an arbitrary subset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def select_topk(
    score: jax.Array,
    m10: jax.Array,
    m01: jax.Array,
    k: int,
) -> dict[str, jax.Array]:
    """Select the k highest-scoring pixels of one pyramid level.

    Args:
      score: (H, W) corner score map (0 = not a corner).
      m10, m01: (H, W) centroid moments from ops.fast.fast_score_map.
      k: static capacity.

    Returns dict with:
      xy:    (k, 2) float32 (x, y) in this level's pixel coords.
      angle: (k,) float32 atan2(m01, m10) — computed only at the k selected
             pixels (the reference runs atan2 per candidate, fast.wgsl:115).
      score: (k,) float32.
      valid: (k,) bool — score > 0.
    """
    h, w = score.shape
    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, k)
    y = idx // w
    x = idx % w
    valid = vals > 0.0
    ang = jnp.arctan2(m01.reshape(-1)[idx], m10.reshape(-1)[idx])
    xy = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    return {
        "xy": jnp.where(valid[:, None], xy, 0.0),
        "angle": jnp.where(valid, ang, 0.0),
        "score": jnp.where(valid, vals, 0.0),
        "valid": valid,
    }
