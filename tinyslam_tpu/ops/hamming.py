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


def _streaming_shapes_ok(n: int, m: int) -> bool:
    """Shapes divisible by the streaming kernel's actual blocking:
    nb = min(256, n), mb = min(8192, m).  m must be lane-aligned and either
    fit one j block or tile it exactly (e.g. m = 12288 does NOT: mb would
    be 8192 and 12288 % 8192 != 0)."""
    return (n >= 8 and n % min(256, n) == 0
            and m >= 128 and m % 128 == 0
            and (m <= 8192 or m % 8192 == 0))


def _streaming_eligible(n: int, m: int, max_distance: int,
                        ratio: float) -> bool:
    """The Pallas streaming matcher needs TPU + block-divisible shapes +
    a config its penalty formulation can represent: a real distance must
    never beat a penalized one (max_distance < PEN) and a penalized
    second-best must never tighten the ratio test (ratio * PEN >= 256).
    Configs outside that envelope (e.g. ratio 0.7) are still legal — they
    fall back to the XLA matcher (ADVICE r4: asserting here crashed legal
    MatcherConfig values at runtime on TPU only)."""
    import jax as _jax

    from tinyslam_tpu.ops.match_pallas import PEN

    return (_jax.default_backend() == "tpu"
            and _streaming_shapes_ok(n, m)
            and max_distance < PEN
            and ratio * PEN >= 256)


@functools.partial(jax.jit, static_argnames=(
    "max_distance", "ratio", "cross_check", "radius_px", "use_streaming"))
def match_descriptors(
    desc_a: jax.Array,
    valid_a: jax.Array,
    desc_b: jax.Array,
    valid_b: jax.Array,
    max_distance: int = 64,
    ratio: float = 0.9,
    cross_check: bool = True,
    pair_mask: jax.Array | None = None,
    xy_a: jax.Array | None = None,
    proj_b: jax.Array | None = None,
    radius_px: float = 0.0,
    use_streaming: bool | None = None,
) -> dict[str, jax.Array]:
    """Mutual-nearest Hamming matching with Lowe ratio test.

    Guided matching (map points only eligible near their predicted
    projection) comes in two equivalent forms:
      - `pair_mask` (N, M) bool — explicit, materialized (XLA path);
      - `xy_a` (N, 2) + `proj_b` (M, 2) + `radius_px` — the gate computed
        on the fly (streamed Pallas path; encode ineligible B entries,
        e.g. behind-camera landmarks, with a far-away proj coordinate).
    Restricting candidates both removes wrong matches and makes the ratio
    test meaningful under repetitive texture.

    On TPU (and block-divisible shapes) the whole reduction runs as one
    streaming Pallas kernel (ops/match_pallas.py) — the (N, M) distance
    matrix never touches HBM.  The XLA fallback below is the reference
    semantics; both paths match on all valid rows.

    Returns dict with
      idx_b:  (N,) int32 — best match in B for each A feature.
      dist:   (N,) int32 — its Hamming distance.
      valid:  (N,) bool  — passes distance bound, ratio test and cross-check.
    """
    n, m = desc_a.shape[0], desc_b.shape[0]
    guided_stream = xy_a is not None and proj_b is not None
    if use_streaming is None:
        use_streaming = pair_mask is None and _streaming_eligible(
            n, m, max_distance, ratio)
    if use_streaming:
        from tinyslam_tpu.ops.match_pallas import PEN, match_reduce_streaming

        # Caller forced streaming: the penalty formulation must be able to
        # represent this config (see _streaming_eligible).
        assert max_distance < PEN, (max_distance, PEN)
        assert ratio * PEN >= 256, (ratio, PEN)
        sa = descriptor_signs(desc_a)
        sbT = descriptor_signs(desc_b).T
        arow = jnp.zeros((n, 4), jnp.float32)
        arow = arow.at[:, 0].set(jnp.where(valid_a, 0.0, float(PEN)))
        bcol = jnp.zeros((4, m), jnp.float32)
        bcol = bcol.at[0].set(jnp.where(valid_b, 0.0, float(PEN)))
        if guided_stream:
            arow = arow.at[:, 1:3].set(xy_a)
            bcol = bcol.at[1:3].set(proj_b.T)
        best, second, idx_b, col_idx = match_reduce_streaming(
            sa, sbT, arow, bcol,
            radius_px=float(radius_px), guided=guided_stream)
        ok = best <= float(max_distance)
        ok &= best <= ratio * second
        if cross_check:
            ok &= col_idx[idx_b] == jnp.arange(n)
        ok &= valid_a
        dist = jnp.minimum(best, 1 << 14).astype(jnp.int32)
        return {"idx_b": idx_b, "dist": dist, "valid": ok}

    if guided_stream and pair_mask is None:
        d2g = jnp.sum((xy_a[:, None, :] - proj_b[None, :, :]) ** 2, axis=-1)
        pair_mask = d2g < radius_px * radius_px

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
