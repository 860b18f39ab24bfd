"""Steered (rotated) BRIEF-256 descriptors.

TPU-native re-design of the reference's BRIEF compute shader (reference
src/shaders/brief.wgsl:22-68): per feature, 256 intensity comparisons between
rotated point pairs sampled from the *blurred* pyramid level the feature was
detected at, packed into 8 x u32 (brief.wgsl:43-67).  The reference spreads
one feature over 8 threads, one 32-bit word each; here the whole (N_features
x 256 pairs) grid is one vectorized compare — rotation, rounding and the
pack are fused VPU arithmetic, and the only memory-irregular step is two
(N, 256) gathers from the level image.

The sampling pattern: the reference embeds the classic learned ORB
``bit_pattern_31`` table (brief.wgsl:70-327).  We deliberately generate our
own deterministic pattern instead (Gaussian pairs, the original BRIEF recipe:
coords ~ N(0, (patch/5)^2) clipped to the +/-13 box) — descriptors only ever
compare against descriptors from the same pattern, so the pattern is a free
choice as long as it is fixed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 13  # +/-13 box, as the reference's table (brief.wgsl coords)


def _make_pattern(num_pairs: int = 256, seed: int = 7) -> np.ndarray:
    """(num_pairs, 2, 2) int32: [pair, point a/b, (x, y)]; deterministic."""
    rng = np.random.default_rng(seed)
    sigma = (2 * PATCH_RADIUS + 1) / 5.0
    pts = rng.normal(0.0, sigma, size=(num_pairs, 2, 2))
    pts = np.clip(np.rint(pts), -PATCH_RADIUS, PATCH_RADIUS).astype(np.int32)
    # Avoid degenerate pairs (a == b -> constant-zero bit).
    for i in range(num_pairs):
        while (pts[i, 0] == pts[i, 1]).all():
            pts[i, 1] = np.clip(
                np.rint(rng.normal(0.0, sigma, size=2)), -PATCH_RADIUS, PATCH_RADIUS
            ).astype(np.int32)
    return pts


BRIEF_PATTERN: np.ndarray = _make_pattern()


@functools.partial(jax.jit, static_argnames=("interpolate",))
def brief_descriptors(
    blurred: jax.Array,
    xy: jax.Array,
    angle: jax.Array,
    valid: jax.Array,
    interpolate: bool = False,
) -> jax.Array:
    """Compute steered BRIEF-256 for features on ONE pyramid level.

    Args:
      blurred: (H, W) float32 — the blurred level (reference blur_hierarchy).
      xy: (N, 2) float32 — feature (x, y) in THIS level's pixel coords.
      angle: (N,) float32 — orientation in radians.
      valid: (N,) bool.
      interpolate: bilinear sampling instead of nearest (reference uses
        integer truncation, brief.wgsl:57-58; nearest-rint is the default).

    Returns: (N, 8) uint32 packed descriptors (invalid slots are zero).
    """
    h, w = blurred.shape
    flat = blurred.reshape(-1)

    pat = jnp.asarray(BRIEF_PATTERN, jnp.float32)        # (256, 2, 2)
    pax, pay = pat[:, 0, 0], pat[:, 0, 1]                # (256,)
    pbx, pby = pat[:, 1, 0], pat[:, 1, 1]

    c = jnp.cos(angle)[:, None]                          # (N, 1)
    s = jnp.sin(angle)[:, None]
    x0 = xy[:, 0:1]
    y0 = xy[:, 1:2]

    def rotated(px, py):
        rx = c * px[None, :] - s * py[None, :] + x0      # (N, 256)
        ry = s * px[None, :] + c * py[None, :] + y0
        return rx, ry

    def sample(rx, ry):
        if interpolate:
            fx = jnp.clip(rx, 0.0, w - 1.001)
            fy = jnp.clip(ry, 0.0, h - 1.001)
            x1 = jnp.floor(fx).astype(jnp.int32)
            y1 = jnp.floor(fy).astype(jnp.int32)
            ax = fx - x1
            ay = fy - y1
            i00 = flat[(y1 * w + x1)]
            i01 = flat[(y1 * w + x1 + 1)]
            i10 = flat[((y1 + 1) * w + x1)]
            i11 = flat[((y1 + 1) * w + x1 + 1)]
            return (i00 * (1 - ax) + i01 * ax) * (1 - ay) + (
                i10 * (1 - ax) + i11 * ax
            ) * ay
        tx = jnp.clip(jnp.rint(rx).astype(jnp.int32), 0, w - 1)
        ty = jnp.clip(jnp.rint(ry).astype(jnp.int32), 0, h - 1)
        return flat[(ty * w + tx)]

    va = sample(*rotated(pax, pay))                      # (N, 256)
    vb = sample(*rotated(pbx, pby))
    bits = (va > vb)                                     # reference brief.wgsl:62

    words = bits.reshape(-1, 8, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    desc = jnp.sum(words << shifts, axis=-1, dtype=jnp.uint32)
    return jnp.where(valid[:, None], desc, jnp.uint32(0))
