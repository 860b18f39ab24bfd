"""SO(3)/SE(3) Lie-group operations, batch-friendly and jit-safe.

Poses are (R, t) pairs: R (..., 3, 3) rotation, t (..., 3) translation,
mapping points camera<-world or frame<-frame depending on context.  Tangent
vectors xi are (..., 6) ordered [upsilon (trans), omega (rot)].

All small-angle branches use jnp.where with Taylor fallbacks (no lax.cond)
so everything vmaps/shards cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def so3_hat(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = so3_hat(w / theta[..., None])
    s = jnp.sin(theta)[..., None, None]
    c1 = (1.0 - jnp.cos(theta))[..., None, None]
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    R_full = I + s * K + c1 * (K @ K)
    # Small-angle: R ~ I + hat(w) (+ 0.5 hat(w)^2)
    H = so3_hat(w)
    R_small = I + H + 0.5 * (H @ H)
    small = (theta2 < 1e-12)[..., None, None]
    return jnp.where(small, R_small, R_full)


def rotation_to_quaternion(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) unit quaternion (w, x, y, z), w >= 0.

    Shepperd's branch-max method, implemented branchlessly (all four
    candidates computed, the numerically largest selected with jnp.where)
    so it vmaps and stays stable for every rotation incl. theta ~ pi.
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tw = 1.0 + r00 + r11 + r22   # 4 w^2
    tx = 1.0 + r00 - r11 - r22   # 4 x^2
    ty = 1.0 - r00 + r11 - r22   # 4 y^2
    tz = 1.0 - r00 - r11 + r22   # 4 z^2
    cand = jnp.stack([tw, tx, ty, tz], axis=-1)
    i_max = jnp.argmax(cand, axis=-1)

    def build(i):
        if i == 0:
            s = jnp.sqrt(jnp.maximum(tw, _EPS)) * 2.0  # 4w
            return jnp.stack(
                [0.25 * s, (r21 - r12) / s, (r02 - r20) / s, (r10 - r01) / s],
                axis=-1,
            )
        if i == 1:
            s = jnp.sqrt(jnp.maximum(tx, _EPS)) * 2.0  # 4x
            return jnp.stack(
                [(r21 - r12) / s, 0.25 * s, (r01 + r10) / s, (r02 + r20) / s],
                axis=-1,
            )
        if i == 2:
            s = jnp.sqrt(jnp.maximum(ty, _EPS)) * 2.0  # 4y
            return jnp.stack(
                [(r02 - r20) / s, (r01 + r10) / s, 0.25 * s, (r12 + r21) / s],
                axis=-1,
            )
        s = jnp.sqrt(jnp.maximum(tz, _EPS)) * 2.0      # 4z
        return jnp.stack(
            [(r10 - r01) / s, (r02 + r20) / s, (r12 + r21) / s, 0.25 * s],
            axis=-1,
        )

    q = build(0)
    for i in (1, 2, 3):
        q = jnp.where((i_max == i)[..., None], build(i), q)
    q = q * jnp.sign(q[..., 0:1] + _EPS)  # canonical hemisphere w >= 0
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def so3_log(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation -> (..., 3) axis-angle (via quaternion, stable
    over the whole group incl. theta ~ 0 and theta ~ pi)."""
    q = rotation_to_quaternion(R)
    qw = q[..., 0]
    qv = q[..., 1:]
    norm_qv = jnp.linalg.norm(qv, axis=-1)
    theta = 2.0 * jnp.arctan2(norm_qv, qw)
    # w = theta * qv / |qv|; near identity use 2*qv (theta ~ 2|qv|/qw ~ 2|qv|).
    scale = jnp.where(norm_qv > 1e-7, theta / jnp.maximum(norm_qv, _EPS), 2.0 / jnp.maximum(qw, _EPS))
    return qv * scale[..., None]


def _so3_left_jacobian(w: jax.Array) -> jax.Array:
    """V such that se3_exp translation = V @ upsilon."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    H = so3_hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), H.shape)
    a = ((1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS))[..., None, None]
    b = ((theta - jnp.sin(theta)) / (theta2 * theta + _EPS))[..., None, None]
    V_full = I + a * H + b * (H @ H)
    V_small = I + 0.5 * H + (H @ H) / 6.0
    small = (theta2 < 1e-12)[..., None, None]
    return jnp.where(small, V_small, V_full)


def _so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    H = so3_hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), H.shape)
    half = 0.5 * theta
    cot = jnp.where(jnp.abs(jnp.tan(half)) > 1e-8, 1.0 / jnp.tan(half), 2.0 / theta)
    c = jnp.where(
        theta2 > 1e-12,
        (1.0 / (theta2 + _EPS * _EPS)) * (1.0 - theta * cot / 2.0),
        jnp.full_like(theta, 1.0 / 12.0),
    )[..., None, None]
    return I - 0.5 * H + c * (H @ H)


def se3_identity(batch: tuple[int, ...] = (), dtype=jnp.float32):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch, 3, 3))
    t = jnp.zeros((*batch, 3), dtype=dtype)
    return R, t


def se3_exp(xi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., 6) [upsilon, omega] -> (R, t)."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = _so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_log(R: jax.Array, t: jax.Array) -> jax.Array:
    """(R, t) -> (..., 6) [upsilon, omega]."""
    w = so3_log(R)
    Vinv = _so3_left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([v, w], axis=-1)


def se3_compose(Ra, ta, Rb, tb) -> tuple[jax.Array, jax.Array]:
    """(Ra, ta) o (Rb, tb): apply b first, then a."""
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t


def se3_inverse(R, t) -> tuple[jax.Array, jax.Array]:
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, x) -> jax.Array:
    """Transform points x (..., 3)."""
    return jnp.einsum("...ij,...j->...i", R, x) + t
