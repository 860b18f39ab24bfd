"""PnP pose tracking: robust Gauss-Newton on SE(3) from 3D-2D matches.

The per-frame tracker (BASELINE config 3): given map points and their pixel
observations in the current frame, refine the camera pose.  Fixed iteration
count, Huber-weighted, analytic 2x6 Jacobians — one fused batch of einsums
per iteration, no per-point control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tinyslam_tpu.geometry.camera import PinholeCamera
from tinyslam_tpu.geometry.se3 import se3_apply, se3_compose, se3_exp, so3_hat


def _residual_jacobian(cam: PinholeCamera, R, t, X, uv):
    """Residuals r = project(R X + t) - uv and Jacobians wrt a LEFT update
    T <- exp(xi) T.  Returns r (N, 2), J (N, 2, 6), front (N,) mask."""
    pc = se3_apply(R, t, X)                            # (N, 3)
    z = pc[..., 2]
    front = z > 1e-4
    zs = jnp.where(front, z, 1.0)
    u = cam.fx * pc[..., 0] / zs + cam.cx
    v = cam.fy * pc[..., 1] / zs + cam.cy
    r = jnp.stack([u, v], axis=-1) - uv                # (N, 2)

    inv_z = 1.0 / zs
    x_z = pc[..., 0] * inv_z
    y_z = pc[..., 1] * inv_z
    zero = jnp.zeros_like(z)
    # d(u,v)/d pc
    J_proj = jnp.stack(
        [
            jnp.stack([cam.fx * inv_z, zero, -cam.fx * x_z * inv_z], axis=-1),
            jnp.stack([zero, cam.fy * inv_z, -cam.fy * y_z * inv_z], axis=-1),
        ],
        axis=-2,
    )                                                  # (N, 2, 3)
    # d pc / d xi for left update: [I | -[pc]_x]
    J_pc = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (*pc.shape[:-1], 3, 3)),
            -so3_hat(pc),
        ],
        axis=-1,
    )                                                  # (N, 3, 6)
    J = J_proj @ J_pc                                  # (N, 2, 6)
    return r, J, front


@functools.partial(jax.jit, static_argnames=("iters", "final_iters"))
def pnp_refine(
    cam: PinholeCamera,
    X: jax.Array,
    uv: jax.Array,
    valid: jax.Array,
    R0: jax.Array,
    t0: jax.Array,
    iters: int = 8,
    huber_px: float = 4.0,
    damping: float = 1e-4,
    inlier_px: float = 4.0,
    final_iters: int = 4,
) -> dict[str, jax.Array]:
    """Two-stage Levenberg-damped Gauss-Newton PnP.

    Stage 1: `iters` Huber-weighted iterations over all observations
    (robust to outliers).  Stage 2: hard-reject residuals above `inlier_px`
    and run `final_iters` clean iterations on the survivors — Huber only
    downweights outliers, and at 20-30%% contamination the residual bias is
    measurable; the clean pass removes it.

    Args:
      cam: pinhole intrinsics.
      X: (N, 3) world points; uv: (N, 2) pixel observations; valid: (N,).
      R0, t0: initial world->camera pose.

    Returns dict with R, t, inliers (N,), rmse ().
    """

    def make_step(mask):
        def gn_step(carry, _):
            R, t = carry
            r, J, front = _residual_jacobian(cam, R, t, X, uv)
            ok = mask & front
            err = jnp.linalg.norm(r, axis=-1)
            # Huber IRLS weight.
            w_rob = jnp.where(err > huber_px, huber_px / jnp.maximum(err, 1e-9), 1.0)
            w = w_rob * ok.astype(jnp.float32)         # (N,)
            Jw = J * w[:, None, None]
            H = jnp.einsum("nik,nil->kl", Jw, J)       # (6, 6)
            g = jnp.einsum("nik,ni->k", Jw, r)         # (6,)
            H = H + damping * jnp.eye(6, dtype=H.dtype) * (1.0 + jnp.diag(H))
            delta = -jnp.linalg.solve(H, g)
            dR, dt = se3_exp(delta)
            return se3_compose(dR, dt, R, t), None
        return gn_step

    (R, t), _ = jax.lax.scan(make_step(valid), (R0, t0), None, length=iters)

    # Stage 2: hard outlier rejection, then clean iterations.
    r, _, front = _residual_jacobian(cam, R, t, X, uv)
    err = jnp.linalg.norm(r, axis=-1)
    keep = valid & front & (err < inlier_px)
    # Guard: only shrink the active set if enough survivors remain.
    keep = jnp.where(jnp.sum(keep.astype(jnp.int32)) >= 6, keep, valid)
    (R, t), _ = jax.lax.scan(make_step(keep), (R, t), None, length=final_iters)

    r, _, front = _residual_jacobian(cam, R, t, X, uv)
    err = jnp.linalg.norm(r, axis=-1)
    inliers = valid & front & (err < inlier_px)
    n_in = jnp.maximum(jnp.sum(inliers.astype(jnp.float32)), 1.0)
    rmse = jnp.sqrt(jnp.sum(jnp.where(inliers, err * err, 0.0)) / n_in)
    return {"R": R, "t": t, "inliers": inliers, "rmse": rmse,
            "num_inliers": jnp.sum(inliers.astype(jnp.int32))}
