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


def _dlt_pose(cam: PinholeCamera, X: jax.Array, uv: jax.Array,
              w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Weighted DLT absolute pose from >= 6 3D-2D matches.

    Builds the 2n x 12 homogeneous system for P = [R|t] in NORMALIZED image
    coords, solves via the smallest eigenvector of the 12x12 normal matrix
    (eigh — symmetric, so it stays fast on TPU, unlike nonsymmetric
    eigen/quartic solvers), then projects the 3x3 block onto SO(3) with a
    3x3 SVD and fixes scale/chirality by the depth sign.

    Args: X (N, 3), uv (N, 2) pixels, w (N,) weights (0 disables a row).
    Returns (R, t).  Degenerate inputs yield garbage poses — callers score
    hypotheses by inlier count, so bad samples lose the vote (RANSAC).
    """
    x = (uv[:, 0] - cam.cx) / cam.fx
    y = (uv[:, 1] - cam.cy) / cam.fy
    n = X.shape[0]
    zeros = jnp.zeros((n, 4), X.dtype)
    Xh = jnp.concatenate([X, jnp.ones((n, 1), X.dtype)], axis=1)   # (N, 4)
    rows_u = jnp.concatenate([Xh, zeros, -x[:, None] * Xh], axis=1)
    rows_v = jnp.concatenate([zeros, Xh, -y[:, None] * Xh], axis=1)
    A = jnp.concatenate([rows_u * w[:, None], rows_v * w[:, None]], axis=0)
    M = A.T @ A                                                    # (12, 12)
    _, vecs = jnp.linalg.eigh(M)
    p = vecs[:, 0].reshape(3, 4)                                   # smallest
    Rp, tp = p[:, :3], p[:, 3]
    # Scale: ||R|| should have unit singular values.
    U, s, Vt = jnp.linalg.svd(Rp)
    R = U @ Vt
    detR = jnp.linalg.det(R)
    R = R * detR                                 # det +1 (flips sign if -1)
    # The det factor also absorbs the +-p null-vector sign: Rp = lam*R_true
    # with lam of either sign; det(U Vt) = sign(lam), so R is always the
    # true rotation and scale = det * 3/sum(s) = 1/lam recovers t exactly.
    scale = detR * 3.0 / jnp.maximum(jnp.sum(s), 1e-12)
    t = tp * scale
    return R, t


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "sample_size",
                                              "refine_iters"))
def pnp_ransac(
    cam: PinholeCamera,
    X: jax.Array,
    uv: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    num_hypotheses: int = 128,
    sample_size: int = 8,
    inlier_px: float = 6.0,
    refine_iters: int = 8,
) -> dict[str, jax.Array]:
    """Absolute-pose RANSAC: batched DLT hypotheses, inlier vote, GN polish.

    The relocalization initializer (no pose prior — pnp_refine alone is a
    LOCAL method and cannot recover from a stale pose).  All hypotheses are
    solved in one vmap — RANSAC as a batch, not a loop (SURVEY §7: batched
    hypotheses are the TPU shape of RANSAC).

    Returns dict with R, t, inliers (N,), num_inliers, rmse.
    """
    n = X.shape[0]
    vf = valid.astype(X.dtype)
    # Importance-free sampling with invalid entries pushed out by weighting:
    # sample indices proportional to validity.
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.random.categorical(
        key, logits[None, :], axis=-1,
        shape=(num_hypotheses, sample_size))           # (H, S)

    def hyp(sample_idx):
        w = jnp.zeros((n,), X.dtype).at[sample_idx].add(1.0) * vf
        return _dlt_pose(cam, X, uv, w)

    Rs, ts = jax.vmap(hyp)(idx)                        # (H, 3, 3), (H, 3)

    def score(R, t):
        pc = X @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = cam.fx * pc[:, 0] / z + cam.cx
        v = cam.fy * pc[:, 1] / z + cam.cy
        err = jnp.linalg.norm(jnp.stack([u, v], -1) - uv, axis=-1)
        inl = valid & (pc[:, 2] > 1e-4) & (err < inlier_px)
        return jnp.sum(inl.astype(jnp.int32))

    votes = jax.vmap(score)(Rs, ts)                    # (H,)
    best = jnp.argmax(votes)
    R0, t0 = Rs[best], ts[best]
    out = pnp_refine(cam, X, uv, valid, R0, t0,
                     iters=refine_iters, inlier_px=inlier_px)
    out["hypothesis_inliers"] = votes[best]
    return out
