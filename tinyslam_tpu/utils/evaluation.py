"""Trajectory evaluation: ATE RMSE (with Sim3/SE3 Umeyama alignment) and RPE.

The standard TUM RGB-D / EuRoC benchmark metrics (BASELINE.md targets:
EuRoC MH_01-05 ATE RMSE <= 0.05 m).  Monocular trajectories are evaluated
with scale-aligned (Sim3) ATE, as is standard.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(est: np.ndarray, gt: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform aligning est -> gt.

    est, gt: (N, 3) matched positions.  Returns (s, R, t) with
    gt ~ s * R @ est + t.
    """
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    ec = est - mu_e
    gc = gt - mu_g
    cov = gc.T @ ec / len(est)
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    var_e = (ec * ec).sum() / len(est)
    s = float(np.trace(np.diag(d) @ S) / var_e) if with_scale else 1.0
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(est_positions: np.ndarray, gt_positions: np.ndarray,
             align: bool = True, with_scale: bool = True) -> float:
    """Absolute trajectory error RMSE after optional Umeyama alignment."""
    est = np.asarray(est_positions, np.float64)
    gt = np.asarray(gt_positions, np.float64)
    assert est.shape == gt.shape and est.ndim == 2
    if align and len(est) >= 3:
        s, R, t = umeyama_alignment(est, gt, with_scale)
        est = (s * (R @ est.T)).T + t
    err = np.linalg.norm(est - gt, axis=-1)
    return float(np.sqrt(np.mean(err * err)))


def rpe(est_poses: list[tuple[np.ndarray, np.ndarray]],
        gt_poses: list[tuple[np.ndarray, np.ndarray]],
        delta: int = 1) -> tuple[float, float]:
    """Relative pose error over a frame delta.

    Poses are world->camera (R, t) pairs.  Returns (trans_rmse, rot_rmse_deg).
    """
    def rel(poses, i, j):
        Ri, ti = poses[i]
        Rj, tj = poses[j]
        R = Rj @ Ri.T
        t = tj - R @ ti
        return R, t

    terrs, rerrs = [], []
    n = min(len(est_poses), len(gt_poses))
    for i in range(n - delta):
        Re, te = rel(est_poses, i, i + delta)
        Rg, tg = rel(gt_poses, i, i + delta)
        dR = Re @ Rg.T
        dt = te - dR @ tg
        terrs.append(np.linalg.norm(dt))
        c = np.clip((np.trace(dR) - 1) / 2, -1, 1)
        rerrs.append(np.degrees(np.arccos(c)))
    return float(np.sqrt(np.mean(np.square(terrs)))), float(
        np.sqrt(np.mean(np.square(rerrs)))
    )
