"""Synthetic scenes, trajectories and rendered frames.

Ground-truth generators used by the geometry/BA/VO tests and benchmarks
(the reference has no datasets or tests at all — SURVEY §4; this module is
the in-repo stand-in for TUM/EuRoC sequences in environments without the
datasets on disk).
"""

from __future__ import annotations

import numpy as np

from tinyslam_tpu.geometry.camera import PinholeCamera

import jax.numpy as jnp


def default_camera(width: int = 640, height: int = 480) -> PinholeCamera:
    """TUM-fr1-like intrinsics."""
    return PinholeCamera.create(
        fx=517.3, fy=516.5, cx=width / 2 - 0.5, cy=height / 2 - 0.5
    )


def random_points(rng: np.random.Generator, n: int,
                  center=(0.0, 0.0, 0.0), extent=(4.0, 3.0, 2.0)) -> np.ndarray:
    c = np.asarray(center)
    e = np.asarray(extent)
    return (rng.random((n, 3)) - 0.5) * e + c


def look_at(camera_pos: np.ndarray, target: np.ndarray,
            up=(0.0, -1.0, 0.0)) -> tuple[np.ndarray, np.ndarray]:
    """World->camera (R, t) for a camera at `camera_pos` looking at `target`.
    Camera convention: +z forward, +x right, +y down (image coords)."""
    fwd = target - camera_pos
    fwd = fwd / np.linalg.norm(fwd)
    upv = np.asarray(up, np.float64)
    right = np.cross(upv, fwd)
    nr = np.linalg.norm(right)
    if nr < 1e-8:  # looking along up: pick another up
        upv = np.array([1.0, 0.0, 0.0])
        right = np.cross(upv, fwd)
        nr = np.linalg.norm(right)
    right /= nr
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)
    t = -R @ camera_pos
    return R.astype(np.float32), t.astype(np.float32)


def orbit_trajectory(num_frames: int, radius: float = 6.0,
                     height: float = 0.5, arc: float = 0.8,
                     target=(0.0, 0.0, 0.0)) -> list[tuple[np.ndarray, np.ndarray]]:
    """Cameras on a horizontal arc, all looking at `target`."""
    poses = []
    tgt = np.asarray(target, np.float64)
    for i in range(num_frames):
        a = (i / max(num_frames - 1, 1) - 0.5) * arc
        pos = np.array([radius * np.sin(a), height, -radius * np.cos(a)]) + tgt
        poses.append(look_at(pos, tgt))
    return poses


def project_points(cam: PinholeCamera, R: np.ndarray, t: np.ndarray,
                   X: np.ndarray, width: int = 640, height: int = 480,
                   noise_px: float = 0.0, outlier_frac: float = 0.0,
                   rng: np.random.Generator | None = None):
    """Project world points; returns (uv (N,2), visible (N,) bool).
    Optionally perturbs with Gaussian pixel noise and replaces a fraction
    with uniform outliers (still marked visible — that's the point)."""
    rng = rng or np.random.default_rng(0)
    Xc = X @ np.asarray(R).T + np.asarray(t)
    z = Xc[:, 2]
    vis = z > 0.1
    zs = np.where(vis, z, 1.0)
    u = float(cam.fx) * Xc[:, 0] / zs + float(cam.cx)
    v = float(cam.fy) * Xc[:, 1] / zs + float(cam.cy)
    uv = np.stack([u, v], axis=-1)
    if noise_px > 0:
        uv = uv + rng.normal(0.0, noise_px, uv.shape)
    if outlier_frac > 0:
        out = rng.random(len(uv)) < outlier_frac
        uv[out] = rng.random((out.sum(), 2)) * np.array([width, height])
    vis &= (uv[:, 0] >= 0) & (uv[:, 0] < width) & (uv[:, 1] >= 0) & (uv[:, 1] < height)
    return uv.astype(np.float32), vis


def render_dots(uv: np.ndarray, visible: np.ndarray, width: int = 640,
                height: int = 480, radius: int = 2,
                bg: float = 0.2, fg: float = 0.9) -> np.ndarray:
    """Render visible points as bright squares — frames whose FAST corners
    sit exactly at the projected landmarks (full-pipeline ground truth)."""
    img = np.full((height, width), bg, np.float32)
    r = radius
    for (x, y), v in zip(np.rint(uv).astype(int), visible):
        if not v:
            continue
        if r <= x < width - r and r <= y < height - r:
            img[y - r : y + r + 1, x - r : x + r + 1] = fg
    return img


def normalized(cam: PinholeCamera, uv: np.ndarray) -> np.ndarray:
    return np.asarray(cam.normalize(jnp.asarray(uv)))
