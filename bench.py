"""Headline benchmark — run on real TPU by the driver after every round.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline: TRACKED frames/s on one chip — the BASELINE.json north star
(floor: >= 200 tracked fps/chip).  Measured by driving the flagship
device-resident tracker (models/vo_device.py track_chunk: extraction,
guided matching, PnP, keyframe insertion + windowed BA under lax.cond, all
in one lax.scan dispatch per chunk) over rendered 640x480 frames of a
textured-room sequence, post-bootstrap.  Secondary: front-end-only fps
(the previous headline, BASELINE config 1).

Methodology notes:
- every timed call uses DISTINCT input frames and an evolving carry state
  (the sandbox TPU relay memoizes identical executions, which silently
  inflates repeat-timing);
- chunks are dispatched back-to-back and synchronized once at the end of
  each round — exactly DeviceVO's production dispatch pattern;
- the fraction of timed frames actually TRACKED is reported; a tracked-fps
  number where tracking collapsed would be meaningless;
- the persistent XLA compilation cache is enabled (utils/cache.py) so the
  reported numbers are compute, not compile.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _render_room_sequence(n_frames: int, width: int = 640, height: int = 480):
    """Rendered 640x480 frames orbiting a textured room (true 3D corners,
    perspective-correct — the same generator the accuracy eval uses)."""
    from tinyslam_tpu.data.synthetic import (
        TexturedRoom,
        orbit_trajectory,
    )
    from tinyslam_tpu.geometry.camera import PinholeCamera

    rng = np.random.default_rng(3)
    cam = PinholeCamera.create(
        fx=520.0, fy=520.0, cx=width / 2 - 0.5, cy=height / 2 - 0.5)
    room = TexturedRoom(rng, tex_res=64, octaves=2)
    poses = orbit_trajectory(n_frames, radius=2.0, step=0.02,
                             start=-0.35, target=(0.0, 0.0, 2.0))
    frames = [room.render(cam, R, t, width, height) for R, t in poses]
    return cam, frames


def _render_eval_grade_sequence(n_frames: int, width: int = 640,
                                height: int = 480):
    """Eval-grade frames: real fr1 intrinsics + radtan lens distortion,
    handheld 6-DoF motion, vignetting, auto-exposure hunting, sensor noise,
    8-bit quantization — the tools/eval_ate.py renderer (VERDICT r4 weak #1:
    a tracked-fps claim should survive eval-grade rendering).  Frames are
    undistorted through the production Undistorter, as the TUM loader does."""
    from tinyslam_tpu.data.synthetic import (
        TexturedRoom, handheld_trajectory, render_sequence,
    )
    from tinyslam_tpu.data.tum import FR1_DIST, FR1_INTRINSICS
    from tinyslam_tpu.data.undistort import Undistorter
    from tinyslam_tpu.geometry.camera import PinholeCamera

    rng = np.random.default_rng(101)
    room = TexturedRoom(rng, tex_res=128, octaves=3, clutter=8)
    cam = PinholeCamera.create(**FR1_INTRINSICS)
    poses = handheld_trajectory(rng, n_frames)
    frames = render_sequence(rng, poses, cam, width, height, room,
                             dist=FR1_DIST)
    und = Undistorter(FR1_INTRINSICS, FR1_DIST, height=height, width=width)
    return cam, [und(f) for f in frames]


def bench_tracked(chunk: int = 32, chunks_timed: int = 4,
                  rounds: int = 3, eval_grade: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from tinyslam_tpu.config import SlamConfig
    from tinyslam_tpu.models.vo_device import DeviceVO, track_chunk

    cfg = SlamConfig()
    n_total = 14 + chunk * (chunks_timed + 1)
    render = (_render_eval_grade_sequence if eval_grade
              else _render_room_sequence)
    cam, frames = render(n_total, cfg.frontend.width, cfg.frontend.height)

    # Bootstrap on the host path (two-view init), then lift to VOState.
    vo = DeviceVO(cfg, cam, chunk=chunk)
    i = 0
    while not vo.initialized and i < len(frames):
        vo.process(jnp.asarray(frames[i]))
        i += 1
    assert vo.initialized, "bootstrap failed on the bench sequence"
    state = vo.state
    active = jnp.ones((chunk,), bool)

    def mk(j):
        return jnp.asarray(np.stack(frames[j:j + chunk]))

    # Warm-up chunk: pays compile (or loads the persistent cache).
    state, ys = track_chunk(cam, cfg, state, mk(i), active)
    np.asarray(ys["summary"])  # full readback: block_until_ready does not
    i += chunk                 # reliably block through the axon relay

    chunk_imgs = []
    while i + chunk <= len(frames) and len(chunk_imgs) < chunks_timed:
        chunk_imgs.append(mk(i))
        i += chunk

    per_round = []
    tracked = total = 0
    for r in range(rounds):
        st = state
        t0 = time.perf_counter()
        outs = []
        for imgs in chunk_imgs:
            st, ys = track_chunk(cam, cfg, st, imgs, active)
            outs.append(ys)
        np.asarray(outs[-1]["summary"])  # readback = real synchronization
        dt = time.perf_counter() - t0
        n = chunk * len(chunk_imgs)
        per_round.append(n / dt)
        for ys in outs:
            s = np.asarray(ys["summary"])
            tracked += int(s[:, 3].sum())
            total += len(s)
        # Refresh inputs so no round re-submits an already-seen
        # executable+input pair (relay memoization).
        chunk_imgs = [im + np.float32(1e-6) for im in chunk_imgs]
    return {
        "tracked_fps": float(np.median(per_round)),
        "tracked_frac": tracked / max(total, 1),
        "frames_timed": total,
    }


def bench_frontend() -> dict:
    import os

    import jax.numpy as jnp

    from tinyslam_tpu.config import FrontendConfig

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((480, 640), np.float32))
              for _ in range(16)]
    warm = jnp.asarray(rng.random((480, 640), np.float32))

    out = {"pallas_fps": _measure_frontend(
        FrontendConfig(use_pallas=True), frames, warm)}
    # The pure-XLA reference path costs ~5 min of (uncached) compile for a
    # number that never headlines; opt in explicitly.
    if os.environ.get("TINYSLAM_BENCH_XLA_PATH", "0") == "1":
        out["xla_fps"] = _measure_frontend(
            FrontendConfig(use_pallas=False), frames, warm)
    return out


def _measure_frontend(cfg, frames, warm, rounds: int = 4):
    import jax
    import jax.numpy as jnp

    from tinyslam_tpu.frontend.orb import extract_features

    t = jnp.float32(cfg.threshold)
    f = jax.jit(lambda im, t: extract_features(im, t, cfg))
    np.asarray(f(warm, t).count)
    per_round = []
    n = len(frames)
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [f(im, t) for im in frames]
        np.asarray(outs[-1].count)  # readback = real synchronization
        per_round.append(n / (time.perf_counter() - t0))
        frames = [im + np.float32(1e-6) for im in frames]
    return float(np.median(per_round))


def main():
    from tinyslam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    tr = bench_tracked()
    ev = bench_tracked(eval_grade=True)
    fe = bench_frontend()
    fps = tr["tracked_fps"]
    line = {
        "metric": "tracked_frames_per_s_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 200.0, 3),
        "tracked_frac": round(tr["tracked_frac"], 3),
        # Same tracker on eval-grade rendering (distortion + photometric
        # effects + undistortion resampling): the honest-conditions row.
        "eval_grade_fps": round(ev["tracked_fps"], 1),
        "eval_grade_tracked_frac": round(ev["tracked_frac"], 3),
        "frontend_fps": round(fe["pallas_fps"], 1),
    }
    if "xla_fps" in fe:
        line["xla_path_fps"] = round(fe["xla_fps"], 1)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
