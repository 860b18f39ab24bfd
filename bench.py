"""Headline benchmark — run on real TPU by the driver after every round.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current headline: ORB front-end frames/s on one chip (BASELINE config 1,
640x480, 4 pyramid levels, 2048 features).  The BASELINE.json north-star
floor is 200 tracked frames/s/chip; vs_baseline = value / 200.

Methodology notes:
- every timed call uses a DISTINCT input frame (the sandbox TPU relay
  memoizes identical executions, which silently inflates repeat-timing);
- a bounded async queue (depth = round size) with block_until_ready on all
  outputs per round; median round throughput reported;
- both the Pallas-fused and pure-XLA front-end paths are measured; the
  headline is the Pallas path (production path), xla_fps is the reference.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _measure(cfg, frames, warm, rounds: int = 4):
    import jax
    import jax.numpy as jnp

    from tinyslam_tpu.frontend.orb import extract_features

    t = jnp.float32(cfg.threshold)
    f = jax.jit(lambda im, t: extract_features(im, t, cfg))
    jax.block_until_ready(f(warm, t))
    per_round = []
    n = len(frames)
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [f(im, t) for im in frames]
        jax.block_until_ready(outs)
        per_round.append(n / (time.perf_counter() - t0))
        # refresh inputs so no round re-submits an already-seen executable+input
        frames = [im + np.float32(1e-6) for im in frames]
    return float(np.median(per_round))


def bench_frontend() -> dict:
    import os

    import jax.numpy as jnp

    from tinyslam_tpu.config import FrontendConfig

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((480, 640), np.float32)) for _ in range(16)]
    warm = jnp.asarray(rng.random((480, 640), np.float32))

    out = {"pallas_fps": _measure(FrontendConfig(use_pallas=True), frames, warm)}
    # The pure-XLA reference path costs ~5 min of (uncached) compile for a
    # number that never headlines; opt in explicitly.
    if os.environ.get("TINYSLAM_BENCH_XLA_PATH", "0") == "1":
        out["xla_fps"] = _measure(FrontendConfig(use_pallas=False), frames, warm)
    return out


def main():
    r = bench_frontend()
    fps = r["pallas_fps"]
    line = {
        "metric": "frontend_frames_per_s_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 200.0, 3),
    }
    if "xla_fps" in r:
        line["xla_path_fps"] = round(r["xla_fps"], 1)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
