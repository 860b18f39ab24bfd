"""Headline benchmark — run on real TPU by the driver after every round.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current headline: ORB front-end frames/s on one chip (BASELINE config 1,
640x480, 4 pyramid levels, 2048 features).  The BASELINE.json north-star
floor is 200 tracked frames/s/chip; vs_baseline = value / 200.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_frontend(repeats: int = 50, warmup: int = 3) -> float:
    import jax
    import jax.numpy as jnp

    from tinyslam_tpu.config import FrontendConfig
    from tinyslam_tpu.frontend.orb import extract_features

    cfg = FrontendConfig(height=480, width=640, num_levels=4, features_per_level=512)

    @jax.jit
    def fn(image, threshold):
        return extract_features(image, threshold, cfg)

    rng = np.random.default_rng(0)
    # A realistic frame: smooth background + texture so FAST actually fires.
    base = rng.random((480, 640)).astype(np.float32)
    image = jnp.asarray(base)
    threshold = jnp.float32(cfg.threshold)

    feats = fn(image, threshold)
    jax.block_until_ready(feats)
    for _ in range(warmup):
        jax.block_until_ready(fn(image, threshold))

    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(image, threshold)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return repeats / dt


def main():
    fps = bench_frontend()
    print(json.dumps({
        "metric": "frontend_frames_per_s_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 200.0, 3),
    }))


if __name__ == "__main__":
    main()
