"""Per-stage timing of the device tracker on the real chip.

Decomposes track_step's ~per-frame cost into its pipeline stages, each
timed as its own jitted dispatch over DISTINCT inputs (the sandbox relay
memoizes identical executions).  Also reports bytes/FLOPs rooflines for
the hot kernels (PROFILE artifact input).

    python tools/profile_stages.py [--out PROFILE.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, inputs, n=8):
    """Per-call seconds of fn, relay-robust (same dispatch-slope+readback
    methodology as tools/profile_roofline.py and bench.py — through the
    axon relay, jax.block_until_ready is NOT a reliable barrier and a
    synchronized call costs a ~25 ms round trip; see utils/profiling)."""
    from tinyslam_tpu.utils.profiling import dispatch_slope

    return dispatch_slope(fn, inputs, reps=max(n, 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _render_room_sequence
    from tinyslam_tpu.config import SlamConfig
    from tinyslam_tpu.frontend.orb import extract_features
    from tinyslam_tpu.models.vo import _match_to_map, _track_pnp
    from tinyslam_tpu.models.vo_device import DeviceVO, track_chunk, track_step
    from tinyslam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = SlamConfig()
    cam, frames = _render_room_sequence(40)

    # Bootstrap to get a realistic mid-sequence VOState.
    vo = DeviceVO(cfg, cam, chunk=8)
    i = 0
    while not vo.initialized and i < len(frames):
        vo.process(jnp.asarray(frames[i]))
        i += 1
    assert vo.initialized
    # Run a couple of chunks so the map fills out.
    for j in range(i, min(i + 16, len(frames))):
        vo.process(jnp.asarray(frames[j]))
    vo.flush()
    state = vo.state
    n_land = int(jnp.sum(state.map.valid))
    imgs = [jnp.asarray(f) + np.float32(1e-6 * k)
            for k, f in enumerate(frames[-12:])]

    results = {"num_landmarks": n_land,
               "map_capacity": cfg.vo.max_map_points,
               "feature_capacity": cfg.frontend.max_features}

    # --- stage timings ---
    fe = jax.jit(lambda im: extract_features(im, state.threshold, cfg.frontend))
    results["extract_ms"] = timeit(fe, [(im,) for im in imgs]) * 1e3

    feats0 = fe(imgs[0])

    # --- extract sub-stage breakdown (VERDICT r4 #7: which term owns the
    # 1.6 ms — the fused Pallas score kernel is only ~0.25 ms of it) ---
    if jax.default_backend() == "tpu":
        from tinyslam_tpu.ops import select_topk
        from tinyslam_tpu.ops.brief import brief_descriptors_binned
        from tinyslam_tpu.ops.fast_pallas import fast_score_map_fused
        from tinyslam_tpu.ops.image import downsample2x, gaussian_kernel

        fc = cfg.frontend
        taps = tuple(float(v) for v in gaussian_kernel(fc.blur_sigma))

        def pyramid_fn(im):
            levels = [im]
            for _ in range(1, fc.num_levels):
                levels.append(downsample2x(levels[-1]))
            return levels

        pyr_jit = jax.jit(pyramid_fn)
        results["x_pyramid_ms"] = timeit(
            pyr_jit, [(im,) for im in imgs]) * 1e3

        def score_all(im):
            outs = []
            for lvl in pyramid_fn(im):
                outs.append(fast_score_map_fused(
                    lvl, state.threshold, fc.border, fc.streak_length,
                    blur_taps=taps))
            return outs

        score_jit = jax.jit(score_all)
        results["x_score_ms"] = timeit(
            score_jit, [(im,) for im in imgs]) * 1e3

        outs0 = jax.block_until_ready(score_jit(imgs[0]))

        def topk_all(outs):
            return [select_topk(o[1], o[0], o[2], o[3],
                                fc.features_per_level) for o in outs]

        topk_jit = jax.jit(topk_all)
        outs_list = [jax.block_until_ready(score_jit(im)) for im in imgs[:6]]
        results["x_topk_ms"] = timeit(
            topk_jit, [(o,) for o in outs_list]) * 1e3

        sels0 = jax.block_until_ready(topk_jit(outs0))

        def brief_all(outs, sels):
            return [
                brief_descriptors_binned(
                    o[4], s["xy"], s["angle"], s["valid"], bins=fc.brief_bins)
                for o, s in zip(outs, sels)]

        brief_jit = jax.jit(brief_all)
        results["x_brief_ms"] = timeit(
            brief_jit, [(o, sels0) for o in outs_list]) * 1e3

    match = jax.jit(lambda f, R, t: _match_to_map(
        f, state.map, cfg.matcher.max_distance, cfg.matcher.ratio,
        cam=cam, R=R, t=t))
    feats_list = [fe(im) for im in imgs]
    jax.block_until_ready(feats_list)
    results["match_guided_ms"] = timeit(
        match, [(f, state.R, state.t) for f in feats_list]) * 1e3

    idx, mvalid = match(feats0, state.R, state.t)
    pnp = jax.jit(lambda f, idx, mv: _track_pnp(
        cam, f, state.map, idx, mv, state.R, state.t,
        iters=cfg.vo.pnp_iters, inlier_px=cfg.vo.pnp_inlier_px))
    results["pnp_ms"] = timeit(
        pnp, [(f, idx, mvalid) for f in feats_list]) * 1e3

    from tinyslam_tpu.backend.ba import bundle_adjust

    def ba_fn(win_R, win_t, X, z, mask, pose_free, pvalid):
        return bundle_adjust(
            cam, win_R, win_t, X, z, mask, pose_free, point_valid=pvalid,
            max_iters=cfg.ba.max_iters, huber=cfg.ba.huber_delta,
            lam0=cfg.ba.damping_init, lam_up=cfg.ba.damping_up,
            lam_down=cfg.ba.damping_down)

    K = cfg.ba.max_keyframes
    pose_free = state.win_valid & (jnp.arange(K) >= 2)
    z = jnp.swapaxes(state.win_obs, 0, 1)
    mask = jnp.swapaxes(state.win_mask, 0, 1) & state.win_valid[None, :]
    multi = jnp.sum(mask.astype(jnp.int32), axis=1) >= 2
    pvalid = state.map.valid & multi
    ba_jit = jax.jit(ba_fn)
    ba_inputs = [
        (state.win_R, state.win_t + np.float32(1e-6 * k), state.map.X,
         z, mask, pose_free, pvalid)
        for k in range(4)
    ]
    results["window_ba_ms"] = timeit(ba_jit, ba_inputs, n=6) * 1e3

    step = jax.jit(lambda s, im: track_step(cam, cfg, s, im))
    results["track_step_ms"] = timeit(
        step, [(state, im) for im in imgs]) * 1e3

    chunk = 16
    active = jnp.ones((chunk,), bool)
    ch_inputs = []
    for k in range(3):
        ims = jnp.stack([np.asarray(im) for im in (imgs * 2)[:chunk]])
        ch_inputs.append((state, ims + np.float32(1e-6 * k), active))
    tc = lambda s, ims, a: track_chunk(cam, cfg, s, ims, a)
    t_chunk = timeit(tc, ch_inputs, n=4)
    results["track_chunk_ms"] = t_chunk * 1e3
    results["track_chunk_ms_per_frame"] = t_chunk / chunk * 1e3

    for k, v in results.items():
        if k.endswith("_ms") or k.endswith("frame"):
            print(f"{k:28s} {v:8.2f} ms")
        else:
            print(f"{k:28s} {v}")
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
