"""Full SLAM: visual odometry + place recognition + pose-graph loop closure
(BASELINE config 5).

Loop closure is scale-consistent without Sim3 machinery: a loop candidate's
relative pose is measured by PnP-ing the OLD keyframe's stored features
against the CURRENT map (whose scale is the map's own), not by a
unit-baseline two-view solve.  After pose-graph optimization, landmarks are
re-anchored: each landmark moves rigidly with the keyframe that created it
(X' = T_anchor_new^-1 T_anchor_old X).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tinyslam_tpu.config import SlamConfig
from tinyslam_tpu.geometry.camera import PinholeCamera
from tinyslam_tpu.geometry.pnp import pnp_refine
from tinyslam_tpu.geometry.se3 import se3_apply, se3_compose, se3_inverse
from tinyslam_tpu.models.vo import VisualOdometry, _match_to_map
from tinyslam_tpu.ops.hamming import match_descriptors
from tinyslam_tpu.types import Features, descriptor_signs


@jax.jit
def _kf_signature(feats: Features) -> jax.Array:
    """Cheap global descriptor: mean of valid BRIEF sign vectors (256,).
    A poor-man's bag-of-words prefilter for place recognition."""
    signs = descriptor_signs(feats.desc).astype(jnp.float32)
    w = feats.valid.astype(jnp.float32)[:, None]
    return jnp.sum(signs * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)


@jax.jit
def _reanchor_landmarks(X, anchor_kf, valid, R_old, t_old, R_new, t_new):
    """Move landmarks rigidly with their anchor keyframe's correction.
    R_old/t_old/R_new/t_new: (KF_total, 3, 3) / (KF_total, 3) pose tables."""
    a = jnp.clip(anchor_kf, 0, R_old.shape[0] - 1)
    Ro, to = R_old[a], t_old[a]                       # (M, 3, 3), (M, 3)
    Rn, tn = R_new[a], t_new[a]
    # camera-frame coords under old pose, re-expressed via new pose:
    Xc = jnp.einsum("mij,mj->mi", Ro, X) + to
    Rni = jnp.swapaxes(Rn, -1, -2)
    Xw = jnp.einsum("mij,mj->mi", Rni, Xc - tn)
    return jnp.where(valid[:, None], Xw, X)


class Slam:
    """VO + loop closure.  Use exactly like VisualOdometry.

    With ``async_backend=True`` the pose-graph solve runs on a worker
    thread (parallel/pipeline.py, the PP analog of SURVEY §2d): tracking
    never blocks on global optimization; the correction is applied at the
    first frame boundary after the solve finishes.  Call ``finalize()``
    (or ``run()``, which does) to flush a pending solve at sequence end.
    """

    def __init__(self, cfg: SlamConfig, camera: PinholeCamera,
                 async_backend: bool = False,
                 solve_timeout_s: float = 30.0, **vo_kwargs):
        self.cfg = cfg
        self.camera = camera
        self.vo = VisualOdometry(cfg, camera, **vo_kwargs)
        self.kf_store: list[Features] = []       # per-KF features
        self.kf_signatures: list[np.ndarray] = []
        self.kf_R: list[np.ndarray] = []         # running best pose per KF
        self.kf_t: list[np.ndarray] = []
        self.edges: list[tuple[int, int, np.ndarray, np.ndarray, float]] = []
        self.num_loop_closures = 0
        self._worker = None
        if async_backend:
            # Supervised worker (utils/faults.Watchdog): a crashed or hung
            # pose-graph solve is detected at the next frame boundary and the
            # worker is rebuilt + the solve resubmitted — tracking never
            # blocks on (or dies with) the back-end.
            from tinyslam_tpu.utils.faults import Watchdog

            self._worker = Watchdog(solve_timeout_s=solve_timeout_s)

    # ------------- keyframe bookkeeping -------------
    def _sync_new_keyframes(self):
        """Pull keyframes created by the VO layer since the last call."""
        while len(self.kf_store) < self.vo.num_keyframes:
            kf_id = len(self.kf_store)
            # The VO logs (kf_id, R, t) in order; features: newest == vo.kf_feats
            # for the latest, otherwise reconstruct from the log only.
            _, R, t = self.vo.kf_poses_log[kf_id]
            self.kf_R.append(R)
            self.kf_t.append(t)
            if kf_id == self.vo.num_keyframes - 1 and self.vo.kf_feats is not None:
                feats = self.vo.kf_feats
            elif kf_id == 0 and self.vo.kf0_feats is not None:
                feats = self.vo.kf0_feats
            else:
                feats = self.vo.kf_feats
            self.kf_store.append(feats)
            self.kf_signatures.append(np.asarray(_kf_signature(feats)))
            if kf_id > 0:
                # Odometry edge from previous KF.
                Rp, tp = self.kf_R[kf_id - 1], self.kf_t[kf_id - 1]
                Ri, ti = se3_inverse(jnp.asarray(Rp), jnp.asarray(tp))
                Re, te = se3_compose(jnp.asarray(R), jnp.asarray(t), Ri, ti)
                self.edges.append((kf_id - 1, kf_id, np.asarray(Re), np.asarray(te), 1.0))
                self._detect_loop(kf_id)

    # ------------- loop closure -------------
    def _detect_loop(self, kf_id: int):
        pg = self.cfg.pose_graph
        if kf_id < pg.loop_min_gap:
            return
        sig = self.kf_signatures[kf_id]
        old_ids = np.arange(0, kf_id - pg.loop_min_gap + 1)
        if len(old_ids) == 0:
            return
        sims = np.array([sig @ self.kf_signatures[i] for i in old_ids])
        cand = old_ids[np.argsort(-sims)[:2]]
        cur = self.kf_store[kf_id]
        for old in cand:
            old_feats = self.kf_store[int(old)]
            m = match_descriptors(
                cur.desc, cur.valid, old_feats.desc, old_feats.valid,
                max_distance=self.cfg.matcher.max_distance,
                ratio=self.cfg.matcher.ratio, cross_check=True,
            )
            if int(jnp.sum(m["valid"])) < pg.loop_min_matches:
                continue
            # Scale-consistent verification: PnP the old KF against the map.
            idx, mvalid = _match_to_map(
                old_feats, self.vo.map,
                self.cfg.matcher.max_distance, self.cfg.matcher.ratio,
            )
            out = pnp_refine(
                self.camera, self.vo.map.X[idx], old_feats.xy, mvalid,
                jnp.asarray(self.kf_R[int(old)]), jnp.asarray(self.kf_t[int(old)]),
                iters=self.cfg.vo.pnp_iters,
                inlier_px=self.cfg.vo.pnp_inlier_px,
            )
            n_in = int(out["num_inliers"])
            n_cand = max(int(jnp.sum(mvalid)), 1)
            if (n_in < pg.loop_min_matches
                    or n_in / n_cand < pg.loop_min_inlier_ratio
                    or not np.isfinite(float(out["rmse"]))
                    or float(out["rmse"]) > pg.loop_max_rmse_px):
                continue
            # Edge old -> new measured through the map: T_edge = T_new o T_old'^-1
            Ri, ti = se3_inverse(out["R"], out["t"])
            Re, te = se3_compose(
                jnp.asarray(self.kf_R[kf_id]), jnp.asarray(self.kf_t[kf_id]), Ri, ti
            )
            self.edges.append((int(old), kf_id, np.asarray(Re), np.asarray(te), 5.0))
            self.num_loop_closures += 1
            self._optimize_graph()
            return

    def _optimize_graph(self):
        n = len(self.kf_R)
        if n < 3 or not self.edges:
            return
        snap = (np.stack(self.kf_R), np.stack(self.kf_t), list(self.edges))
        if self._worker is not None:
            # Latest-wins: a newer snapshot contains every edge of an older
            # one, so superseding a not-yet-started solve loses nothing.
            self._worker.submit(lambda: (snap, self._solve_graph(snap)))
        else:
            self._apply_graph_result(snap, self._solve_graph(snap))

    def _solve_graph(self, snap):
        """Device compute only — safe on the worker thread."""
        from tinyslam_tpu.backend.pose_graph import optimize_pose_graph

        R_old, t_old, edges = snap
        ei = np.array([e[0] for e in edges], np.int32)
        ej = np.array([e[1] for e in edges], np.int32)
        eR = np.stack([e[2] for e in edges])
        et = np.stack([e[3] for e in edges])
        ew = np.array([e[4] for e in edges], np.float32)
        out = optimize_pose_graph(
            jnp.asarray(R_old), jnp.asarray(t_old),
            jnp.asarray(ei), jnp.asarray(ej),
            jnp.asarray(eR), jnp.asarray(et),
            jnp.asarray(np.ones(len(ei), bool)), jnp.asarray(ew),
            iters=self.cfg.pose_graph.gn_iters,
        )
        return np.asarray(out["R"]), np.asarray(out["t"])

    def _apply_graph_result(self, snap, solved):
        R_old, t_old, _ = snap
        R_new, t_new = solved
        n = len(R_old)
        total = len(self.kf_R)
        if total > n:
            # Keyframes created while the solve ran: carry them (and the
            # landmarks they anchor) by the newest snapshot node's
            # correction, exactly as the live pose is corrected below.
            cR, ct = se3_compose(
                jnp.asarray(R_new[n - 1]), jnp.asarray(t_new[n - 1]),
                *se3_inverse(jnp.asarray(R_old[n - 1]), jnp.asarray(t_old[n - 1])),
            )
            ext_old_R = np.stack(self.kf_R[n:])
            ext_old_t = np.stack(self.kf_t[n:])
            ext_new = [
                se3_compose(cR, ct, jnp.asarray(r), jnp.asarray(tt))
                for r, tt in zip(ext_old_R, ext_old_t)
            ]
            R_old = np.concatenate([R_old, ext_old_R])
            t_old = np.concatenate([t_old, ext_old_t])
            R_new = np.concatenate([R_new, np.stack([np.asarray(e[0]) for e in ext_new])])
            t_new = np.concatenate([t_new, np.stack([np.asarray(e[1]) for e in ext_new])])
            n = total
        # Re-anchor landmarks with their keyframe corrections.
        self.vo.map = self.vo.map.replace(
            X=_reanchor_landmarks(
                self.vo.map.X, self.vo.map.anchor_kf, self.vo.map.valid,
                jnp.asarray(R_old), jnp.asarray(t_old),
                jnp.asarray(R_new), jnp.asarray(t_new),
            )
        )
        # Update stored keyframe poses + the VO window + current pose.
        for i in range(n):
            self.kf_R[i] = R_new[i]
            self.kf_t[i] = t_new[i]
        for slot in range(len(self.vo.win_valid)):
            if self.vo.win_valid[slot]:
                kf_id = int(self.vo.win_kf_id[slot])
                if 0 <= kf_id < n:
                    self.vo.win_R = self.vo.win_R.at[slot].set(jnp.asarray(R_new[kf_id]))
                    self.vo.win_t = self.vo.win_t.at[slot].set(jnp.asarray(t_new[kf_id]))
        # Correct the live pose by the newest KF's correction.
        newest = n - 1
        corr_R, corr_t = se3_compose(
            jnp.asarray(R_new[newest]), jnp.asarray(t_new[newest]),
            *se3_inverse(jnp.asarray(R_old[newest]), jnp.asarray(t_old[newest])),
        )
        self.vo.R, self.vo.t = se3_compose(corr_R, corr_t, self.vo.R, self.vo.t)
        self.vo.kf_pose = (
            jnp.asarray(R_new[int(self.vo.win_kf_id[self._newest_slot()])]),
            jnp.asarray(t_new[int(self.vo.win_kf_id[self._newest_slot()])]),
        ) if self._newest_slot() is not None else self.vo.kf_pose

    def _newest_slot(self):
        nz = np.nonzero(self.vo.win_valid)[0]
        return int(nz.max()) if len(nz) else None

    # ------------- public API -------------
    def process(self, image):
        st = self.process_frame(image)
        return st

    def process_frame(self, image):
        st = self.vo.process(image)
        # Keep Slam's per-KF pose log in sync with BA-refined window poses.
        self._sync_new_keyframes()
        self._refresh_window_poses()
        if self._worker is not None:
            res = self._worker.poll()
            if res is not None:
                self._apply_graph_result(*res)
        return st

    def finalize(self):
        """Apply any in-flight pose-graph solve (async mode); idempotent."""
        if self._worker is not None:
            res = self._worker.flush()
            if res is not None:
                self._apply_graph_result(*res)

    def close(self):
        if self._worker is not None:
            self._worker.close()
            self._worker = None

    def _refresh_window_poses(self):
        for slot in range(len(self.vo.win_valid)):
            if self.vo.win_valid[slot]:
                kf_id = int(self.vo.win_kf_id[slot])
                if 0 <= kf_id < len(self.kf_R):
                    self.kf_R[kf_id] = np.asarray(self.vo.win_R[slot])
                    self.kf_t[kf_id] = np.asarray(self.vo.win_t[slot])

    def run(self, images):
        out = [self.process_frame(im) for im in images]
        self.finalize()
        return out

    @property
    def positions(self) -> np.ndarray:
        return self.vo.positions

    @property
    def trajectory(self):
        return self.vo.trajectory


class DeviceSlam(Slam):
    """Slam over the device-resident chunked tracker (models/vo_device.py).

    The host-driven Slam makes ~12 device->host readbacks per frame; this
    variant tracks in ``lax.scan`` chunks (one dispatch + one readback per
    CHUNK) and runs the loop-closure layer at chunk boundaries:

    - after each chunk the new keyframes are pulled from the device window
      (``VOState.win_feats`` — their features live there, BA-refined poses
      included; the host Slam's `kf_feats`-fallback fragility is gone);
    - place recognition + pose-graph optimization run on the host/worker as
      in Slam (they are per-KEYFRAME, latency-tolerant work — the PP-analog
      split of SURVEY §2d);
    - corrections are applied functionally to the device state between
      chunks (landmark re-anchoring, window poses, live pose).

    Keyframe features are recovered from the window by kf_id; a keyframe
    that rolled out of the window within a single chunk (pathological
    keyframe churn) degrades gracefully: its pose comes from the tracked
    trajectory and its features are empty (it can seed no loop closures).
    """

    def __init__(self, cfg: SlamConfig, camera: PinholeCamera,
                 chunk: int = 16, async_backend: bool = False,
                 solve_timeout_s: float = 30.0):
        super().__init__(cfg, camera, async_backend=async_backend,
                         solve_timeout_s=solve_timeout_s)
        from tinyslam_tpu.models.vo_device import DeviceVO

        self.vo = DeviceVO(cfg, camera, chunk=chunk)
        self._synced_stats = 0          # stats entries scanned for keyframes
        self._kf_frame: dict[int, int] = {}   # kf_id -> frame index fallback

    # ------------- keyframe sync (chunk granularity) -------------
    def process_frame(self, image):
        vo = self.vo
        was_init = vo.state is not None
        pending_before = len(vo._pending)
        vo.process(image)
        if vo.state is not None and not was_init:
            self._sync_bootstrap()
        elif len(vo._pending) > pending_before:
            self._sync_chunk()
        return vo.stats[-1] if vo.stats else None

    def _append_keyframe(self, kf_id: int, R, t, feats: Features):
        assert kf_id == len(self.kf_store)
        self.kf_R.append(np.asarray(R))
        self.kf_t.append(np.asarray(t))
        self.kf_store.append(feats)
        self.kf_signatures.append(np.asarray(_kf_signature(feats)))
        if kf_id > 0:
            Rp, tp = self.kf_R[kf_id - 1], self.kf_t[kf_id - 1]
            Ri, ti = se3_inverse(jnp.asarray(Rp), jnp.asarray(tp))
            Re, te = se3_compose(jnp.asarray(R), jnp.asarray(t), Ri, ti)
            self.edges.append(
                (kf_id - 1, kf_id, np.asarray(Re), np.asarray(te), 1.0))
            self._detect_loop(kf_id)

    def _sync_bootstrap(self):
        """Bootstrap ran on the host tracker; pull its two keyframes."""
        h = self.vo._host
        for kf_id, R, t in h.kf_poses_log:
            feats = h.kf0_feats if kf_id == 0 else h.kf_feats
            self._append_keyframe(kf_id, R, t, feats)
        self._synced_stats = len(self.vo.stats)
        self._refresh_window_poses()

    def _sync_chunk(self):
        vo = self.vo
        vo.flush()                      # materialize pending summaries
        state = vo.state
        # Map device-phase keyframe stats to kf ids (pose fallback for
        # keyframes that rolled out of the window within one chunk).
        new_stats = vo.stats[self._synced_stats:]
        next_kf = (max(self._kf_frame) + 1) if self._kf_frame else len(
            self.kf_store)
        for i, s in enumerate(new_stats):
            if s.is_keyframe:
                self._kf_frame[next_kf] = self._synced_stats + i
                next_kf += 1
        self._synced_stats = len(vo.stats)

        total = int(state.num_keyframes)
        if total > len(self.kf_store):
            win_kf = np.asarray(state.win_kf_id)
            win_valid = np.asarray(state.win_valid)
            for kf_id in range(len(self.kf_store), total):
                slots = np.nonzero(win_valid & (win_kf == kf_id))[0]
                if len(slots):
                    slot = int(slots[0])
                    feats = jax.tree.map(lambda x: x[slot], state.win_feats)
                    R = np.asarray(state.win_R[slot])
                    t = np.asarray(state.win_t[slot])
                else:
                    feats = Features.empty(self.cfg.frontend.max_features)
                    frame = self._kf_frame.get(kf_id)
                    if frame is not None and frame < len(vo.trajectory):
                        R, t = vo.trajectory[frame]
                    else:
                        R, t = self.kf_R[-1], self.kf_t[-1]
                self._append_keyframe(kf_id, R, t, feats)
        self._refresh_window_poses()
        if self._worker is not None:
            res = self._worker.poll()
            if res is not None:
                self._apply_graph_result(*res)

    def _refresh_window_poses(self):
        state = self.vo.state
        if state is None:
            return
        win_valid = np.asarray(state.win_valid)
        win_kf = np.asarray(state.win_kf_id)
        win_R = np.asarray(state.win_R)
        win_t = np.asarray(state.win_t)
        for slot in range(len(win_valid)):
            kf_id = int(win_kf[slot])
            if win_valid[slot] and 0 <= kf_id < len(self.kf_R):
                self.kf_R[kf_id] = win_R[slot]
                self.kf_t[kf_id] = win_t[slot]

    # ------------- corrections into device state -------------
    def _apply_graph_result(self, snap, solved):
        state = self.vo.state
        if state is None:
            return
        R_old, t_old, _ = snap
        R_new, t_new = solved
        n = len(R_old)
        total = len(self.kf_R)
        if total > n:
            # Keyframes created while the solve ran: carry them by the
            # newest snapshot node's correction (same as the host Slam).
            cR, ct = se3_compose(
                jnp.asarray(R_new[n - 1]), jnp.asarray(t_new[n - 1]),
                *se3_inverse(jnp.asarray(R_old[n - 1]),
                             jnp.asarray(t_old[n - 1])),
            )
            ext_old_R = np.stack(self.kf_R[n:])
            ext_old_t = np.stack(self.kf_t[n:])
            ext_new = [
                se3_compose(cR, ct, jnp.asarray(r), jnp.asarray(tt))
                for r, tt in zip(ext_old_R, ext_old_t)
            ]
            R_old = np.concatenate([R_old, ext_old_R])
            t_old = np.concatenate([t_old, ext_old_t])
            R_new = np.concatenate(
                [R_new, np.stack([np.asarray(e[0]) for e in ext_new])])
            t_new = np.concatenate(
                [t_new, np.stack([np.asarray(e[1]) for e in ext_new])])
            n = total
        Ro, to_ = jnp.asarray(R_old), jnp.asarray(t_old)
        Rn, tn = jnp.asarray(R_new), jnp.asarray(t_new)
        new_X = _reanchor_landmarks(
            state.map.X, state.map.anchor_kf, state.map.valid, Ro, to_, Rn, tn)
        win_R, win_t = state.win_R, state.win_t
        win_valid = np.asarray(state.win_valid)
        win_kf = np.asarray(state.win_kf_id)
        for slot in range(len(win_valid)):
            kf_id = int(win_kf[slot])
            if win_valid[slot] and 0 <= kf_id < n:
                win_R = win_R.at[slot].set(Rn[kf_id])
                win_t = win_t.at[slot].set(tn[kf_id])
        corr_R, corr_t = se3_compose(
            Rn[n - 1], tn[n - 1], *se3_inverse(Ro[n - 1], to_[n - 1]))
        live_R, live_t = se3_compose(corr_R, corr_t, state.R, state.t)
        self.vo.state = state.replace(
            map=state.map.replace(X=new_X),
            win_R=win_R, win_t=win_t, R=live_R, t=live_t,
        )
        for i in range(n):
            self.kf_R[i] = np.asarray(R_new[i])
            self.kf_t[i] = np.asarray(t_new[i])

    def finalize(self):
        """Flush the tracker's partial chunk, sync stragglers, apply any
        in-flight pose-graph solve; idempotent."""
        if self.vo.state is not None:
            self._sync_chunk()
        else:
            self.vo.flush()
        super().finalize()
