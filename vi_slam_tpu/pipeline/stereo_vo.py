"""Stereo visual odometry pipeline: the host state machine over jitted steps.

Semantic reference: `Tracking::Track` and friends
(`/root/reference/src/core/tracking.cpp:1661` — state machine,
`StereoInitialization` :2167, `TrackWithMotionModel` :2696,
`TrackLocalMap` :2791, `NeedNewKeyFrame` :2925, `CreateNewKeyFrame` :3063)
plus the LocalMapping duties run synchronously per keyframe
(`localmapping.cpp:50-260`: point creation, local BA).

TPU design: all numerics (projection, matching, pose GN, BA) run as jitted
static-shape device programs; the host only sequences them and keeps
scalar bookkeeping (slot counters, state machine). The reference's
tracking/mapping thread pair becomes a synchronous call today; JAX async
dispatch already overlaps the BA with the next frame's host work.

Trajectory bookkeeping follows the reference: each frame stores its pose
relative to its reference keyframe, so BA corrections propagate to the
final trajectory (`System::SaveTrajectoryKITTI` system.cpp:645 semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.cameras import pinhole
from vi_slam_tpu.features.extractor import Features, OrbExtractor
from vi_slam_tpu.lie import se3
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.ops import match as match_ops
from vi_slam_tpu.ops import pyramid as pyr_ops
from vi_slam_tpu.ops import stereo as stereo_ops
from vi_slam_tpu.optim import local_ba as ba
from vi_slam_tpu.optim import pose_opt
from vi_slam_tpu.pipeline import steps
from vi_slam_tpu.slam_map import state as map_state
from vi_slam_tpu.utils.config import SystemConfig
from vi_slam_tpu.utils.timing import StageTimer

NOT_INITIALIZED = "NOT_INITIALIZED"
OK = "OK"
LOST = "LOST"


@dataclass
class FrameRecord:
    frame_id: int
    timestamp: float
    ref_kf: int
    T_rel: np.ndarray  # (4,4) Tcw_frame @ Twc_refkf  (camera-from-refKF)
    state: str


@dataclass
class TrackStats:
    n_matches: int = 0
    n_inliers: int = 0
    n_local_points: int = 0
    n_kfs: int = 0
    n_mps: int = 0


class StereoVO:
    """Single-process stereo VO over the array map."""

    def __init__(self, cfg: SystemConfig, timer: Optional[StageTimer] = None):
        self.cfg = cfg
        c = cfg.camera
        self.cam = CameraParams.make(c.fx, c.fy, c.cx, c.cy, bf=c.bf)
        self.baseline = c.bf / c.fx
        self.close_depth = cfg.camera.th_depth * self.baseline
        self.extractor = OrbExtractor(cfg.extractor, c.height, c.width)
        self.timer = timer or StageTimer(enabled=False)

        m = cfg.map
        self.map = map_state.allocate(
            m.max_keyframes, cfg.extractor.n_features, m.max_points,
            m.max_obs_per_point,
        )
        self.n_kf = 0
        self.n_mp = 0
        self.state = NOT_INITIALIZED
        self.T_cw = SE3.identity()
        self.velocity = SE3.identity()  # T_cw(t) @ T_wc(t-1)
        self.ref_kf = -1
        self.frames_since_kf = 0
        self.frame_id = -1
        self.records: List[FrameRecord] = []
        self.stats: List[TrackStats] = []
        self.level_scales = jnp.asarray(
            pyr_ops.scale_factors(cfg.extractor.n_levels, cfg.extractor.scale_factor)
        )
        self._ref_kf_tracked = 0

    # ------------------------------------------------------------------ API

    def process_stereo(self, img_left, img_right, timestamp: float) -> TrackStats:
        """Full image path: extract ORB on both images, associate stereo,
        then track (GrabImageStereo semantics, tracking.cpp:1229)."""
        cfg = self.cfg
        with self.timer.stage("extract"):
            featsL = self.extractor(jnp.asarray(img_left, jnp.float32))
            featsR = self.extractor(jnp.asarray(img_right, jnp.float32))
            self._sync(featsL.desc, featsR.desc)
        with self.timer.stage("stereo_match"):
            pyrL = pyr_ops.build_pyramid(
                jnp.asarray(img_left, jnp.float32),
                cfg.extractor.n_levels, cfg.extractor.scale_factor,
            )
            pyrR = pyr_ops.build_pyramid(
                jnp.asarray(img_right, jnp.float32),
                cfg.extractor.n_levels, cfg.extractor.scale_factor,
            )
            sm = stereo_ops.match_stereo(
                featsL, featsR, pyrL, pyrR, self.level_scales,
                self.cam.bf, max_disp=float(self.cam.bf / 0.5),
            )
            self._sync(sm.depth)
        uright = jnp.where(sm.ok, sm.u_right, -1.0)
        depth = jnp.where(sm.ok, sm.depth, -1.0)
        return self.track(featsL, uright, depth, timestamp)

    def process_oracle(self, xy, uright, depth, desc, level, timestamp: float) -> TrackStats:
        """Oracle-feature path (tests/benchmarks without the image frontend):
        provide keypoints, stereo u_right, depth, descriptors directly."""
        n = self.cfg.extractor.n_features
        v = np.zeros((n,), bool)
        cnt = min(len(xy), n)
        v[:cnt] = True

        def pad(a, shape, fill=0.0, dtype=np.float32):
            out = np.full(shape, fill, dtype)
            out[:cnt] = a[:cnt]
            return out

        feats = Features(
            xy=jnp.asarray(pad(xy, (n, 2))),
            level=jnp.asarray(pad(level, (n,), 0, np.int32)),
            angle=jnp.zeros((n,), jnp.float32),
            score=jnp.asarray(pad(np.ones(cnt), (n,))),
            desc=jnp.asarray(pad(desc, (n, 8), 0, np.uint32)),
            valid=jnp.asarray(v),
        )
        ur = jnp.asarray(pad(uright, (n,), -1.0))
        dp = jnp.asarray(pad(depth, (n,), -1.0))
        return self.track(feats, ur, dp, timestamp)

    # ------------------------------------------------------------- tracking

    def track(self, feats: Features, uright, depth, timestamp: float) -> TrackStats:
        self.frame_id += 1
        st = TrackStats()
        if self.state == NOT_INITIALIZED:
            ok = self._initialize(feats, uright, depth, timestamp)
            st.n_kfs, st.n_mps = self.n_kf, self.n_mp
            self._record(timestamp, LOST if not ok else OK)
            return st

        # --- pose prediction + local-map tracking ---
        T_pred = self.velocity.compose(self.T_cw)
        recent = self._recent_kf_slots(self.cfg.ba.max_local_kfs)
        with self.timer.stage("local_points"):
            mp_ids, mp_mask = steps.gather_local_points(
                self.map, recent, self.cfg.ba.max_local_points
            )
            self._sync(mp_ids)
        with self.timer.stage("project_match"):
            proj = steps.project_local_points(
                self.cam, self.map, mp_ids, mp_mask, T_pred,
                self.cfg.camera.width, self.cfg.camera.height,
                n_levels=self.cfg.extractor.n_levels,
                scale_factor=self.cfg.extractor.scale_factor,
            )
            m = match_ops.search_by_projection(
                proj.uv, proj.level, proj.desc, proj.valid,
                feats.xy, feats.level, feats.desc, feats.valid,
                radius=self.cfg.tracker.search_radius,
                level_scales=self.level_scales,
                max_dist=self.cfg.matcher.th_high,
                ratio=self.cfg.matcher.nn_ratio,
            )
            m = match_ops.resolve_duplicate_targets(m, feats.xy.shape[0])
            self._sync(m.idx)
        with self.timer.stage("pose_opt"):
            obs, kp_idx = steps.build_pose_obs(proj, m, feats, uright)
            T_opt, inlier, n_in = pose_opt.pose_optimize(
                self.cam, T_pred, obs,
                rounds=self.cfg.ba.pose_rounds,
                iters=self.cfg.ba.pose_iters_per_round,
            )
            self._sync(n_in)
        n_in = int(n_in)
        n_matches = int(jnp.sum(m.ok & proj.valid))
        st.n_matches = n_matches
        st.n_inliers = n_in
        st.n_local_points = int(jnp.sum(mp_mask))

        if n_in < self.cfg.tracker.min_matches_motion:
            # retry from last pose with a wider window (reference fallback
            # ladder: reloc comes later; here widen once, else LOST)
            m2 = match_ops.search_by_projection(
                proj.uv, proj.level, proj.desc, proj.valid,
                feats.xy, feats.level, feats.desc, feats.valid,
                radius=3.0 * self.cfg.tracker.search_radius,
                level_scales=self.level_scales,
                max_dist=self.cfg.matcher.th_high,
                ratio=self.cfg.matcher.nn_ratio,
            )
            m2 = match_ops.resolve_duplicate_targets(m2, feats.xy.shape[0])
            obs, kp_idx = steps.build_pose_obs(proj, m2, feats, uright)
            T_opt, inlier, n_in_w = pose_opt.pose_optimize(
                self.cam, self.T_cw, obs,
                rounds=self.cfg.ba.pose_rounds,
                iters=self.cfg.ba.pose_iters_per_round,
            )
            n_in = int(n_in_w)
            m = m2
            st.n_inliers = n_in
            if n_in < max(self.cfg.tracker.min_matches_motion // 2, 10):
                self.state = LOST
                self._record(timestamp, LOST)
                st.n_kfs, st.n_mps = self.n_kf, self.n_mp
                return st

        # accept
        T_last = self.T_cw
        self.T_cw = T_opt
        self.velocity = T_opt.compose(T_last.inverse())
        self.state = OK
        self.frames_since_kf += 1

        # --- keyframe decision ---
        matched_mp_per_kp = steps.scatter_matches_to_kps(
            feats.xy.shape[0], kp_idx,
            jnp.where(mp_ids >= 0, mp_ids, -1), m.ok & proj.valid & inlier,
        )
        if self._need_keyframe(feats, depth, matched_mp_per_kp, n_in):
            with self.timer.stage("keyframe"):
                self._create_keyframe(
                    feats, uright, depth, matched_mp_per_kp, timestamp
                )
                self._sync(self.map.mp_pos)
            with self.timer.stage("local_ba"):
                self._local_ba()
                self._sync(self.map.kf_t)
            self.frames_since_kf = 0
            self._ref_kf_tracked = n_in

        self._record(timestamp, OK)
        st.n_kfs, st.n_mps = self.n_kf, self.n_mp
        return st

    # ------------------------------------------------------------- helpers

    def _sync(self, *xs):
        if self.timer.enabled:
            jax.block_until_ready(xs)

    def _recent_kf_slots(self, w: int) -> jnp.ndarray:
        slots = np.full((w,), -1, np.int32)
        n = min(w, self.n_kf)
        if n > 0:
            slots[:n] = np.arange(self.n_kf - n, self.n_kf, dtype=np.int32)
        return jnp.asarray(slots)

    def _initialize(self, feats, uright, depth, timestamp) -> bool:
        """StereoInitialization (tracking.cpp:2167): create KF 0 + points
        for every stereo-valid keypoint."""
        good = np.asarray(feats.valid & (depth > 0))
        if good.sum() < 100:
            return False
        self.T_cw = SE3.identity()
        self._create_keyframe(
            feats, uright, depth,
            jnp.full((feats.xy.shape[0],), -1, jnp.int32), timestamp,
        )
        self.state = OK
        self._ref_kf_tracked = int(good.sum())
        return True

    def _need_keyframe(self, feats, depth, matched_mp, n_in) -> bool:
        """NeedNewKeyFrame (tracking.cpp:2925), stereo conditions."""
        if self.n_kf >= self.map.kf_R.shape[0] - 1:
            return False
        if self.frames_since_kf >= self.cfg.tracker.max_frames_between_kf:
            return True
        close = np.asarray(
            (depth > 0) & (depth < self.close_depth) & feats.valid
        )
        tracked_close = np.asarray(matched_mp >= 0) & close
        n_tracked_close = int(tracked_close.sum())
        n_creatable = int((close & ~np.asarray(matched_mp >= 0)).sum())
        need_close = n_tracked_close < 100 and n_creatable > 70
        weak = n_in < self.cfg.tracker.kf_ref_ratio * max(self._ref_kf_tracked, 1)
        return bool(need_close or weak)

    def _create_keyframe(self, feats, uright, depth, matched_mp, timestamp):
        """CreateNewKeyFrame (tracking.cpp:3063): insert KF, then create
        map points for close stereo keypoints without a match."""
        slot = self.n_kf
        self.n_kf += 1
        self.map = map_state.insert_keyframe(
            self.map, jnp.int32(slot), self.T_cw,
            jnp.int32(self.frame_id),
            jnp.asarray(timestamp, self.map.kf_timestamp.dtype),
            feats, uright, depth, matched_mp,
        )
        self.ref_kf = slot

        # candidate new points: close stereo, unmatched
        can = (
            np.asarray(feats.valid)
            & (np.asarray(depth) > 0)
            & (np.asarray(depth) < self.close_depth * 2.0)
            & (np.asarray(matched_mp) < 0)
        )
        per_kf_budget = 1024 if slot == 0 else 384
        n_cap = min(
            int(can.sum()), per_kf_budget,
            self.map.mp_pos.shape[0] - 1 - self.n_mp,
        )
        if n_cap <= 0:
            return
        # choose the closest candidates (reference keeps nearest 100+ pts)
        dvals = np.where(can, np.asarray(depth), np.inf)
        sel = np.argsort(dvals)[:n_cap].astype(np.int32)
        create = np.asarray(dvals[sel] < np.inf)

        kp_xy = np.asarray(feats.xy)[sel]
        kp_depth = np.asarray(depth)[sel]
        # backproject to world
        bearing = np.stack(
            [
                (kp_xy[:, 0] - float(self.cam.cx)) / float(self.cam.fx),
                (kp_xy[:, 1] - float(self.cam.cy)) / float(self.cam.fy),
                np.ones(len(sel)),
            ],
            axis=-1,
        )
        pc = bearing * kp_depth[:, None]
        Twc = self.T_cw.inverse()
        pw = (np.asarray(Twc.R) @ pc.T).T + np.asarray(Twc.t)
        cam_center = np.asarray(Twc.t)
        rays = pw - cam_center
        dist = np.linalg.norm(rays, axis=-1)
        normal = rays / np.maximum(dist[:, None], 1e-9)
        lvl = np.asarray(feats.level)[sel]
        sf = self.cfg.extractor.scale_factor
        max_dist = dist * (sf ** lvl)
        min_dist = max_dist / (sf ** (self.cfg.extractor.n_levels - 1))

        self.map, ids = map_state.create_points(
            self.map,
            jnp.int32(self.n_mp),
            jnp.int32(slot),
            jnp.asarray(sel),
            jnp.asarray(pw, jnp.float32),
            jnp.asarray(np.asarray(feats.desc)[sel]),
            jnp.asarray(normal, jnp.float32),
            jnp.asarray(min_dist, jnp.float32),
            jnp.asarray(max_dist, jnp.float32),
            jnp.asarray(create),
        )
        self.n_mp += int(create.sum())

        # refresh stats for points matched in this frame
        upd = np.asarray(matched_mp)
        upd = upd[upd >= 0]
        if upd.size > 0:
            pad = np.full((1024,), -1, np.int32)
            pad[: min(upd.size, 1024)] = upd[:1024]
            self.map = map_state.update_point_stats(self.map, jnp.asarray(pad))

    def _local_ba(self):
        """LocalBundleAdjustment over the recent window (optimizer.cpp:1641
        semantics; temporal window stands in for covisibility while there is
        no loop closure)."""
        if self.n_kf < 3:
            return
        cfg = self.cfg.ba
        W = cfg.max_local_kfs
        window = self._recent_kf_slots(W)
        # fix the oldest third of the window (boundary anchors), and always
        # fix KF 0 (gauge)
        win_np = np.asarray(window)
        fixed = np.zeros((W,), bool)
        alive = win_np >= 0
        n_alive = int(alive.sum())
        n_fix = max(1, n_alive // 3)
        order = np.argsort(np.where(alive, win_np, np.iinfo(np.int32).max))
        fixed[order[:n_fix]] = True
        fixed[win_np == 0] = True
        mp_ids, _ = steps.gather_local_points(self.map, window, cfg.max_local_points)
        prob = steps.gather_ba_problem(
            self.cam, self.map, window, jnp.asarray(fixed), mp_ids,
            n_window=W, n_points=cfg.max_local_points,
            n_obs=self.cfg.map.max_obs_per_point,
        )
        res = ba.bundle_adjust(self.cam, prob, iters=cfg.local_ba_iters)
        self.map = steps.scatter_ba_result(
            self.map, window, jnp.asarray(fixed), mp_ids, res.poses, res.points
        )
        # keep the tracker consistent with the adjusted reference KF
        self.T_cw = SE3(self.map.kf_R[self.ref_kf], self.map.kf_t[self.ref_kf])

    def _record(self, timestamp, state):
        Tcw = np.eye(4)
        Tcw[:3, :3] = np.asarray(self.T_cw.R)
        Tcw[:3, 3] = np.asarray(self.T_cw.t)
        if self.ref_kf >= 0:
            T_ref_cw = np.eye(4)
            T_ref_cw[:3, :3] = np.asarray(self.map.kf_R[self.ref_kf])
            T_ref_cw[:3, 3] = np.asarray(self.map.kf_t[self.ref_kf])
            T_rel = Tcw @ np.linalg.inv(T_ref_cw)
        else:
            T_rel = Tcw
        self.records.append(
            FrameRecord(self.frame_id, timestamp, self.ref_kf, T_rel, state)
        )

    # ------------------------------------------------------------- outputs

    def trajectory_wc(self) -> np.ndarray:
        """(N, 4, 4) Twc for every processed frame, reconstructed through
        reference keyframes (SaveTrajectoryKITTI semantics)."""
        out = []
        kf_R = np.asarray(self.map.kf_R)
        kf_t = np.asarray(self.map.kf_t)
        for rec in self.records:
            if rec.ref_kf >= 0:
                T_ref = np.eye(4)
                T_ref[:3, :3] = kf_R[rec.ref_kf]
                T_ref[:3, 3] = kf_t[rec.ref_kf]
                Tcw = rec.T_rel @ T_ref
            else:
                Tcw = rec.T_rel
            out.append(np.linalg.inv(Tcw))
        return np.stack(out) if out else np.zeros((0, 4, 4))
