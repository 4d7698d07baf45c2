"""Stereo visual odometry pipeline: host state machine over fused device steps.

Semantic reference: `Tracking::Track` and friends
(`/root/reference/src/core/tracking.cpp:1661` — state machine,
`StereoInitialization` :2167, `TrackWithMotionModel` :2696,
`TrackLocalMap` :2791, `NeedNewKeyFrame` :2925, `CreateNewKeyFrame` :3063)
plus the LocalMapping duties run synchronously per keyframe
(`localmapping.cpp:50-260`: point creation, local BA).

TPU design — built for a device behind a high-latency link:
  * ONE jitted program per frame (`_frame_core`): extraction, stereo
    association, local-map projection matching (narrow + wide fallback,
    both computed, branch-free select), and pose GN, returning a small
    scalar bundle. The only per-frame transfers are the stereo image
    upload and one bundle download.
  * Pose and velocity live on device between frames; the host keeps numpy
    mirrors (filled from the bundle it already downloads) for bookkeeping.
  * Keyframe creation and local BA are one fused dispatch each, invoked
    only on keyframe frames; the map pytree is donated to avoid copies.

Trajectory bookkeeping follows the reference: each frame stores its pose
relative to its reference keyframe, so BA corrections propagate to the
final trajectory (`System::SaveTrajectoryKITTI` system.cpp:645 semantics).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.cameras.base import CameraParams
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
from vi_slam_tpu.utils.precision import precise
from vi_slam_tpu.utils.timing import StageTimer

NOT_INITIALIZED = "NOT_INITIALIZED"
OK = "OK"
LOST = "LOST"


class TrackBundle(NamedTuple):
    """Per-frame device outputs; scalars are downloaded, arrays stay."""

    T_R: jnp.ndarray  # (3,3) optimized Tcw
    T_t: jnp.ndarray  # (3,)
    vel_R: jnp.ndarray  # (3,3) new velocity (T_cur ∘ T_last^-1)
    vel_t: jnp.ndarray  # (3,)
    n_in: jnp.ndarray  # () int32
    n_matches: jnp.ndarray
    n_local: jnp.ndarray
    n_tracked_close: jnp.ndarray
    n_creatable: jnp.ndarray
    matched_mp: jnp.ndarray  # (N,) int32 — stays on device


@dataclass
class FrameRecord:
    frame_id: int
    timestamp: float
    ref_kf: int
    T_rel: np.ndarray  # (4,4) Tcw_frame @ Twc_refkf
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

    def __init__(
        self,
        cfg: SystemConfig,
        timer: Optional[StageTimer] = None,
        vocab=None,
    ):
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
        # culled KF k -> (parent slot, T_k@inv(T_parent) at cull time); the
        # trajectory writer walks this chain like the reference walks the
        # spanning tree past bad KFs (system.cpp:440-449)
        self.culled_parent = {}
        self.state = NOT_INITIALIZED
        self.ref_kf = -1
        self.frames_since_kf = 0
        self.frame_id = -1
        self.records: List[FrameRecord] = []
        self.stats: List[TrackStats] = []
        self.level_scales = jnp.asarray(
            pyr_ops.scale_factors(cfg.extractor.n_levels, cfg.extractor.scale_factor)
        )
        self._ref_kf_tracked = 0

        # device-resident pose state + host mirrors
        self.T_dev = SE3.identity()
        self.vel_dev = SE3.identity()
        self.T_np = np.eye(4)
        self.ref_pose_np = np.eye(4)  # Tcw of reference keyframe
        self._recent_cache = {}

        # optional loop closing (LoopClosing thread equivalent), enabled by
        # providing a vocabulary
        self.loop_closer = None
        self.relocalizer = None
        if vocab is not None:
            from vi_slam_tpu.pipeline.loop_closing import LoopCloser
            from vi_slam_tpu.pipeline.relocalization import Relocalizer

            self.loop_closer = LoopCloser(cfg, self.cam, vocab, fix_scale=True)
            self.relocalizer = Relocalizer(
                self.cam,
                jnp.asarray(
                    pyr_ops.scale_factors(
                        cfg.extractor.n_levels, cfg.extractor.scale_factor
                    )
                ),
            )

        self._build_device_fns()

    # ----------------------------------------------------- device programs

    def _build_device_fns(self):
        cfg = self.cfg
        cam = self.cam
        ext_cfg = cfg.extractor
        W, H = cfg.camera.width, cfg.camera.height
        n_local = cfg.ba.max_local_points
        radius = cfg.tracker.search_radius
        th_high = cfg.matcher.th_high
        ratio = cfg.matcher.nn_ratio
        rounds = cfg.ba.pose_rounds
        iters = cfg.ba.pose_iters_per_round
        close_depth = self.close_depth
        min_matches = cfg.tracker.min_matches_motion
        level_scales = self.level_scales
        n_feats = ext_cfg.n_features

        @precise
        def _track(mstate, recent, feats, uright, depth, T_last, vel):
            T_pred = vel.compose(T_last)
            mp_ids, mp_mask = steps.gather_local_points(mstate, recent, n_local)
            proj = steps.project_local_points(
                cam, mstate, mp_ids, mp_mask, T_pred, W, H,
                n_levels=ext_cfg.n_levels, scale_factor=ext_cfg.scale_factor,
            )

            def run_match(rad, T_init):
                m = match_ops.search_by_projection(
                    proj.uv, proj.level, proj.desc, proj.valid,
                    feats.xy, feats.level, feats.desc, feats.valid,
                    radius=rad, level_scales=level_scales,
                    max_dist=th_high, ratio=ratio,
                )
                m = match_ops.resolve_duplicate_targets(m, n_feats)
                obs, kp_idx = steps.build_pose_obs(proj, m, feats, uright)
                T_opt, inlier, n_in = pose_opt.pose_optimize(
                    cam, T_init, obs, rounds=rounds, iters=iters,
                )
                return m, kp_idx, T_opt, inlier, n_in

            m1, kp1, T1, in1, n1 = run_match(radius, T_pred)
            m2, kp2, T2, in2, n2 = run_match(3.0 * radius, T_last)
            use_wide = n1 < min_matches
            pick = lambda a, b: jax.tree.map(
                lambda x, y: jnp.where(use_wide, y, x), a, b
            )
            m, kp_idx, T, inlier, n_in = (
                pick(m1, m2), pick(kp1, kp2), pick(T1, T2),
                pick(in1, in2), jnp.where(use_wide, n2, n1),
            )

            ok = m.ok & proj.valid & inlier
            matched_mp = steps.scatter_matches_to_kps(
                n_feats, kp_idx, jnp.where(mp_ids >= 0, mp_ids, -1), ok
            )
            vel_new = T.compose(T_last.inverse())
            close = (depth > 0) & (depth < close_depth) & feats.valid
            has_mp = matched_mp >= 0
            return TrackBundle(
                T_R=T.R, T_t=T.t, vel_R=vel_new.R, vel_t=vel_new.t,
                n_in=n_in.astype(jnp.int32),
                n_matches=jnp.sum(m.ok & proj.valid).astype(jnp.int32),
                n_local=jnp.sum(mp_mask).astype(jnp.int32),
                n_tracked_close=jnp.sum(close & has_mp).astype(jnp.int32),
                n_creatable=jnp.sum(close & ~has_mp).astype(jnp.int32),
                matched_mp=matched_mp,
            )

        self._track_fn = jax.jit(_track)

        def _extract_pair(img_l, img_r):
            featsL = self.extractor._extract(img_l)
            featsR = self.extractor._extract(img_r)
            pyrL = pyr_ops.build_pyramid(img_l, ext_cfg.n_levels, ext_cfg.scale_factor)
            pyrR = pyr_ops.build_pyramid(img_r, ext_cfg.n_levels, ext_cfg.scale_factor)
            sm = stereo_ops.match_stereo(
                featsL, featsR, pyrL, pyrR, level_scales, cam.bf,
                max_disp=float(cfg.camera.bf / 0.5),
            )
            uright = jnp.where(sm.ok, sm.u_right, -1.0)
            depth = jnp.where(sm.ok, sm.depth, -1.0)
            return featsL, uright, depth

        def _frame(img_l, img_r, mstate, recent, T_last, vel):
            feats, uright, depth = _extract_pair(img_l, img_r)
            bundle = _track(mstate, recent, feats, uright, depth, T_last, vel)
            return bundle, feats, uright, depth

        self._frame_fn = jax.jit(_frame)
        self._extract_pair_fn = jax.jit(_extract_pair)

        @precise
        def _create_kf(mstate, slot, T, frame_id, ts, feats, uright, depth,
                       matched_mp, base_id, budget):
            mstate = map_state.insert_keyframe(
                mstate, slot, T, frame_id, ts, feats, uright, depth, matched_mp
            )
            M = mstate.mp_pos.shape[0]
            can = (
                feats.valid & (depth > 0) & (depth < 2.0 * close_depth)
                & (matched_mp < 0)
            )
            dvals = jnp.where(can, depth, jnp.inf)
            neg_top, sel = jax.lax.top_k(-dvals, budget)
            sel = sel.astype(jnp.int32)
            create0 = jnp.isfinite(-neg_top)
            offsets = jnp.cumsum(create0.astype(jnp.int32)) - 1
            create = create0 & (base_id + offsets < M - 1)

            kp_xy = feats.xy[sel]
            kp_depth = depth[sel]
            bearing = jnp.stack(
                [
                    (kp_xy[:, 0] - cam.cx) / cam.fx,
                    (kp_xy[:, 1] - cam.cy) / cam.fy,
                    jnp.ones_like(kp_depth),
                ],
                axis=-1,
            )
            pc = bearing * kp_depth[:, None]
            Twc = T.inverse()
            pw = Twc.apply(pc)
            center = Twc.t
            rays = pw - center
            dist = jnp.linalg.norm(rays, axis=-1)
            normal = rays / jnp.maximum(dist[:, None], 1e-9)
            lvl = feats.level[sel].astype(jnp.float32)
            sf = ext_cfg.scale_factor
            max_dist = dist * sf ** lvl
            min_dist = max_dist / sf ** (ext_cfg.n_levels - 1)

            mstate, ids = map_state.create_points(
                mstate, base_id, slot, sel, pw, feats.desc[sel],
                normal, min_dist, max_dist, create,
            )
            # refresh stats for points matched in this frame
            upd_ids = jnp.where(matched_mp >= 0, matched_mp, M - 1)
            mstate = map_state.update_point_stats(mstate, upd_ids)
            return mstate, jnp.sum(create).astype(jnp.int32)

        self._create_kf_fn = jax.jit(
            _create_kf, static_argnames=("budget",), donate_argnums=(0,)
        )

        ba_cfg = cfg.ba

        @precise
        def _local_ba(mstate, window, fixed, ref_slot):
            mp_ids, _ = steps.gather_local_points(
                mstate, window, ba_cfg.max_local_points
            )
            prob = steps.gather_ba_problem(
                cam, mstate, window, fixed, mp_ids,
                n_window=ba_cfg.max_local_kfs,
                n_points=ba_cfg.max_local_points,
                n_obs=cfg.map.max_obs_per_point,
            )
            res = ba._ba_core(cam, prob, ba_cfg.local_ba_iters, True, 1e-4)
            mstate = steps.scatter_ba_result(
                mstate, window, fixed, mp_ids, res.poses, res.points
            )
            return mstate, mstate.kf_R[ref_slot], mstate.kf_t[ref_slot]

        self._local_ba_fn = jax.jit(_local_ba, donate_argnums=(0,))

    # ------------------------------------------------------------------ API

    def process_stereo(self, img_left, img_right, timestamp: float) -> TrackStats:
        """Full image path (GrabImageStereo semantics, tracking.cpp:1229)."""
        img_l = jnp.asarray(img_left, jnp.float32)
        img_r = jnp.asarray(img_right, jnp.float32)
        if self.state == NOT_INITIALIZED:
            feats, uright, depth = self._extract_pair_fn(img_l, img_r)
            return self._track_entry(feats, uright, depth, timestamp, None)
        with self.timer.stage("frame_core"):
            bundle, feats, uright, depth = self._frame_fn(
                img_l, img_r, self.map, self._recent_kfs(), self.T_dev,
                self.vel_dev,
            )
            self._sync(bundle.n_in)
        return self._track_entry(feats, uright, depth, timestamp, bundle)

    def process_oracle(self, xy, uright, depth, desc, level, timestamp: float) -> TrackStats:
        """Oracle-feature path (tests/benchmarks without the image frontend)."""
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
        bundle = None
        if self.state != NOT_INITIALIZED:
            bundle = self._track_fn(
                self.map, self._recent_kfs(), feats, ur, dp, self.T_dev,
                self.vel_dev,
            )
        return self._track_entry(feats, ur, dp, timestamp, bundle)

    # ------------------------------------------------------------- tracking

    def _track_entry(self, feats, uright, depth, timestamp, bundle) -> TrackStats:
        self.frame_id += 1
        st = TrackStats()
        if self.state == NOT_INITIALIZED:
            ok = self._initialize(feats, uright, depth, timestamp)
            st.n_kfs, st.n_mps = self.n_kf, self.n_mp
            self._record(timestamp, LOST if not ok else OK)
            self.stats.append(st)
            return st

        with self.timer.stage("host_pull"):
            sc = jax.device_get(
                {
                    "n_in": bundle.n_in, "n_matches": bundle.n_matches,
                    "n_local": bundle.n_local,
                    "n_tracked_close": bundle.n_tracked_close,
                    "n_creatable": bundle.n_creatable,
                    "T_R": bundle.T_R, "T_t": bundle.T_t,
                }
            )
        n_in = int(sc["n_in"])
        st.n_matches = int(sc["n_matches"])
        st.n_inliers = n_in
        st.n_local_points = int(sc["n_local"])

        # recovery ladder (tracking.cpp:1816-1888): once LOST, the motion
        # model is stale — only relocalization may resume tracking; while
        # OK, a failed frame first tries relocalization before going LOST
        relocated = False
        if self.state == LOST or n_in < max(
            self.cfg.tracker.min_matches_motion // 2, 10
        ):
            n_rel = self._try_relocalize(feats, uright)
            if n_rel == 0:
                self.state = LOST
                self._record(timestamp, LOST)
                st.n_kfs, st.n_mps = self.n_kf, self.n_mp
                self.stats.append(st)
                return st
            n_in = n_rel
            st.n_inliers = n_rel
            relocated = True

        # accept
        if not relocated:
            self.T_dev = SE3(bundle.T_R, bundle.T_t)
            self.vel_dev = SE3(bundle.vel_R, bundle.vel_t)
            T_np = np.eye(4)
            T_np[:3, :3] = sc["T_R"]
            T_np[:3, 3] = sc["T_t"]
            self.T_np = T_np
        # (on relocation, _try_relocalize already refreshed pose mirrors)
        self.state = OK
        self.frames_since_kf += 1

        if self._need_keyframe(
            n_in, int(sc["n_tracked_close"]), int(sc["n_creatable"])
        ):
            with self.timer.stage("keyframe"):
                self._create_keyframe(
                    feats, uright, depth, bundle.matched_mp, timestamp
                )
            with self.timer.stage("local_ba"):
                self._local_ba()
            with self.timer.stage("culling"):
                self._culling()
            if self.loop_closer is not None:
                with self.timer.stage("loop_closing"):
                    self._loop_closing()
            self.frames_since_kf = 0
            self._ref_kf_tracked = n_in

        self._record(timestamp, OK)
        st.n_kfs, st.n_mps = self.n_kf, self.n_mp
        self.stats.append(st)
        return st

    # ------------------------------------------------------------- helpers

    def _sync(self, *xs):
        if self.timer.enabled:
            jax.block_until_ready(xs)

    def _recent_kfs(self) -> jnp.ndarray:
        w = self.cfg.ba.max_local_kfs
        key = (self.n_kf, w)
        if key not in self._recent_cache:
            slots = np.full((w,), -1, np.int32)
            n = min(w, self.n_kf)
            if n > 0:
                slots[:n] = np.arange(self.n_kf - n, self.n_kf, dtype=np.int32)
            self._recent_cache = {key: jnp.asarray(slots)}  # keep only latest
        return self._recent_cache[key]

    def _initialize(self, feats, uright, depth, timestamp) -> bool:
        """StereoInitialization (tracking.cpp:2167)."""
        n_good = int(jnp.sum(feats.valid & (depth > 0)))
        if n_good < 100:
            return False
        self.T_dev = SE3.identity()
        self.vel_dev = SE3.identity()
        self.T_np = np.eye(4)
        self._create_keyframe(
            feats, uright, depth,
            jnp.full((feats.xy.shape[0],), -1, jnp.int32), timestamp,
        )
        self.state = OK
        self._ref_kf_tracked = n_good
        return True

    def _need_keyframe(self, n_in, n_tracked_close, n_creatable) -> bool:
        """NeedNewKeyFrame (tracking.cpp:2925), stereo conditions."""
        if self.n_kf >= self.map.kf_R.shape[0] - 1:
            return False
        if self.frames_since_kf >= self.cfg.tracker.max_frames_between_kf:
            return True
        need_close = n_tracked_close < 100 and n_creatable > 70
        weak = n_in < self.cfg.tracker.kf_ref_ratio * max(self._ref_kf_tracked, 1)
        return bool(need_close or weak)

    def _create_keyframe(self, feats, uright, depth, matched_mp, timestamp):
        """CreateNewKeyFrame (tracking.cpp:3063) as one fused dispatch."""
        slot = self.n_kf
        self.n_kf += 1
        budget = min(1024 if slot == 0 else 384, self.cfg.extractor.n_features)
        self.map, n_created = self._create_kf_fn(
            self.map, jnp.int32(slot), self.T_dev, jnp.int32(self.frame_id),
            jnp.asarray(timestamp, self.map.kf_timestamp.dtype),
            feats, uright, depth, matched_mp, jnp.int32(self.n_mp),
            budget,
        )
        self.n_mp += int(n_created)
        self.ref_kf = slot
        self.ref_pose_np = self.T_np.copy()
        self._sync(self.map.mp_pos)

    def _local_ba(self):
        """LocalBundleAdjustment over the recent window (optimizer.cpp:1641
        semantics; temporal window stands in for covisibility while there is
        no loop closure)."""
        if self.n_kf < 3:
            return
        W = self.cfg.ba.max_local_kfs
        window = self._recent_kfs()
        win_np = np.asarray(window)
        fixed = np.zeros((W,), bool)
        alive = win_np >= 0
        n_alive = int(alive.sum())
        n_fix = max(1, n_alive // 3)
        order = np.argsort(np.where(alive, win_np, np.iinfo(np.int32).max))
        fixed[order[:n_fix]] = True
        fixed[win_np == 0] = True
        self.map, R_ref, t_ref = self._local_ba_fn(
            self.map, window, jnp.asarray(fixed), jnp.int32(self.ref_kf)
        )
        got = jax.device_get({"R": R_ref, "t": t_ref})
        self.T_dev = SE3(R_ref, t_ref)
        T_np = np.eye(4)
        T_np[:3, :3] = got["R"]
        T_np[:3, 3] = got["t"]
        self.T_np = T_np
        self.ref_pose_np = T_np.copy()

    def _culling(self):
        """LocalMapping culling duties (MapPointCulling localmapping.cpp
        :322 + KeyFrameCulling :946), run at KF rate."""
        if self.n_kf < 4:
            return
        # stereo/RGBD demand 3 observations of a young point; mono demands
        # 2 (LocalMapping::MapPointCulling nThObs, localmapping.cpp:322 —
        # mono registers observations only at KF rate, so its young points
        # accumulate them more slowly)
        min_obs = 3 if float(self.cam.bf) > 0 else 2
        self.map, _n = map_state.cull_young_points(
            self.map, jnp.int32(self.ref_kf), jnp.int32(min_obs)
        )
        if self.n_kf >= 8:
            red = np.asarray(map_state.keyframe_redundancy(self.map))
            valid = np.asarray(self.map.kf_valid)
            # protect the origin and the most recent 3 KFs; cull at most
            # one per round to bound per-frame cost
            for k in range(1, self.n_kf - 3):
                if valid[k] and red[k] > 0.9:
                    # record the relative pose to a live parent so frame
                    # records anchored at k stay reconstructible
                    kf_R = np.asarray(self.map.kf_R)
                    kf_t = np.asarray(self.map.kf_t)
                    parent = k - 1
                    while parent > 0 and not valid[parent]:
                        parent -= 1
                    T_k = np.eye(4)
                    T_k[:3, :3], T_k[:3, 3] = kf_R[k], kf_t[k]
                    T_p = np.eye(4)
                    T_p[:3, :3], T_p[:3, 3] = kf_R[parent], kf_t[parent]
                    self.culled_parent[k] = (parent, T_k @ np.linalg.inv(T_p))
                    self.map = map_state.remove_keyframe(
                        self.map, jnp.int32(k)
                    )
                    if self.loop_closer is not None:
                        self.loop_closer.db.remove(k)
                    break

    def process_rgbd(self, img, depth_img, timestamp: float) -> TrackStats:
        """RGBD ingest (GrabImageRGBD semantics, tracking.cpp RGBD branch):
        the depth map yields a synthetic right coordinate
        u_right = u - bf / z per keypoint, after which the stereo tracking
        core applies unchanged (Frame RGBD ctor, frame.cpp)."""
        img = jnp.asarray(img, jnp.float32)
        depth_img = jnp.asarray(depth_img, jnp.float32)
        feats, uright, depth = self._rgbd_frame_fn(img, depth_img)
        if self.state == NOT_INITIALIZED:
            return self._track_entry(feats, uright, depth, timestamp, None)
        bundle = self._track_fn(
            self.map, self._recent_kfs(), feats, uright, depth, self.T_dev,
            self.vel_dev,
        )
        return self._track_entry(feats, uright, depth, timestamp, bundle)

    @property
    def _rgbd_frame_fn(self):
        if not hasattr(self, "_rgbd_fn_cached"):
            cam = self.cam

            def _rgbd(img, depth_img):
                feats = self.extractor._extract(img)
                H, W = depth_img.shape
                u = jnp.clip(feats.xy[:, 0].astype(jnp.int32), 0, W - 1)
                v = jnp.clip(feats.xy[:, 1].astype(jnp.int32), 0, H - 1)
                z = depth_img[v, u]
                ok = feats.valid & (z > 0)
                depth = jnp.where(ok, z, -1.0)
                uright = jnp.where(
                    ok, feats.xy[:, 0] - cam.bf / jnp.maximum(z, 1e-6), -1.0
                )
                return feats, uright, depth

            self._rgbd_fn_cached = jax.jit(_rgbd)
        return self._rgbd_fn_cached

    def _try_relocalize(self, feats, uright) -> int:
        """Relocalization attempt (Tracking::Relocalization,
        tracking.cpp:3456). Returns inlier count (0 = failed)."""
        if self.relocalizer is None or self.loop_closer is None:
            return 0
        if self.n_kf < 1:
            return 0
        from vi_slam_tpu.retrieval import vocabulary as voc

        vocab = self.loop_closer.vocab
        words, _ = voc.transform(vocab, feats.desc)
        bow = voc.bow_vectors(
            words[None], feats.valid[None], vocab.idf, vocab.n_words
        )[0]
        pose, n_in = self.relocalizer.try_relocalize(
            self.map, self.loop_closer.db, bow, feats, uright
        )
        if pose is None:
            return 0
        self.T_dev = pose
        self.vel_dev = SE3.identity()
        got = jax.device_get({"R": pose.R, "t": pose.t})
        T_np = np.eye(4)
        T_np[:3, :3] = got["R"]
        T_np[:3, 3] = got["t"]
        self.T_np = T_np
        return n_in

    def _loop_closing(self):
        """LoopClosing::Run step for the newest keyframe (thread boundary
        #2/#3 in SURVEY §3.2-3.3, run synchronously at KF rate)."""
        lc = self.loop_closer
        slot = self.ref_kf
        lc.add_keyframe(self.map, slot)
        self.map, closed = lc.process(self.map, slot, self.n_kf)
        if closed:
            # current pose = corrected pose of the KF just created from
            # this frame; refresh device + host mirrors
            R = self.map.kf_R[slot]
            t = self.map.kf_t[slot]
            self.T_dev = SE3(R, t)
            got = jax.device_get({"R": R, "t": t})
            T_np = np.eye(4)
            T_np[:3, :3] = got["R"]
            T_np[:3, 3] = got["t"]
            self.T_np = T_np
            self.ref_pose_np = T_np.copy()
            # velocity is stale across a correction; reset motion model
            self.vel_dev = SE3.identity()

    def _record(self, timestamp, state):
        if self.ref_kf >= 0:
            T_rel = self.T_np @ np.linalg.inv(self.ref_pose_np)
        else:
            T_rel = self.T_np.copy()
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
                # walk past culled reference KFs (spanning-tree walk,
                # system.cpp:440-449)
                ref = rec.ref_kf
                T_chain = np.eye(4)
                while ref in self.culled_parent:
                    parent, T_rel = self.culled_parent[ref]
                    T_chain = T_chain @ T_rel
                    ref = parent
                T_ref = np.eye(4)
                T_ref[:3, :3] = kf_R[ref]
                T_ref[:3, 3] = kf_t[ref]
                Tcw = rec.T_rel @ T_chain @ T_ref
            else:
                Tcw = rec.T_rel
            out.append(np.linalg.inv(Tcw))
        return np.stack(out) if out else np.zeros((0, 4, 4))
