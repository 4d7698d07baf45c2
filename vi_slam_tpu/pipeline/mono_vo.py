"""Monocular visual odometry / SLAM pipeline.

Semantic reference: the monocular branch of `Tracking`
(`/root/reference/src/core/tracking.cpp` — `MonocularInitialization`
:2274 with `MonoInitializer` H/F model selection, `CreateInitialMap
Monocular`: scale fixed by median scene depth; monocular
`CreateNewKeyFrame` creates no depth points — new landmarks come from
`LocalMapping::CreateNewMapPoints` triangulation, localmapping.cpp:363).

Shares the tracking core with StereoVO (all observations mono: uright =
-1 everywhere, so the pose optimizer runs 2-row residuals). Overrides:
  * initialization: descriptor-matched two-view reconstruction
    (geometry/two_view.py, the MonoInitializer equivalent) with median
    depth normalized to 1;
  * keyframe point creation: epipolar-constrained triangulation against
    recent keyframes (steps.match_and_triangulate) instead of stereo
    depth back-projection.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.features.extractor import Features
from vi_slam_tpu.geometry.two_view import reconstruct_two_view
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.ops import match as match_ops
from vi_slam_tpu.ops.hamming import hamming_matrix
from vi_slam_tpu.pipeline import steps
from vi_slam_tpu.pipeline.stereo_vo import (
    NOT_INITIALIZED,
    OK,
    LOST,
    StereoVO,
    TrackStats,
)
from vi_slam_tpu.slam_map import state as map_state
from vi_slam_tpu.utils.config import SystemConfig
from vi_slam_tpu.utils.timing import StageTimer


@jax.jit
def _match_frames(desc1, valid1, desc2, valid2, th=64, ratio=0.9):
    """Brute-force mutual-best matching between two frames' descriptors
    (SearchForInitialization capability, fmatcher.cpp:983 — window search
    replaced by one MXU Hamming matrix)."""
    D = hamming_matrix(desc1, desc2).astype(jnp.float32)
    big = 1e9
    D = jnp.where(valid1[:, None] & valid2[None, :], D, big)
    j_best = jnp.argmin(D, axis=1)
    d_best = jnp.min(D, axis=1)
    N = D.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1)
    D2 = jnp.where(cols == j_best[:, None], big, D)
    d_second = jnp.min(D2, axis=1)
    i_best_of_j = jnp.argmin(D, axis=0)
    mutual = i_best_of_j[j_best] == jnp.arange(N)
    ok = (d_best < th) & (d_best < ratio * d_second) & mutual & valid1
    return j_best.astype(jnp.int32), ok


class MonoVO(StereoVO):
    """Monocular pipeline: StereoVO tracking core + two-view bootstrap +
    triangulated landmark creation."""

    def __init__(
        self,
        cfg: SystemConfig,
        timer: Optional[StageTimer] = None,
        vocab=None,
    ):
        super().__init__(cfg, timer=timer, vocab=vocab)
        if self.loop_closer is not None:
            # monocular scale drift -> Sim3 loop corrections
            self.loop_closer.fix_scale = False
        self._init_ref = None  # (feats, timestamp, frame_id)
        self._key = jax.random.PRNGKey(3)
        self._build_mono_fns()

    def _build_mono_fns(self):
        cam = self.cam
        ext = self.cfg.extractor

        @partial(jax.jit, static_argnames=("max_new",), donate_argnums=(0,))
        def _triangulate_into(mstate, kf_new, kf_ref, base_id, max_new):
            cand = steps.match_and_triangulate(
                cam, mstate, kf_new, kf_ref, max_new,
                th_low=self.cfg.matcher.th_low,
                scale_factor=ext.scale_factor, n_levels=ext.n_levels,
            )
            M = mstate.mp_pos.shape[0]
            offsets = jnp.cumsum(cand.create.astype(jnp.int32)) - 1
            create = cand.create & (base_id + offsets < M - 1)
            mstate, ids = map_state.create_points(
                mstate, base_id, kf_new, cand.kp_new, cand.pos, cand.desc,
                cand.normal, cand.min_dist, cand.max_dist, create,
            )
            mstate = map_state.register_obs(
                mstate, ids, kf_ref, cand.kp_ref, create
            )
            mstate = map_state.update_point_stats(
                mstate, jnp.where(create, ids, M - 1)
            )
            return mstate, jnp.sum(create).astype(jnp.int32)

        self._triangulate_fn = _triangulate_into

    # ------------------------------------------------------------------ API

    def process_mono(self, img, timestamp: float) -> TrackStats:
        """GrabImageMonocular semantics (tracking.cpp:1320)."""
        img = jnp.asarray(img, jnp.float32)
        feats = self.extractor(img)
        n = feats.xy.shape[0]
        uright = jnp.full((n,), -1.0, jnp.float32)
        depth = jnp.full((n,), -1.0, jnp.float32)
        bundle = None
        if self.state != NOT_INITIALIZED:
            bundle = self._track_fn(
                self.map, jnp.int32(max(self.ref_kf, 0)), feats, uright,
                depth, self.T_dev, self.vel_dev,
            )
        return self._track_entry(feats, uright, depth, timestamp, bundle)

    def process_oracle_mono(self, xy, desc, level, timestamp: float) -> TrackStats:
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
        uright = jnp.full((n,), -1.0, jnp.float32)
        depth = jnp.full((n,), -1.0, jnp.float32)
        bundle = None
        if self.state != NOT_INITIALIZED:
            bundle = self._track_fn(
                self.map, jnp.int32(max(self.ref_kf, 0)), feats, uright,
                depth, self.T_dev, self.vel_dev,
            )
        return self._track_entry(feats, uright, depth, timestamp, bundle)

    # --------------------------------------------------------------- init

    def _initialize(self, feats, uright, depth, timestamp) -> bool:
        """MonocularInitialization (tracking.cpp:2274): hold a reference
        frame, then attempt two-view reconstruction against it."""
        n_valid = int(jnp.sum(feats.valid))
        if self._init_ref is None:
            if n_valid >= 100:
                self._init_ref = (feats, timestamp, self.frame_id)
            return False
        ref_feats, ref_ts, ref_fid = self._init_ref
        if n_valid < 100:
            self._init_ref = None
            return False

        j, ok = _match_frames(
            ref_feats.desc, ref_feats.valid, feats.desc, feats.valid
        )
        n_match = int(jnp.sum(ok))
        if n_match < 100:
            # stale reference: replace (the reference resets after 1 frame)
            self._init_ref = (feats, timestamp, self.frame_id)
            return False

        uv1 = ref_feats.xy
        uv2 = feats.xy[jnp.clip(j, 0, feats.xy.shape[0] - 1)]
        sigma2 = self.level_scales[
            jnp.clip(ref_feats.level, 0, self.level_scales.shape[0] - 1)
        ] ** 2
        self._key, sub = jax.random.split(self._key)
        res = reconstruct_two_view(
            self.cam, uv1, uv2, ok, sigma2, sub, n_hyp=200
        )
        if not bool(res.ok):
            self._init_ref = (feats, timestamp, self.frame_id)
            return False

        # scale: median depth of triangulated points -> 1 (CreateInitialMap)
        good = np.asarray(res.inliers)
        pts = np.array(res.points)
        med_depth = float(np.median(pts[good][:, 2]))
        if med_depth <= 0:
            return False
        pts /= med_depth
        t21 = np.asarray(res.T21.t) / med_depth

        n = feats.xy.shape[0]
        # keyframe 0 (reference frame, identity pose)
        self.T_dev = SE3.identity()
        self.T_np = np.eye(4)
        self._create_kf_shell(ref_feats, ref_ts, frame_id=ref_fid)
        # create initial points anchored at KF0
        kp0 = np.arange(n, dtype=np.int32)
        create = good & np.asarray(ref_feats.valid)
        ray = pts - 0.0
        dist = np.linalg.norm(ray, axis=-1)
        normal = ray / np.maximum(dist[:, None], 1e-9)
        lvl = np.asarray(ref_feats.level, np.float32)
        sf = self.cfg.extractor.scale_factor
        max_dist = dist * sf ** lvl
        min_dist = max_dist / sf ** (self.cfg.extractor.n_levels - 1)
        self.map, ids = map_state.create_points(
            self.map, jnp.int32(self.n_mp), jnp.int32(0),
            jnp.asarray(kp0), jnp.asarray(pts, self.map.mp_pos.dtype),
            ref_feats.desc, jnp.asarray(normal, self.map.mp_pos.dtype),
            jnp.asarray(min_dist, self.map.mp_pos.dtype),
            jnp.asarray(max_dist, self.map.mp_pos.dtype),
            jnp.asarray(create),
        )
        self.n_mp += int(np.sum(create))

        # keyframe 1 (current frame at scaled T21)
        T1 = SE3(res.T21.R, jnp.asarray(t21, self.map.kf_t.dtype))
        self.T_dev = T1
        got = np.eye(4)
        got[:3, :3] = np.asarray(res.T21.R)
        got[:3, 3] = t21
        self.T_np = got
        self._create_kf_shell(feats, timestamp)
        # register observations of the initial points from KF1
        self.map = map_state.register_obs(
            self.map, ids, jnp.int32(1),
            j, jnp.asarray(create) & jnp.asarray(ok),
        )
        self.map = map_state.update_point_stats(
            self.map,
            jnp.where(jnp.asarray(create), ids, self.map.mp_pos.shape[0] - 1),
        )
        # full BA over the 2-KF initial map (CreateInitialMapMonocular runs
        # GlobalBundleAdjustemnt(20) before tracking continues,
        # tracking.cpp:2442) — the two-view geometry alone leaves px-level
        # residuals that would anchor the whole trajectory
        from vi_slam_tpu.optim import local_ba as ba_mod

        prob = steps.gather_global_ba_problem(self.cam, self.map)
        gres = ba_mod.bundle_adjust(
            self.cam, prob, iters=20, assembly="scatter"
        )
        self.map = steps.scatter_global_ba_result(
            self.map, gres.poses, gres.points
        )
        # re-normalize: median depth of the initial points -> 1 again and
        # refresh the live pose mirrors from the optimized KF1
        T1_opt = SE3(self.map.kf_R[1], self.map.kf_t[1])
        self.T_dev = T1_opt
        got = jax.device_get({"R": T1_opt.R, "t": T1_opt.t})
        self.T_np = np.eye(4)
        self.T_np[:3, :3] = got["R"]
        self.T_np[:3, 3] = got["t"]
        self.ref_pose_np = self.T_np.copy()

        self.state = OK
        self.vel_dev = SE3.identity()
        self._ref_kf_tracked = int(np.sum(create))
        self._init_ref = None
        return True

    def _create_kf_shell(self, feats, timestamp, frame_id=None):
        """Insert a keyframe without stereo point creation."""
        slot = self.n_kf
        self.n_kf += 1
        n = feats.xy.shape[0]
        fid = self.frame_id if frame_id is None else frame_id
        self.map = map_state.insert_keyframe(
            self.map, jnp.int32(slot), self.T_dev, jnp.int32(fid),
            jnp.asarray(timestamp, self.map.kf_timestamp.dtype), feats,
            jnp.full((n,), -1.0, self.map.kf_uright.dtype),
            jnp.full((n,), -1.0, self.map.kf_depth.dtype),
            jnp.full((n,), -1, jnp.int32),
        )
        self.ref_kf = slot
        self.ref_pose_np = self.T_np.copy()

    # ------------------------------------------------------- kf creation

    def _need_keyframe(self, n_in, n_tracked_close, n_creatable) -> bool:
        """Monocular KF policy (NeedNewKeyFrame mono branch): insert more
        eagerly — tracked ratio threshold 0.9, no stereo close-point
        conditions."""
        if self.n_kf >= self.map.kf_R.shape[0] - 1:
            return False
        if self.n_kf < 2:
            return False
        if self.frames_since_kf >= self.cfg.tracker.max_frames_between_kf:
            return True
        weak = n_in < 0.9 * max(self._ref_kf_tracked, 1)
        return bool(weak and n_in > 15)

    def _create_keyframe(self, feats, uright, depth, matched_mp, timestamp,
                         pose_dev=None, frame_id=None, pose_np=None):
        """Monocular CreateNewKeyFrame: insert the KF with its tracked
        associations, then triangulate new landmarks against recent
        keyframes (CreateNewMapPoints)."""
        slot = self.n_kf
        self.n_kf += 1
        pose = pose_dev if pose_dev is not None else self.T_dev
        fid = frame_id if frame_id is not None else self.frame_id
        self.map = map_state.insert_keyframe(
            self.map, jnp.int32(slot), pose, jnp.int32(fid),
            jnp.asarray(timestamp, self.map.kf_timestamp.dtype), feats,
            uright, depth, matched_mp,
        )
        self.ref_kf = slot
        self.ref_pose_np = (pose_np if pose_np is not None else self.T_np).copy()
        # triangulate vs previous KFs at exponential lookback: under
        # forward motion the parallax gate (CreateNewMapPoints
        # cosParallax < 0.9998) needs wide baselines — the reference gets
        # them by scanning ~20 covisible neighbors; recency at several
        # scales is the array-map proxy
        budget = 512
        lookback = [1, 2, 4, 8]
        prevs = sorted({slot - d for d in lookback if slot - d >= 0})
        for prev in prevs:
            self.map, n_new = self._triangulate_fn(
                self.map, jnp.int32(slot), jnp.int32(prev),
                jnp.int32(self.n_mp), budget,
            )
            self.n_mp += int(n_new)
        self._sync(self.map.mp_pos)
