"""Stereo visual odometry pipeline: host state machine over fused device steps.

Semantic reference: `Tracking::Track` and friends
(`/root/reference/src/core/tracking.cpp:1661` — state machine,
`StereoInitialization` :2167, `TrackWithMotionModel` :2696,
`TrackLocalMap` :2791, `NeedNewKeyFrame` :2925, `CreateNewKeyFrame` :3063,
RECENTLY_LOST grace :1816-1888)
plus the LocalMapping duties dispatched at keyframe rate
(`localmapping.cpp:50-260`: point creation, local BA, culling).

TPU design — built for a device behind a high-latency link (tunnel RTT is
tens of ms, so one synchronous round trip per frame would cap throughput
by itself):
  * ONE jitted program per frame (`_frame_fn`): uint8 image unpack,
    extraction, stereo association, covisibility-window projection
    matching (narrow + wide fallback, branch-free select), and pose GN.
    All host-relevant outputs are PACKED into one small f32 vector.
  * The host runs a `pipeline_depth`-deep in-flight queue: frame i is
    dispatched (async), then frame i-depth's packed vector is fetched —
    the fetch round trip overlaps device compute of the newer frames.
    This is the thread-trio equivalent of the reference (SURVEY §2.4.2):
    tracking state advances on device; host decisions lag `depth` frames,
    exactly like ORB-SLAM3's mapping thread lags its tracking thread.
  * Pose and velocity live on device between frames (the host only keeps
    numpy mirrors from the packed pulls); keyframe creation, local BA and
    culling are dispatch-only chains with NO host pull — the map-point
    allocation cursor lives in the map (`MapState.mp_count`), the BA
    window is covisibility-driven on device (steps.covis_window), and
    the culled-KF bookkeeping comes back through the next frame's batched
    fetch.

Trajectory bookkeeping follows the reference: each frame stores its pose
relative to its reference keyframe, so BA corrections propagate to the
final trajectory (`System::SaveTrajectoryKITTI` system.cpp:645 semantics).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.cameras import dispatch as camlib
from vi_slam_tpu.cameras.base import CameraParams, KB8Params
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
RECENTLY_LOST = "RECENTLY_LOST"
LOST = "LOST"

# packed layout (f32): [T_R(9), T_t(3), ref_R(9), ref_t(3), n_in,
# n_matches, n_local, n_tracked_close, n_creatable, mp_count,
# kf_flag, new_kf_slot, kf_count] = (33,)
_PK_T = slice(0, 12)
_PK_REF = slice(12, 24)
_PK_NIN = 24
_PK_NMATCH = 25
_PK_NLOCAL = 26
_PK_NCLOSE = 27
_PK_NCREAT = 28
_PK_MPCOUNT = 29
_PK_KFFLAG = 30
_PK_KFSLOT = 31
_PK_KFCOUNT = 32


class TrackBundle(NamedTuple):
    """Per-frame device outputs. `packed` is the ONLY array the host pulls;
    the rest stay device-resident for the pose chain / keyframe creation."""

    T_R: jnp.ndarray  # (3,3) optimized Tcw
    T_t: jnp.ndarray  # (3,)
    vel_R: jnp.ndarray  # (3,3) new velocity (T_cur ∘ T_last^-1)
    vel_t: jnp.ndarray  # (3,)
    matched_mp: jnp.ndarray  # (N,) int32 — stays on device
    packed: jnp.ndarray  # (33,) float32


@dataclass
class FrameJob:
    """An in-flight frame: dispatched, not yet finalized."""

    frame_id: int
    timestamp: float
    ref_kf: int  # host ref-KF slot at dispatch time
    bundle: Optional[TrackBundle]
    feats: Features
    uright: jnp.ndarray
    depth: jnp.ndarray
    # True when the KF decision+creation already happened on device inside
    # the frame dispatch (image path); False for host-decided sync paths
    fused: bool = False
    # uploaded (2, H, W) u8 stereo pair — kept by frontends that do not
    # extract descriptors every frame (KLT) so failure/reloc paths can
    # extract on demand
    imgs: Optional[jnp.ndarray] = None


@dataclass
class FrameRecord:
    frame_id: int
    timestamp: float
    ref_kf: int
    T_rel: np.ndarray  # (4,4) Tcw_frame @ Twc_refkf
    state: str
    map_id: int = 0  # Atlas map this frame tracked in (atlas.h mnId)


@dataclass
class TrackStats:
    n_matches: int = 0
    n_inliers: int = 0
    n_local_points: int = 0
    n_kfs: int = 0
    n_mps: int = 0
    state: str = OK


def make_oracle_features(n, xy, uright, depth, desc, level):
    """Pad raw oracle keypoint arrays into a fixed-capacity Features batch
    (+ uright/depth), for tests/benchmarks without the image frontend."""
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
    return feats, ur, dp


class StereoVO:
    """Single-process stereo VO over the array map."""

    def __init__(
        self,
        cfg: SystemConfig,
        timer: Optional[StageTimer] = None,
        vocab=None,
        metrics=None,
    ):
        from vi_slam_tpu.utils.metrics import MetricsStream

        # structured per-frame metrics stream (utils/metrics.py); the
        # default sink-less stream at verbosity 0 is a no-op
        self.metrics = metrics or MetricsStream(None, verbosity=0)
        self.cfg = cfg
        c = cfg.camera
        # the concrete params TYPE selects the camera model in every
        # jitted kernel (cameras/dispatch.py; camera.h:38-111 equivalent)
        cam_cls = KB8Params if c.model == "kb8" else CameraParams
        self.cam = cam_cls.make(c.fx, c.fy, c.cx, c.cy, dist=c.dist, bf=c.bf)
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
        self._last_good = (self.T_dev.R, self.T_dev.t)
        self._lost_since = 0.0
        # device KF-decision carry: (frames_since_kf, ref_kf_tracked)
        self.carry_dev = jnp.zeros((2,), jnp.int32)

        # async pipeline state
        self.pipeline_depth = cfg.tracker.pipeline_depth
        self._inflight: deque = deque()
        self._pending_culls: List[jnp.ndarray] = []
        # loop-closing queue: (slot, in-flight kf_mp row). Each new KF's
        # map-point row starts its D2H at KF rate and the LoopClosing step
        # for that KF runs one KF later when the row has landed — the
        # async equivalent of the reference's LoopClosing thread queue
        # (loopclosing.cpp:255 InsertKeyFrame)
        self._covis_queue: deque = deque()

        # ActivateLocalizationMode equivalent (system.h:92-255): tracking
        # without mapping
        self.localization_only = False

        # Atlas multi-map state (atlas.cpp:45): parked maps + active id
        self.atlas_stored: list = []
        self.active_map_id = 0
        self.merge_count = 0
        self._next_map_id = 0
        self._fork_pending = False
        self._merge_guard = False
        self._merge_key = jax.random.PRNGKey(23)
        self._last_frame_ts: Optional[float] = None

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
        n_window = cfg.ba.max_local_kfs

        @precise
        def _track(mstate, ref_slot, feats, uright, depth, T_last, vel):
            T_pred = vel.compose(T_last)
            window = steps.covis_window(mstate, ref_slot, n_window)
            mp_ids, mp_mask = steps.gather_local_points(mstate, window, n_local)
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
            # the 3x-radius recovery search (TrackWithMotionModel's retry,
            # tracking.cpp:2742) runs under lax.cond: on healthy frames —
            # the overwhelming majority — the second match+GN costs nothing
            use_wide = n1 < min_matches
            m, kp_idx, T, inlier, n_in = jax.lax.cond(
                use_wide,
                lambda: run_match(3.0 * radius, T_last),
                lambda: (m1, kp1, T1, in1, n1),
            )

            ok = m.ok & proj.valid & inlier
            matched_mp = steps.scatter_matches_to_kps(
                n_feats, kp_idx, jnp.where(mp_ids >= 0, mp_ids, -1), ok
            )
            vel_new = T.compose(T_last.inverse())
            close = (depth > 0) & (depth < close_depth) & feats.valid
            has_mp = matched_mp >= 0
            ref_safe = jnp.clip(ref_slot, 0, mstate.kf_R.shape[0] - 1)
            packed = jnp.concatenate(
                [
                    T.R.reshape(-1),
                    T.t,
                    mstate.kf_R[ref_safe].reshape(-1),
                    mstate.kf_t[ref_safe],
                    jnp.stack(
                        [
                            n_in.astype(jnp.float32),
                            jnp.sum(m.ok & proj.valid).astype(jnp.float32),
                            jnp.sum(mp_mask).astype(jnp.float32),
                            jnp.sum(close & has_mp).astype(jnp.float32),
                            jnp.sum(close & ~has_mp).astype(jnp.float32),
                            mstate.mp_count[0].astype(jnp.float32),
                            jnp.zeros((), jnp.float32),  # kf_flag
                            jnp.full((), -1.0, jnp.float32),  # new slot
                            mstate.kf_count[0].astype(jnp.float32),
                        ]
                    ),
                ]
            ).astype(jnp.float32)
            return TrackBundle(
                T_R=T.R, T_t=T.t, vel_R=vel_new.R, vel_t=vel_new.t,
                matched_mp=matched_mp, packed=packed,
            )

        self._track_fn = jax.jit(_track)
        # un-jitted core for subclasses that fuse it into their own frame
        # programs (the KLT frontend's ORB rescue branch)
        self._track_core = _track

        row_offs = jnp.asarray(self.extractor.row_offsets, jnp.int32)

        def _extract_pair(imgs_u8):
            img_l = imgs_u8[0].astype(jnp.float32)
            img_r = imgs_u8[1].astype(jnp.float32)
            featsL, atlasL = self.extractor._extract_core(img_l)
            featsR, atlasR = self.extractor._extract_core(img_r)
            sm = stereo_ops.match_stereo(
                featsL, featsR, atlasL, atlasR, row_offs, level_scales,
                cam.bf, max_disp=float(cfg.camera.bf / 0.5),
                use_mutual=cfg.matcher.stereo_mutual,
                use_median=cfg.matcher.stereo_median_sweep,
            )
            uright = jnp.where(sm.ok, sm.u_right, -1.0)
            depth = jnp.where(sm.ok, sm.depth, -1.0)
            return featsL, uright, depth

        tr_cfg = cfg.tracker
        min_ok_static = max(tr_cfg.min_matches_motion // 2, 10)
        kf_budget = min(tr_cfg.kf_point_budget, n_feats)

        def _frame(imgs_u8, mstate, carry, T_last, vel, frame_id, ts,
                   loc_only):
            """Fused per-frame program: extract + stereo + track + the
            KEYFRAME DECISION AND CREATION (NeedNewKeyFrame +
            CreateNewKeyFrame, tracking.cpp:2925/:3063) — all one dispatch.

            The reference's tracking thread creates close stereo points
            synchronously for exactly the reason this lives on device: the
            very next frame must see them. carry = (frames_since_kf,
            ref_kf_tracked) int32[2]."""
            feats, uright, depth = _extract_pair(imgs_u8)
            K = mstate.kf_R.shape[0]
            ref_slot = jnp.clip(mstate.kf_count[0] - 1, 0, K - 1)
            bundle = _track(mstate, ref_slot, feats, uright, depth, T_last, vel)
            p = bundle.packed
            n_in = p[_PK_NIN].astype(jnp.int32)
            n_close = p[_PK_NCLOSE].astype(jnp.int32)
            n_creat = p[_PK_NCREAT].astype(jnp.int32)
            fs = carry[0] + 1
            ref_tracked = jnp.maximum(carry[1], 1)

            ok = n_in >= min_ok_static
            capacity = mstate.kf_count[0] < K - 1
            timeout = fs >= tr_cfg.max_frames_between_kf
            min_frames_ok = fs >= tr_cfg.min_frames_between_kf
            need_close = (n_close < 100) & (n_creat > 70)
            weak = n_in.astype(jnp.float32) < (
                tr_cfg.kf_ref_ratio * ref_tracked.astype(jnp.float32)
            )
            kf_new = (
                ok & capacity & jnp.logical_not(loc_only)
                & (timeout | (min_frames_ok & (need_close | weak)))
            )
            slot = mstate.kf_count[0]
            T_new = SE3(bundle.T_R, bundle.T_t)

            def do_create(ms):
                return _create_kf_body(
                    ms, slot, T_new, frame_id, ts, feats, uright, depth,
                    bundle.matched_mp, kf_budget,
                )

            mstate = jax.lax.cond(kf_new, do_create, lambda ms: ms, mstate)
            carry_new = jnp.where(
                kf_new,
                jnp.stack([jnp.int32(0), n_in]),
                jnp.stack([fs, carry[1]]),
            ).astype(jnp.int32)
            packed = (
                p.at[_PK_KFFLAG].set(kf_new.astype(jnp.float32))
                .at[_PK_KFSLOT].set(
                    jnp.where(kf_new, slot, -1).astype(jnp.float32)
                )
                .at[_PK_KFCOUNT].set(mstate.kf_count[0].astype(jnp.float32))
            )
            bundle = bundle._replace(packed=packed)
            return bundle, mstate, carry_new, feats, uright, depth

        self._frame_fn = jax.jit(_frame, donate_argnums=(1,))
        self._extract_pair_fn = jax.jit(_extract_pair)
        # un-jitted cores for subclasses that fuse them into their own
        # frame programs (the inertial pipeline's _frame_vio)
        self._extract_pair_core = _extract_pair
        self._kf_decision_consts = (min_ok_static, kf_budget)

        @precise
        def _create_kf_body(mstate, slot, T, frame_id, ts, feats, uright,
                            depth, matched_mp, budget):
            mstate = map_state.insert_keyframe(
                mstate, slot, T, frame_id, ts, feats, uright, depth, matched_mp
            )
            M = mstate.mp_pos.shape[0]
            base_id = mstate.mp_count[0]
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
            # model-dispatched unprojection (z=1 bearing x z-depth);
            # pinhole and KB8 both back-project through cameras/dispatch
            bearing = camlib.unproject(cam, kp_xy)
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
            return mstate

        # standalone KF creation for the host-decided paths (stereo init,
        # oracle/RGBD sync mode)
        self._create_kf_fn = jax.jit(
            _create_kf_body, static_argnames=("budget",), donate_argnums=(0,)
        )
        self._create_kf_core = _create_kf_body

        ba_cfg = cfg.ba

        @precise
        def _local_ba(mstate, ref_slot):
            window = steps.covis_window(mstate, ref_slot, ba_cfg.max_local_kfs)
            alive = window >= 0
            # fixed boundary: the origin KF plus the oldest third of the
            # window (LocalBundleAdjustment's fixed-KF set, optimizer.cpp
            # :1641, expressed by slot age)
            big = jnp.iinfo(jnp.int32).max
            slot_key = jnp.where(alive, window, big)
            rank = jnp.argsort(jnp.argsort(slot_key))
            n_alive = jnp.sum(alive.astype(jnp.int32))
            n_fix = jnp.maximum(1, n_alive // 3)
            fixed = (rank < n_fix) | (window == 0)
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
            ref_pre = SE3(mstate.kf_R[ref_slot], mstate.kf_t[ref_slot])
            mstate = steps.scatter_ba_result(
                mstate, window, fixed, mp_ids, res.poses, res.points
            )
            ref_post = SE3(mstate.kf_R[ref_slot], mstate.kf_t[ref_slot])
            # right-multiplicative correction for the live pose chain:
            # T_frame_new = T_frame @ inv(T_ref_pre) @ T_ref_post keeps each
            # frame's pose relative to its reference KF invariant
            delta = ref_pre.inverse().compose(ref_post)
            return mstate, delta.R, delta.t

        self._local_ba_fn = jax.jit(_local_ba, donate_argnums=(0,))

        def _maintenance(mstate, ref_slot, min_obs, lo, hi):
            mstate, _n = map_state.cull_young_points(mstate, ref_slot, min_obs)
            mstate, info = map_state.cull_redundant_keyframe(mstate, lo, hi)
            return mstate, info

        self._maintenance_fn = jax.jit(_maintenance, donate_argnums=(0,))

        is_stereo = float(cam.bf) > 0

        @precise
        def _mapping_pass(mstate, ref_slot):
            """LocalMapping duties between KF insertion and local BA
            (localmapping.cpp:363 CreateNewMapPoints + :722
            SearchInNeighbors) as one dispatch-only program: fuse
            duplicate points against covisible neighbors, then (stereo)
            triangulate far/unmatched keypoints against the best
            covisible neighbor — the mono pipeline triangulates at KF
            creation instead (mono_vo._create_keyframe)."""
            mstate = steps.fuse_neighbors(
                cam, mstate, ref_slot, float(W), float(H),
                n_window=ba_cfg.mapping_fuse_window, max_fuse=96,
                th_low=cfg.matcher.th_low,
                scale_factor=ext_cfg.scale_factor,
                n_levels=ext_cfg.n_levels,
            )
            if is_stereo:
                K = mstate.kf_R.shape[0]
                M = mstate.mp_pos.shape[0]
                window = steps.covis_window(mstate, ref_slot, 2)
                nb = jnp.clip(window[1], 0, K - 1)
                cand = steps.match_and_triangulate(
                    cam, mstate, ref_slot, nb, max_new=256,
                    th_low=cfg.matcher.th_low,
                    scale_factor=ext_cfg.scale_factor,
                    n_levels=ext_cfg.n_levels,
                )
                base_id = mstate.mp_count[0]
                offsets = jnp.cumsum(cand.create.astype(jnp.int32)) - 1
                create = (
                    cand.create & (base_id + offsets < M - 1) & (window[1] >= 0)
                )
                mstate, ids = map_state.create_points(
                    mstate, base_id, ref_slot, cand.kp_new, cand.pos,
                    cand.desc, cand.normal, cand.min_dist, cand.max_dist,
                    create,
                )
                mstate = map_state.register_obs(
                    mstate, ids, nb, cand.kp_ref, create
                )
                mstate = map_state.update_point_stats(
                    mstate, jnp.where(create, ids, M - 1)
                )
            return mstate

        self._mapping_fn = jax.jit(_mapping_pass, donate_argnums=(0,))

    # ------------------------------------------------------------------ API

    def process_stereo(self, img_left, img_right, timestamp: float) -> TrackStats:
        """Full image path (GrabImageStereo semantics, tracking.cpp:1229).

        Pipelined: returns the stats of the newest FINALIZED frame (host
        decisions lag `pipeline_depth` frames behind dispatch)."""
        self._pre_frame(timestamp)
        imgs = self._upload_images(img_left, img_right)
        if self.state == NOT_INITIALIZED:
            self.flush()
            feats, uright, depth = self._extract_pair_fn(imgs)
            return self._track_entry(feats, uright, depth, timestamp, None)
        self.frame_id += 1
        with self.timer.stage("frame_core"):
            bundle, self.map, self.carry_dev, feats, uright, depth = (
                self._frame_fn(
                    imgs, self.map, self.carry_dev, self.T_dev, self.vel_dev,
                    jnp.int32(self.frame_id),
                    jnp.asarray(timestamp, jnp.float32),
                    jnp.asarray(self.localization_only),
                )
            )
        job = FrameJob(self.frame_id, timestamp, self.ref_kf, bundle,
                       feats, uright, depth, fused=True)
        # start the packed-vector D2H NOW: the transfer is enqueued behind
        # the frame's compute, so by the time _finalize asks for it the
        # bytes are already on the host (the blocking device_get otherwise
        # costs a full tunnel RTT per frame — the r2 host_pull bottleneck)
        bundle.packed.copy_to_host_async()
        # optimistic device pose chain: assume tracking succeeded; the
        # finalize step repairs the chain on failure/relocalization
        self.T_dev = SE3(bundle.T_R, bundle.T_t)
        self.vel_dev = SE3(bundle.vel_R, bundle.vel_t)
        self._inflight.append(job)
        st = None
        while len(self._inflight) > self.pipeline_depth:
            st = self._finalize(self._inflight.popleft())
        return st if st is not None else TrackStats(
            n_kfs=self.n_kf, n_mps=self.n_mp, state=self.state
        )

    def flush(self) -> Optional[TrackStats]:
        """Drain the in-flight pipeline (end of sequence / before reading
        the trajectory or checkpointing)."""
        st = self._flush_frames()
        if self.loop_closer is not None:
            self._drain_loop_queue()
        return st

    def _flush_frames(self) -> Optional[TrackStats]:
        """Drain in-flight frames + pending culls WITHOUT touching the
        loop-closing queue (safe to call from inside loop correction)."""
        st = None
        while self._inflight:
            st = self._finalize(self._inflight.popleft())
        if self._pending_culls:
            for info in jax.device_get(self._pending_culls):
                self._apply_cull_info(info)
            self._pending_culls = []
        return st

    def _upload_images(self, img_left, img_right) -> jnp.ndarray:
        """One packed uint8 upload per stereo pair (4x less tunnel traffic
        than two float32 images; real camera feeds are uint8 anyway)."""
        stacked = np.stack(
            [np.asarray(img_left), np.asarray(img_right)]
        ).astype(np.uint8)
        return jax.device_put(stacked)

    def process_oracle(self, xy, uright, depth, desc, level, timestamp: float) -> TrackStats:
        """Oracle-feature path (tests/benchmarks without the image frontend)."""
        self._pre_frame(timestamp)
        feats, ur, dp = make_oracle_features(
            self.cfg.extractor.n_features, xy, uright, depth, desc, level
        )
        bundle = None
        if self.state != NOT_INITIALIZED:
            bundle = self._track_fn(
                self.map, jnp.int32(max(self.ref_kf, 0)), feats, ur, dp,
                self.T_dev, self.vel_dev,
            )
        return self._track_entry(feats, ur, dp, timestamp, bundle)

    # ------------------------------------------------------------- tracking

    def _track_entry(self, feats, uright, depth, timestamp, bundle) -> TrackStats:
        """Synchronous dispatch+finalize (oracle / mono / rgbd / init)."""
        self.frame_id += 1
        job = FrameJob(self.frame_id, timestamp, self.ref_kf, bundle,
                       feats, uright, depth)
        if bundle is not None:
            self.T_dev = SE3(bundle.T_R, bundle.T_t)
            self.vel_dev = SE3(bundle.vel_R, bundle.vel_t)
        return self._finalize(job)

    def _finalize(self, job: FrameJob) -> TrackStats:
        st = TrackStats(n_kfs=self.n_kf, n_mps=self.n_mp)
        if job.bundle is None:
            ok = self._initialize(job.feats, job.uright, job.depth,
                                  job.timestamp)
            st.n_kfs, st.n_mps = self.n_kf, self.n_mp
            self._record(job, self.T_np, self.ref_pose_np, self.ref_kf,
                         LOST if not ok else OK)
            st.state = self.state
            self.stats.append(st)
            return st

        with self.timer.stage("host_pull"):
            pulls = {"packed": job.bundle.packed}
            if self._pending_culls:
                pulls["culls"] = list(self._pending_culls)
            got = jax.device_get(pulls)
        for info in got.get("culls", []):
            self._apply_cull_info(info)
        self._pending_culls = []

        p = got["packed"]
        T_np = np.eye(4)
        T_np[:3, :3] = p[0:9].reshape(3, 3)
        T_np[:3, 3] = p[9:12]
        ref_pose = np.eye(4)
        ref_pose[:3, :3] = p[12:21].reshape(3, 3)
        ref_pose[:3, 3] = p[21:24]
        n_in = int(p[_PK_NIN])
        self.n_mp = int(p[_PK_MPCOUNT])
        st.n_matches = int(p[_PK_NMATCH])
        st.n_inliers = n_in
        st.n_local_points = int(p[_PK_NLOCAL])

        # recovery ladder (tracking.cpp:1816-1888): OK -> RECENTLY_LOST on
        # a failed frame; relocalization may resume tracking during the
        # grace window, after which the state degrades to LOST (still
        # relocalizable, but the motion model is abandoned)
        min_ok = max(self.cfg.tracker.min_matches_motion // 2, 10)
        if self.state != OK:
            # while lost, the wide-radius search runs from a stale frozen
            # pose; a weakly-constrained fix can clear the lenient gate
            # with a badly biased pose. The reference demands >50 inliers
            # right after a loss/relocalization (tracking.cpp:2872).
            min_ok = max(min_ok, 50)
        failed = n_in < min_ok
        if self.state in (OK, RECENTLY_LOST) and failed or self.state == LOST:
            return self._handle_failure(job, st, T_np)

        # accept
        self.state = OK
        self.T_np = T_np
        self.ref_pose_np = ref_pose
        self._last_good = (job.bundle.T_R, job.bundle.T_t)

        if job.fused:
            # the KF decision+creation already happened on device inside
            # the frame dispatch; the host just learns the outcome here
            kf_created = int(p[_PK_KFFLAG]) > 0
            self.n_kf = max(self.n_kf, int(p[_PK_KFCOUNT]))
            ref_used = int(p[_PK_KFCOUNT]) - (1 if kf_created else 0) - 1
            self._record(job, T_np, ref_pose, ref_used, OK)
            self.ref_kf = self.n_kf - 1
            if kf_created:
                slot = int(p[_PK_KFSLOT])
                self.ref_pose_np = T_np.copy()
                # the KF frame's trajectory record is relative to the KF it
                # just became (identity) so BA corrections reach it exactly
                # (reference: mpReferenceKF = new KF before the Tcr record,
                # tracking.cpp:2144-2163)
                self.records[-1] = FrameRecord(
                    job.frame_id, job.timestamp, slot, np.eye(4), OK
                )
                self._on_keyframe_created(job, slot)
                self._kf_mapping(n_in)
        else:
            self.frames_since_kf += 1
            self._record(job, T_np, ref_pose, job.ref_kf, OK)
            if not self.localization_only and self._need_keyframe(
                n_in, int(p[_PK_NCLOSE]), int(p[_PK_NCREAT])
            ):
                with self.timer.stage("keyframe"):
                    self._create_keyframe(
                        job.feats, job.uright, job.depth,
                        job.bundle.matched_mp, job.timestamp,
                        pose_dev=SE3(job.bundle.T_R, job.bundle.T_t),
                        frame_id=job.frame_id, pose_np=T_np,
                    )
                self.records[-1] = FrameRecord(
                    job.frame_id, job.timestamp, self.ref_kf, np.eye(4), OK
                )
                self._on_keyframe_created(job, self.ref_kf)
                self._kf_mapping(n_in)
                self.frames_since_kf = 0

        st.n_kfs, st.n_mps, st.state = self.n_kf, self.n_mp, OK
        self.metrics.frame(
            frame=job.frame_id, state=OK, inliers=st.n_inliers,
            matches=st.n_matches, kfs=self.n_kf, mps=self.n_mp,
            map=self.active_map_id,
        )
        self.stats.append(st)
        return st

    def _handle_failure(self, job: FrameJob, st: TrackStats,
                        T_np: np.ndarray) -> TrackStats:
        """Failed-frame ladder: relocalize, else degrade
        OK -> RECENTLY_LOST -> LOST. The inertial subclass overrides this
        to bridge the grace window by IMU dead reckoning
        (tracking.cpp:1816-1835 IMU branch)."""
        n_rel = self._try_relocalize(job.feats, job.uright)
        if n_rel > 0:
            # refine against the local map from the relocalized pose (the
            # reference's next-frame TrackLocalMap pass, tracking.cpp:2791;
            # the raw single-KF PnP fix is accurate but the full local-map
            # GN tightens it before it anchors the resumed pose chain)
            bundle = self._track_fn(
                self.map, jnp.int32(max(self.ref_kf, 0)), job.feats,
                job.uright, job.depth, self.T_dev, SE3.identity(),
            )
            p = jax.device_get(bundle.packed)
            n_ref = int(p[_PK_NIN])
            if n_ref >= n_rel:
                n_rel = n_ref
                self.T_dev = SE3(bundle.T_R, bundle.T_t)
                self.vel_dev = SE3.identity()
                self._last_good = (bundle.T_R, bundle.T_t)
                T_np = np.eye(4)
                T_np[:3, :3] = p[0:9].reshape(3, 3)
                T_np[:3, 3] = p[9:12]
                self.T_np = T_np
                self.ref_pose_np = np.eye(4)
                self.ref_pose_np[:3, :3] = p[12:21].reshape(3, 3)
                self.ref_pose_np[:3, 3] = p[21:24]
            self.state = OK
            st.n_inliers = n_rel
            self._record(job, self.T_np, self.ref_pose_np, self.ref_kf, OK)
            st.n_kfs, st.n_mps, st.state = self.n_kf, self.n_mp, OK
            self.stats.append(st)
            return st
        if self.state == OK:
            self.state = RECENTLY_LOST
            self._lost_since = job.timestamp
            # freeze the device pose chain at the last good pose so
            # in-flight prediction stops compounding a bad estimate
            self.T_dev = SE3(*self._last_good)
            self.vel_dev = SE3.identity()
        elif self.state == RECENTLY_LOST and (
            job.timestamp - self._lost_since
            > self.cfg.tracker.recently_lost_sec
        ):
            self.state = LOST
            # a young map that gets lost is cheaper to rebuild than to
            # relocalize into (Tracking LOST branch, tracking.cpp:2120:
            # KFs<10 -> ResetActiveMap); with no Atlas this is the only
            # way back to a live system
            if self.n_kf < 10 and not self._atlas_ready():
                self._reset_pending = True
        elif self.state == LOST and self._atlas_ready() and (
            job.timestamp - self._lost_since
            > self.cfg.tracker.recently_lost_sec
            + self.cfg.tracker.atlas_lost_sec
        ):
            # relocalization has had its chance; park this map and start
            # fresh at the next frame (CreateMapInAtlas, tracking.cpp:3686)
            self._fork_pending = True
        self._record(job, self.T_np, self.ref_pose_np, self.ref_kf,
                     self.state)
        st.n_kfs, st.n_mps, st.state = self.n_kf, self.n_mp, self.state
        self.metrics.frame(
            frame=job.frame_id, state=self.state, inliers=st.n_inliers,
            kfs=self.n_kf, mps=self.n_mp, map=self.active_map_id,
        )
        self.stats.append(st)
        return st

    def _kf_mapping(self, n_in: int):
        """LocalMapping + LoopClosing duties run at keyframe rate
        (localmapping.cpp:50-260 loop body)."""
        self._map_tick = getattr(self, "_map_tick", 0) + 1
        if (self.n_kf >= 3
                and self._map_tick % self.cfg.tracker.mapping_every == 0):
            with self.timer.stage("mapping"):
                self.map = self._mapping_fn(self.map, jnp.int32(self.ref_kf))
        self._ba_tick = getattr(self, "_ba_tick", 0) + 1
        if self._ba_tick % self.cfg.tracker.local_ba_every == 0:
            with self.timer.stage("local_ba"):
                self._local_ba()
        with self.timer.stage("culling"):
            self._culling()
        if self.loop_closer is not None:
            with self.timer.stage("loop_closing"):
                self._loop_closing()
            if self.atlas_stored and self.n_kf >= 3:
                self._try_merge_maps()
        self._ref_kf_tracked = n_in

    # ------------------------------------------------------------- helpers

    def _sync(self, *xs):
        if self.timer.enabled:
            jax.block_until_ready(xs)

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
        self.n_mp = int(jax.device_get(self.map.mp_count)[0])
        self.state = OK
        self._last_good = (self.T_dev.R, self.T_dev.t)
        self._ref_kf_tracked = n_good
        self.carry_dev = jnp.asarray([0, n_good], jnp.int32)
        return True

    def _on_keyframe_created(self, job: FrameJob, slot: int):
        """Subclass hook: called right after a keyframe is inserted (the
        inertial pipeline closes its preintegration segment here)."""

    def _need_keyframe(self, n_in, n_tracked_close, n_creatable) -> bool:
        """NeedNewKeyFrame (tracking.cpp:2925), stereo conditions."""
        if self.n_kf >= self.map.kf_R.shape[0] - 1:
            return False
        if self.frames_since_kf >= self.cfg.tracker.max_frames_between_kf:
            return True
        if self.frames_since_kf < self.cfg.tracker.min_frames_between_kf:
            return False
        need_close = n_tracked_close < 100 and n_creatable > 70
        weak = n_in < self.cfg.tracker.kf_ref_ratio * max(self._ref_kf_tracked, 1)
        return bool(need_close or weak)

    def _create_keyframe(self, feats, uright, depth, matched_mp, timestamp,
                         pose_dev=None, frame_id=None, pose_np=None):
        """CreateNewKeyFrame (tracking.cpp:3063) as one fused dispatch —
        no host pull (the point-allocation cursor lives in the map)."""
        slot = self.n_kf
        self.n_kf += 1
        pose = pose_dev if pose_dev is not None else self.T_dev
        fid = frame_id if frame_id is not None else self.frame_id
        budget = min(1024 if slot == 0 else self.cfg.tracker.kf_point_budget,
                     self.cfg.extractor.n_features)
        self.map = self._create_kf_fn(
            self.map, jnp.int32(slot), pose, jnp.int32(fid),
            jnp.asarray(timestamp, self.map.kf_timestamp.dtype),
            feats, uright, depth, matched_mp, budget,
        )
        self.ref_kf = slot
        self.ref_pose_np = (pose_np if pose_np is not None else self.T_np).copy()

    def _local_ba(self):
        """LocalBundleAdjustment over the covisibility window
        (optimizer.cpp:1641) — dispatch-only; the corrected reference pose
        reaches the host through the next frame's packed pull."""
        if self.n_kf < 3:
            return
        self.map, dR, dt = self._local_ba_fn(self.map, jnp.int32(self.ref_kf))
        delta = SE3(dR, dt)
        self.T_dev = self.T_dev.compose(delta)
        self._last_good = (self.T_dev.R, self.T_dev.t)

    def _culling(self):
        """LocalMapping culling duties (MapPointCulling localmapping.cpp
        :322 + KeyFrameCulling :946) as one dispatch-only chain; the
        culled-KF bookkeeping comes back via the next batched pull."""
        if self.n_kf < 4:
            return
        self._maint_tick = getattr(self, "_maint_tick", 0) + 1
        if self._maint_tick % self.cfg.tracker.maintenance_every:
            return
        # stereo/RGBD demand 3 observations of a young point; mono demands
        # 2 (LocalMapping::MapPointCulling nThObs, localmapping.cpp:322)
        min_obs = 3 if float(self.cam.bf) > 0 else 2
        lo = 1
        hi = max(self.n_kf - 3, lo) if self.n_kf >= 8 else lo  # empty range
        self.map, info = self._maintenance_fn(
            self.map, jnp.int32(self.ref_kf), jnp.int32(min_obs),
            jnp.int32(lo), jnp.int32(hi),
        )
        info.copy_to_host_async()
        self._pending_culls.append(info)

    def _apply_cull_info(self, info: np.ndarray):
        if float(info[0]) < 0.5:
            return
        slot = int(info[1])
        parent = int(info[2])
        T_rel = np.eye(4)
        T_rel[:3, :3] = np.asarray(info[3:12], np.float64).reshape(3, 3)
        T_rel[:3, 3] = np.asarray(info[12:15], np.float64)
        self.culled_parent[slot] = (parent, T_rel)
        if self.loop_closer is not None:
            self.loop_closer.remove_keyframe(slot)

    def process_rgbd(self, img, depth_img, timestamp: float) -> TrackStats:
        """RGBD ingest (GrabImageRGBD semantics, tracking.cpp RGBD branch):
        the depth map yields a synthetic right coordinate
        u_right = u - bf / z per keypoint, after which the stereo tracking
        core applies unchanged (Frame RGBD ctor, frame.cpp)."""
        self._pre_frame(timestamp)
        img = jnp.asarray(img, jnp.float32)
        depth_img = jnp.asarray(depth_img, jnp.float32)
        feats, uright, depth = self._rgbd_frame_fn(img, depth_img)
        if self.state == NOT_INITIALIZED:
            return self._track_entry(feats, uright, depth, timestamp, None)
        bundle = self._track_fn(
            self.map, jnp.int32(max(self.ref_kf, 0)), feats, uright, depth,
            self.T_dev, self.vel_dev,
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
        self._last_good = (pose.R, pose.t)
        got = jax.device_get({"R": pose.R, "t": pose.t})
        T_np = np.eye(4)
        T_np[:3, :3] = got["R"]
        T_np[:3, 3] = got["t"]
        self.T_np = T_np
        return n_in

    def _loop_closing(self):
        """LoopClosing::Run step (thread boundary #2/#3 in SURVEY
        §3.2-3.3). The newest keyframe's BoW is registered now (device
        dispatch); its covisibility row starts an async D2H and the
        detection/correction for it runs at the NEXT keyframe, when the
        row has landed — one-KF lag, exactly like the reference's queued
        LoopClosing thread."""
        lc = self.loop_closer
        slot = self.ref_kf
        lc.add_bow(self.map, slot)
        row = self.map.kf_mp[slot]
        row.copy_to_host_async()
        self._covis_queue.append((slot, row))
        if len(self._covis_queue) > 1:
            self._drain_loop_queue(limit=len(self._covis_queue) - 1)

    def _drain_loop_queue(self, limit: Optional[int] = None):
        if getattr(self, "_loop_busy", False):
            return  # re-entrant drain from the pre-correction flush
        lc = self.loop_closer
        self._loop_busy = True
        try:
            n = 0
            while self._covis_queue and (limit is None or n < limit):
                slot, row = self._covis_queue.popleft()
                n += 1
                if slot in self.culled_parent:  # culled while queued
                    continue
                lc.register_covis(slot, np.asarray(row))

                def _refresh():
                    # drain frames dispatched against pre-correction
                    # poses, then hand the fresh map to the correction
                    self._flush_frames()
                    return self.map

                self.map, closed = lc.process(
                    self.map, slot, self.n_kf, refresh_cb=_refresh
                )
                if closed:
                    self.metrics.event("loop_closed", kf=slot)
                    self._after_loop_correction()
        finally:
            self._loop_busy = False

    def _after_loop_correction(self):
        """The correction rewrote every keyframe pose (essential graph +
        global BA); re-anchor the live pose chain on the corrected
        reference KF and drop the stale motion model."""
        ref = max(self.ref_kf, 0)
        R = self.map.kf_R[ref]
        t = self.map.kf_t[ref]
        got = jax.device_get({"R": R, "t": t})
        T_ref = np.eye(4)
        T_ref[:3, :3] = got["R"]
        T_ref[:3, 3] = got["t"]
        # current frame pose = its recorded pose relative to ref, re-based
        # on the corrected ref pose
        T_rel = self.T_np @ np.linalg.inv(self.ref_pose_np)
        self.T_np = T_rel @ T_ref
        self.ref_pose_np = T_ref.copy()
        self.T_dev = SE3(
            jnp.asarray(self.T_np[:3, :3], self.map.kf_R.dtype),
            jnp.asarray(self.T_np[:3, 3], self.map.kf_t.dtype),
        )
        self._last_good = (self.T_dev.R, self.T_dev.t)
        # velocity is stale across a correction; reset motion model
        self.vel_dev = SE3.identity()

    # ------------------------------------------------------ Atlas multi-map

    def _pre_frame(self, timestamp: float):
        """Per-frame entry checks: pending map fork (CreateMapInAtlas)
        and timestamp sanity (tracking.cpp:1681-1715: a backwards or
        too-large forward jump abandons the current tracking thread
        state — here: fork a fresh map, or hard-reset without atlas)."""
        if (self._last_frame_ts is not None
                and self.state != NOT_INITIALIZED):
            dt = timestamp - self._last_frame_ts
            if dt < 0 or dt > self.cfg.tracker.max_timestamp_jump_sec:
                if self._atlas_ready():
                    self._fork_pending = True
                else:
                    self.reset()
        self._last_frame_ts = timestamp
        if getattr(self, "_reset_pending", False):
            self._reset_pending = False
            self.reset()
        if self._fork_pending:
            self.flush()
            if self._fork_pending:
                self._create_map_in_atlas()

    def _atlas_ready(self) -> bool:
        return (
            self.cfg.tracker.atlas_enabled
            and self.loop_closer is not None
            and self.n_kf >= 5
        )

    def reset(self):
        """System::Reset (system.cpp:542 / Tracking::Reset
        tracking.cpp:3686 branch without atlas): drop all maps and
        records, return to NOT_INITIALIZED."""
        self.flush()
        m = self.cfg.map
        self.map = map_state.allocate(
            m.max_keyframes, self.cfg.extractor.n_features, m.max_points,
            m.max_obs_per_point,
        )
        self.n_kf = 0
        self.n_mp = 0
        self.ref_kf = -1
        self.culled_parent = {}
        self.records = []
        self.stats = []
        self.atlas_stored = []
        self.active_map_id = 0
        self._next_map_id = 0
        self._fork_pending = False
        self.state = NOT_INITIALIZED
        self.frames_since_kf = 0
        self.frame_id = -1
        self._ref_kf_tracked = 0
        self.T_dev = SE3.identity()
        self.vel_dev = SE3.identity()
        self.T_np = np.eye(4)
        self.ref_pose_np = np.eye(4)
        self._last_good = (self.T_dev.R, self.T_dev.t)
        self.carry_dev = jnp.zeros((2,), jnp.int32)
        self._last_frame_ts = None
        if self.loop_closer is not None:
            self.loop_closer.reset_for_new_map()

    def _create_map_in_atlas(self):
        """CreateMapInAtlas (tracking.cpp:3686, atlas.cpp:45): park the
        active map with its place-recognition DB and covisibility graph,
        then reinitialize tracking into a fresh map. The merge detector
        (`_try_merge_maps`) may later weld the maps back together."""
        from vi_slam_tpu.slam_map import atlas as atlas_mod

        self._fork_pending = False
        lc = self.loop_closer
        self.atlas_stored.append(
            atlas_mod.StoredMap(
                map=self.map, n_kf=self.n_kf, n_mp=self.n_mp,
                map_id=self.active_map_id,
                db=lc.db if lc else None,
                covis=lc.covis if lc else None,
                loop_edges=list(lc.loop_edges) if lc else [],
                culled_parent=dict(self.culled_parent),
            )
        )
        m = self.cfg.map
        self.map = map_state.allocate(
            m.max_keyframes, self.cfg.extractor.n_features, m.max_points,
            m.max_obs_per_point,
        )
        self.n_kf = 0
        self.n_mp = 0
        self.ref_kf = -1
        self.culled_parent = {}
        self.state = NOT_INITIALIZED
        self._next_map_id += 1
        self.active_map_id = self._next_map_id
        self.frames_since_kf = 0
        self._ref_kf_tracked = 0
        self.T_dev = SE3.identity()
        self.vel_dev = SE3.identity()
        self.T_np = np.eye(4)
        self.ref_pose_np = np.eye(4)
        self._last_good = (self.T_dev.R, self.T_dev.t)
        self.carry_dev = jnp.zeros((2,), jnp.int32)
        if lc is not None:
            lc.reset_for_new_map()
        self.metrics.event("map_fork", new_map=self.active_map_id,
                           stored_maps=len(self.atlas_stored))

    def _try_merge_maps(self) -> bool:
        """Cross-map common-region detection at keyframe rate
        (LoopClosing::NewDetectCommonRegions across Atlas maps,
        loopclosing.cpp:302): query each stored map's place-recognition
        DB with the new KF's BoW; on a Sim3-verified hit, weld
        (MergeLocal, loopclosing.cpp:1021)."""
        if self._merge_guard:
            return False
        from vi_slam_tpu.slam_map import atlas as atlas_mod

        lc = self.loop_closer
        cur = self.ref_kf
        bow = lc._bow_of(self.map, cur)
        self._merge_guard = True
        try:
            for si, sm in enumerate(self.atlas_stored):
                if sm.db is None:
                    continue
                cands = sm.db.detect_reloc_candidates(sm.map, bow)
                for cand in cands.tolist()[:3]:
                    self._merge_key, sub = jax.random.split(self._merge_key)
                    ok, S_cl, pairs = atlas_mod.verify_merge(
                        self.cam, self.map, cur, sm.map, int(cand), sub,
                        min_inliers=20, th=self.cfg.matcher.th_low,
                        fix_scale=True,
                    )
                    if ok and self._do_merge(si, cur, int(cand), S_cl, pairs):
                        return True
        finally:
            self._merge_guard = False
        return False

    def _do_merge(self, si: int, cur: int, cand: int, S_cl, pairs) -> bool:
        """MergeLocal (loopclosing.cpp:1021): transform the active map
        into the stored map's frame with the verified Sim3 weld, append
        its keyframes/points (constant-offset relabeling), fuse seam
        duplicates, run whole-map BA (MergeBundleAdjustmentVisual
        capability, optimizer.cpp:5030), and rewrite host bookkeeping."""
        from vi_slam_tpu.slam_map import atlas as atlas_mod

        sm = self.atlas_stored[si]
        K = self.map.kf_R.shape[0]
        M = self.map.mp_pos.shape[0]
        # drain in-flight frames BEFORE the capacity check: the flush can
        # finalize queued frames and insert keyframes/points, so the check
        # must see the post-flush counts or merge_into could overflow
        self.flush()
        if sm.n_kf + self.n_kf > K - 1 or sm.n_mp + self.n_mp > M - 2:
            return False  # merged map would overflow capacity
        kf_off, mp_off = sm.n_kf, sm.n_mp

        T_cur = SE3(self.map.kf_R[cur], self.map.kf_t[cur])
        T_cand = SE3(sm.map.kf_R[cand], sm.map.kf_t[cand])
        S = atlas_mod.weld_transform(
            S_cl, T_cur, T_cand, dtype=self.map.kf_t.dtype
        )
        # subclass hook state: the inertial merge needs the weld to
        # rotate velocities/gravity into the stored map's world frame
        self._last_weld_S = S
        merged = atlas_mod.merge_into(
            sm.map, self.map, S, jnp.int32(kf_off), jnp.int32(mp_off)
        )
        # seam fusion: active-map duplicates lose to stored-map points
        # (MergeLocal SearchAndFuse direction, loopclosing.cpp:1412).
        # The pairs were verified before the flush above, which may have
        # culled/replaced active-map points — re-validate both sides.
        mp_cur, mp_old, fvalid = pairs
        src = jnp.where(mp_cur >= 0, mp_cur + mp_off, -1)
        Mm = merged.mp_valid.shape[0]
        fvalid = (
            fvalid
            & merged.mp_valid[jnp.clip(src, 0, Mm - 1)]
            & merged.mp_valid[jnp.clip(mp_old, 0, Mm - 1)]
        )
        merged = map_state.fuse_points(merged, src, mp_old, fvalid)
        # welding bundle adjustment over the merged map
        prob = steps.gather_global_ba_problem(self.cam, merged)
        gres = ba.bundle_adjust(
            self.cam, prob, iters=self.cfg.ba.gba_iters, assembly="scatter"
        )
        merged = steps.scatter_global_ba_result(
            merged, gres.poses, gres.points
        )

        # host bookkeeping: relabel records/culls of the active map
        old_id = self.active_map_id
        for i, rec in enumerate(self.records):
            if rec.map_id == old_id:
                self.records[i] = FrameRecord(
                    rec.frame_id, rec.timestamp,
                    rec.ref_kf + kf_off if rec.ref_kf >= 0 else rec.ref_kf,
                    rec.T_rel, rec.state, sm.map_id,
                )
        new_culled = dict(sm.culled_parent)
        for k, (p, T) in self.culled_parent.items():
            new_culled[k + kf_off] = (p + kf_off, T)
        self.culled_parent = new_culled
        self.map = merged
        self.n_kf = kf_off + self.n_kf
        self.n_mp = mp_off + self.n_mp
        self.ref_kf = self.ref_kf + kf_off
        self.active_map_id = sm.map_id
        self.atlas_stored.pop(si)

        # loop closer adopts the stored map's DB/graph and re-registers
        # the appended keyframes under their new slots
        lc = self.loop_closer
        if lc is not None:
            shifted_edges = [
                (a + kf_off, b + kf_off) for a, b in lc.loop_edges
            ]
            lc.db = sm.db
            lc.covis = sm.covis
            lc.loop_edges = sm.loop_edges + shifted_edges
            lc.last_closed_kf = -(10**9)
            kf_valid = np.asarray(merged.kf_valid)
            for s in range(kf_off, self.n_kf):
                if kf_valid[s]:
                    lc.add_bow(merged, s)
                    lc.register_covis(s, np.asarray(merged.kf_mp[s]))
        # re-anchor the live pose chain on the welded reference KF
        self._after_loop_correction()
        self.merge_count += 1
        self.metrics.event("map_merge", into_map=self.active_map_id,
                           kf_offset=kf_off, mp_offset=mp_off)
        return True

    def _freeze_active_records(self):
        """Resolve every active-map FrameRecord to an ABSOLUTE camera pose
        (ref_kf = -1). Used before discarding the active map (bad-IMU
        reset): the records' reference-KF slots would otherwise dangle
        into a freshly allocated identity-pose table."""
        kf_R = np.asarray(self.map.kf_R)
        kf_t = np.asarray(self.map.kf_t)
        culled = self.culled_parent
        for i, rec in enumerate(self.records):
            if rec.map_id != self.active_map_id or rec.ref_kf < 0:
                continue
            ref = rec.ref_kf
            T_chain = np.eye(4)
            while ref in culled:
                parent, T_rel = culled[ref]
                T_chain = T_chain @ T_rel
                ref = parent
            T_ref = np.eye(4)
            T_ref[:3, :3] = kf_R[ref]
            T_ref[:3, 3] = kf_t[ref]
            Tcw = rec.T_rel @ T_chain @ T_ref
            self.records[i] = FrameRecord(
                rec.frame_id, rec.timestamp, -1, Tcw, rec.state, rec.map_id
            )

    def _record(self, job: FrameJob, T_np, ref_pose_np, ref_kf, state):
        if ref_kf >= 0:
            T_rel = T_np @ np.linalg.inv(ref_pose_np)
        else:
            T_rel = T_np.copy()
        self.records.append(
            FrameRecord(job.frame_id, job.timestamp, ref_kf, T_rel, state,
                        self.active_map_id)
        )

    # ------------------------------------------------------------- outputs

    def trajectory_wc(self) -> np.ndarray:
        """(N, 4, 4) Twc for every processed frame, reconstructed through
        reference keyframes (SaveTrajectoryKITTI semantics)."""
        self.flush()
        out = []
        # per-map keyframe tables: the active map plus any still-parked
        # Atlas maps (frames of merged maps were relabeled at merge time)
        tables = {
            self.active_map_id: (
                np.asarray(self.map.kf_R), np.asarray(self.map.kf_t),
                self.culled_parent,
            )
        }
        for sm in self.atlas_stored:
            tables[sm.map_id] = (
                np.asarray(sm.map.kf_R), np.asarray(sm.map.kf_t),
                sm.culled_parent,
            )
        for rec in self.records:
            kf_R, kf_t, culled = tables.get(
                rec.map_id, tables[self.active_map_id]
            )
            if rec.ref_kf >= 0:
                # walk past culled reference KFs (spanning-tree walk,
                # system.cpp:440-449)
                ref = rec.ref_kf
                T_chain = np.eye(4)
                while ref in culled:
                    parent, T_rel = culled[ref]
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
