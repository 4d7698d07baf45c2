"""Jitted per-frame device steps for the tracking pipeline.

These are the static-shape device programs the host state machine
(pipeline/stereo_vo.py) composes. Semantic references:

  * project+match: `Tracking::TrackLocalMap` / `SearchLocalPoints`
    (`/root/reference/src/core/tracking.cpp:2791/:3192`) and
    `MapPoint::PredictScale` / `isInFrustum` checks (frame.cpp:529).
  * local point gathering: `Tracking::UpdateLocalKeyFrames/Points`
    (tracking.cpp:3306/:3276), bounded to static capacities.
  * BA problem gather/scatter: `Optimizer::LocalBundleAdjustment` setup
    (optimizer.cpp:1641) — local + fixed KFs, their points, observations.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.cameras import dispatch as camlib
from vi_slam_tpu.features.extractor import Features
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.ops import match as match_ops
from vi_slam_tpu.optim.local_ba import BAProblem
from vi_slam_tpu.optim.pose_opt import PoseObs
from vi_slam_tpu.slam_map.state import MapState


@partial(jax.jit, static_argnames=("n_local",))
def gather_local_points(
    state: MapState, recent_kfs: jnp.ndarray, n_local: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unique map-point ids observed by the given KF slots.

    recent_kfs: (W,) int32 slots, -1 padded.
    Returns (ids (n_local,), mask (n_local,)); ids are -1 beyond the count.
    """
    K, N = state.kf_mp.shape
    M = state.mp_pos.shape[0]
    safe = jnp.clip(recent_kfs, 0, K - 1)
    rows = state.kf_mp[safe]  # (W, N)
    rows = jnp.where((recent_kfs >= 0)[:, None], rows, -1)
    flat = rows.reshape(-1)
    # When the capacity cap truncates, priority is (1) points observed by
    # the reference keyframe itself — the ones tracking matches against
    # and local BA must keep fresh (a newest-only preference starves
    # long-lived fused points of re-optimization forever) — then (2) the
    # newest points. unique() keeps the smallest keys; same id always maps
    # to the same key, so dedup is stable.
    Q = M + 1
    ref_row = rows[0]
    in_ref = (
        jnp.zeros((M,), bool)
        .at[jnp.clip(ref_row, 0, M - 1)]
        .set(ref_row >= 0, mode="drop")
    )
    pri = jnp.where(in_ref[jnp.clip(flat, 0, M - 1)], 0, 1)
    key = jnp.where(flat >= 0, pri * Q + (M - flat), 2 * Q + 1)
    uniq = jnp.unique(key, size=n_local, fill_value=2 * Q + 1)
    ids = jnp.where(uniq < 2 * Q, M - (uniq % Q), -1)
    return ids, ids >= 0


@partial(jax.jit, static_argnames=("n_window",))
def covis_window(
    state: MapState, ref_slot: jnp.ndarray, n_window: int
) -> jnp.ndarray:
    """Local keyframe window driven by the covisibility graph: the
    reference KF plus its most-covisible live keyframes, recency as the
    tiebreak (Optimizer::LocalBundleAdjustment window selection,
    optimizer.cpp:1641 / KeyFrame::GetBestCovisibilityKeyFrames,
    keyframe.h:79-86). Returns (n_window,) slots, -1 padded."""
    from vi_slam_tpu.slam_map.state import covisibility_row

    K = state.kf_valid.shape[0]
    counts = covisibility_row(state, ref_slot).astype(jnp.int32)
    slots = jnp.arange(K, dtype=jnp.int32)
    key = jnp.where(state.kf_valid, counts * K + slots, -1)
    key = key.at[ref_slot].set(jnp.iinfo(jnp.int32).max)  # ref always first
    topv, topi = jax.lax.top_k(key, n_window)
    return jnp.where(topv > 0, topi.astype(jnp.int32), -1)


class Projected(NamedTuple):
    uv: jnp.ndarray  # (M, 2)
    level: jnp.ndarray  # (M,)
    desc: jnp.ndarray  # (M, 8)
    valid: jnp.ndarray  # (M,)
    pos: jnp.ndarray  # (M, 3) world positions


@partial(jax.jit, static_argnames=("width", "height", "n_levels", "scale_factor"))
def project_local_points(
    cam: CameraParams,
    state: MapState,
    mp_ids: jnp.ndarray,
    mp_mask: jnp.ndarray,
    T_cw: SE3,
    width: int,
    height: int,
    n_levels: int = 8,
    scale_factor: float = 1.2,
) -> Projected:
    """Project map points into the predicted camera; compute predicted
    octave and visibility (isInFrustum + PredictScale semantics)."""
    M = state.mp_pos.shape[0]
    safe = jnp.clip(mp_ids, 0, M - 1)
    pos = state.mp_pos[safe]
    desc = state.mp_desc[safe]
    normal = state.mp_normal[safe]
    mind = state.mp_min_dist[safe]
    maxd = state.mp_max_dist[safe]
    alive = state.mp_valid[safe] & mp_mask

    pc = T_cw.apply(pos)
    z = pc[..., 2]
    uv = camlib.project(cam, pc)
    in_img = (
        (uv[..., 0] >= 0)
        & (uv[..., 0] < width)
        & (uv[..., 1] >= 0)
        & (uv[..., 1] < height)
        & (z > 0.1)
    )
    # distance within scale-invariance region (with the reference's margins)
    cam_center = T_cw.inverse().t
    ray = pos - cam_center
    dist = jnp.linalg.norm(ray, axis=-1)
    in_range = (dist >= 0.8 * mind) & (dist <= 1.2 * maxd)
    # viewing angle vs mean normal (cos > 0.5 as in SearchLocalPoints)
    cosv = jnp.sum(ray * normal, axis=-1) / jnp.maximum(
        dist * jnp.linalg.norm(normal, axis=-1), 1e-9
    )
    view_ok = cosv > 0.5
    # predicted level: ceil(log(maxdist/dist)/log(scale)) (PredictScale)
    ratio = jnp.maximum(maxd / jnp.maximum(dist, 1e-6), 1e-6)
    level = jnp.clip(
        jnp.ceil(jnp.log(ratio) / np.log(scale_factor)).astype(jnp.int32),
        0,
        n_levels - 1,
    )
    return Projected(
        uv=uv,
        level=level,
        desc=desc,
        valid=alive & in_img & in_range & view_ok,
        pos=pos,
    )


@jax.jit
def build_pose_obs(
    proj: Projected,
    m: match_ops.Matches,
    feats: Features,
    uright: jnp.ndarray,
    scale_factor: float = 1.2,
) -> Tuple[PoseObs, jnp.ndarray]:
    """Turn projection matches into a PoseObs batch.

    Returns (obs, kp_idx (M,) int32 matched keypoint per projected point).
    """
    kp = jnp.clip(m.idx, 0, feats.xy.shape[0] - 1)
    uv_kp = feats.xy[kp]
    ur_kp = uright[kp]
    stereo = ur_kp > 0
    uvr = jnp.concatenate(
        [uv_kp, jnp.where(stereo, ur_kp, 0.0)[:, None]], axis=-1
    )
    level = feats.level[kp]
    sigma2 = scale_factor ** (2.0 * level.astype(jnp.float32))
    obs = PoseObs(
        xw=proj.pos,
        uvr=uvr,
        stereo=stereo,
        sigma2=sigma2,
        valid=m.ok & proj.valid,
    )
    return obs, kp


@partial(jax.jit, static_argnames=("n_kps",))
def scatter_matches_to_kps(
    n_kps: int, kp_idx: jnp.ndarray, mp_ids: jnp.ndarray, ok: jnp.ndarray
) -> jnp.ndarray:
    """Per-keypoint map-point id (-1 none) from match lists."""
    safe_kp = jnp.where(ok, jnp.clip(kp_idx, 0, n_kps - 1), n_kps)
    out = jnp.full((n_kps + 1,), -1, jnp.int32)
    return out.at[safe_kp].set(jnp.where(ok, mp_ids, -1))[:n_kps]


@partial(jax.jit, static_argnames=("n_window", "n_points", "n_obs"))
def gather_ba_problem(
    cam: CameraParams,
    state: MapState,
    window_kfs: jnp.ndarray,  # (n_window,) global slots, -1 padded
    window_fixed: jnp.ndarray,  # (n_window,) bool
    mp_ids: jnp.ndarray,  # (n_points,) local point ids, -1 padded
    n_window: int,
    n_points: int,
    n_obs: int,
    scale_factor: float = 1.2,
) -> BAProblem:
    """Assemble a static-shape BAProblem from the map."""
    K_total, N = state.kf_mp.shape
    M_total, P = state.mp_obs_kf.shape

    kf_safe = jnp.clip(window_kfs, 0, K_total - 1)
    poses = SE3(state.kf_R[kf_safe], state.kf_t[kf_safe])
    kf_alive = (window_kfs >= 0) & state.kf_valid[kf_safe]
    fixed = window_fixed | ~kf_alive

    # global slot -> window index lookup. NB: -1-padded window rows clip to
    # slot 0, so they scatter to the same index as a real slot-0 entry; a
    # plain .set would nondeterministically clobber the anchor keyframe's
    # window index (dropping all its observations and letting the window
    # rotate off the gauge). max-scatter is collision-safe because live
    # window slots are unique and pads contribute -1.
    slot_of = jnp.full((K_total,), -1, jnp.int32)
    widx = jnp.arange(n_window, dtype=jnp.int32)
    slot_of = slot_of.at[kf_safe].max(jnp.where(kf_alive, widx, -1))

    ids_safe = jnp.clip(mp_ids, 0, M_total - 1)
    pts = state.mp_pos[ids_safe]
    pt_valid = (mp_ids >= 0) & state.mp_valid[ids_safe]

    obs_kf = state.mp_obs_kf[ids_safe][:, :n_obs]  # (n_points, n_obs)
    obs_idx = state.mp_obs_idx[ids_safe][:, :n_obs]
    obs_has = obs_kf >= 0
    okf_safe = jnp.clip(obs_kf, 0, K_total - 1)
    oidx_safe = jnp.clip(obs_idx, 0, N - 1)
    w_slot = slot_of[okf_safe]  # (n_points, n_obs) window index or -1
    in_window = (w_slot >= 0) & obs_has

    uv = state.kf_xy[okf_safe, oidx_safe]
    ur = state.kf_uright[okf_safe, oidx_safe]
    lvl = state.kf_level[okf_safe, oidx_safe]
    stereo = ur > 0
    uvr = jnp.concatenate([uv, jnp.where(stereo, ur, 0.0)[..., None]], axis=-1)
    sigma2 = scale_factor ** (2.0 * lvl.astype(jnp.float32))

    return BAProblem(
        poses=poses,
        fixed=fixed,
        points=pts,
        point_valid=pt_valid,
        obs_cam=jnp.where(in_window, w_slot, 0).astype(jnp.int32),
        obs_uvr=uvr,
        obs_stereo=stereo,
        obs_sigma2=sigma2,
        obs_mask=in_window & pt_valid[:, None],
    )


@jax.jit
def scatter_ba_result(
    state: MapState,
    window_kfs: jnp.ndarray,
    window_fixed: jnp.ndarray,
    mp_ids: jnp.ndarray,
    poses: SE3,
    points: jnp.ndarray,
) -> MapState:
    """Write optimized poses/points back into the map.

    Non-updated rows scatter to an out-of-bounds index with mode='drop'
    (a clipped pad index would collide with slot/point 0 and
    nondeterministically overwrite its update with a stale value)."""
    K_total = state.kf_R.shape[0]
    M_total = state.mp_pos.shape[0]
    upd = (window_kfs >= 0) & ~window_fixed
    kf_idx = jnp.where(upd, window_kfs, K_total)
    new_R = state.kf_R.at[kf_idx].set(poses.R, mode="drop")
    new_t = state.kf_t.at[kf_idx].set(poses.t, mode="drop")
    ids_safe = jnp.clip(mp_ids, 0, M_total - 1)
    updp = (mp_ids >= 0) & state.mp_valid[ids_safe]
    mp_idx = jnp.where(updp, mp_ids, M_total)
    new_pos = state.mp_pos.at[mp_idx].set(points, mode="drop")
    return state._replace(kf_R=new_R, kf_t=new_t, mp_pos=new_pos)


@partial(jax.jit, static_argnames=("max_fuse", "n_levels", "radius",
                                  "th_low", "scale_factor", "width",
                                  "height"))
def fuse_pair_dir(
    cam: CameraParams,
    state: MapState,
    kf_a: jnp.ndarray,
    kf_b: jnp.ndarray,
    alive: jnp.ndarray,
    width: float,
    height: float,
    max_fuse: int = 96,
    radius: float = 3.0,
    th_low: int = 50,
    scale_factor: float = 1.2,
    n_levels: int = 8,
) -> MapState:
    """One direction of SearchInNeighbors (localmapping.cpp:722 +
    FMatcher::Fuse fmatcher.cpp:1918): project keyframe a's map points
    into keyframe b; a match onto a free keypoint becomes a new
    observation, a match onto a keypoint holding a different point merges
    the two (the point with more observations survives)."""
    from vi_slam_tpu.slam_map import state as sm

    K, N = state.kf_mp.shape
    M, _ = state.mp_obs_kf.shape
    mp = state.kf_mp[kf_a]  # (N,)
    safe = jnp.clip(mp, 0, M - 1)
    has = (mp >= 0) & alive & state.mp_valid[safe]
    pos = state.mp_pos[safe]
    desc = state.mp_desc[safe]
    maxd = state.mp_max_dist[safe]

    Tb = SE3(state.kf_R[kf_b], state.kf_t[kf_b])
    pc = Tb.apply(pos)
    z = pc[..., 2]
    uv = camlib.project(cam, pc)
    in_img = (
        (uv[..., 0] >= 0) & (uv[..., 0] < width)
        & (uv[..., 1] >= 0) & (uv[..., 1] < height) & (z > 0.1)
    )
    cb = Tb.inverse().t
    dist = jnp.linalg.norm(pos - cb, axis=-1)
    ratio_d = jnp.maximum(maxd / jnp.maximum(dist, 1e-6), 1e-6)
    level = jnp.clip(
        jnp.ceil(jnp.log(ratio_d) / np.log(scale_factor)).astype(jnp.int32),
        0, n_levels - 1,
    )
    valid = has & in_img

    level_scales = scale_factor ** jnp.arange(n_levels, dtype=uv.dtype)
    m = match_ops.search_by_projection(
        uv, level, desc, valid,
        state.kf_xy[kf_b], state.kf_level[kf_b], state.kf_desc[kf_b],
        state.kf_kp_valid[kf_b],
        radius=radius, level_scales=level_scales,
        max_dist=th_low, ratio=0.95,
    )
    m = match_ops.resolve_duplicate_targets(m, N)
    kp = jnp.clip(m.idx, 0, N - 1)
    q = state.kf_mp[kf_b, kp]  # point already held by the matched keypoint
    # stale links (culling clears only a recent window) point at dead
    # ids: treat them as free keypoints
    q = jnp.where(
        (q >= 0) & state.mp_valid[jnp.clip(q, 0, M - 1)], q, -1
    )
    okm = m.ok & valid
    # stereo right-coordinate consistency (Fuse's 3D residual for stereo
    # keypoints, fmatcher.cpp:1970 e=(u,v,ur) chi2 7.8): a projected point
    # whose predicted disparity disagrees with the matched keypoint's
    # measured u_r is a different physical point. The gate protects the
    # IRREVERSIBLE merge decision only — new observations stay gated by
    # the (radius, level, descriptor) window, because a freshly
    # triangulated point's depth noise alone can exceed the disparity
    # window and starving points of observations weakens the whole covis
    # graph (measured: gating case 1 too halves tracked inliers).
    ur_kp = state.kf_uright[kf_b, kp]
    ur_pred = uv[:, 0] - cam.bf / jnp.maximum(z, 1e-6)
    r_eff = radius * level_scales[jnp.clip(level, 0, n_levels - 1)]
    ur_ok = (ur_kp <= 0) | (jnp.abs(ur_pred - ur_kp) <= r_eff)

    # case 1: free keypoint -> new observation of p, unless p is already
    # observed by kf_b at another keypoint (Fuse's pMP->IsInKeyFrame(pKF)
    # guard, fmatcher.cpp:1970 — without it every pass would stack
    # duplicate (point, keyframe) observations)
    already_in_b = jnp.any(state.mp_obs_kf[safe] == kf_b, axis=1)
    free = okm & (q < 0) & ~already_in_b
    state = sm.register_obs(
        state, jnp.where(free, mp, -1), kf_b, kp, free
    )

    # case 2: duplicate -> merge into the point with more observations
    dup = okm & ur_ok & (q >= 0) & (q != mp)
    q_safe = jnp.clip(q, 0, M - 1)
    p_wins = state.mp_n_obs[safe] >= state.mp_n_obs[q_safe]
    winner = jnp.where(p_wins, mp, q)
    loser = jnp.where(p_wins, q, mp)
    # budget: strongest (lowest-distance) pairs first
    sel_score = jnp.where(dup, -m.dist.astype(jnp.float32), -jnp.inf)
    _, sel = jax.lax.top_k(sel_score, max_fuse)
    sel = sel.astype(jnp.int32)
    dup_sel = dup[sel] & jnp.isfinite(sel_score[sel])
    state = sm.fuse_points(state, loser[sel], winner[sel], dup_sel)
    # refresh winner statistics (normal / distinctive descriptor)
    state = sm.update_point_stats(
        state, jnp.where(dup_sel, winner[sel], M - 1)
    )
    return state


@partial(jax.jit, static_argnames=("n_window", "max_fuse", "n_levels",
                                  "radius", "th_low", "scale_factor",
                                  "width", "height"),
         donate_argnums=(1,))
def fuse_neighbors(
    cam: CameraParams,
    state: MapState,
    ref_slot: jnp.ndarray,
    width: float,
    height: float,
    n_window: int = 4,
    max_fuse: int = 96,
    radius: float = 3.0,
    th_low: int = 50,
    scale_factor: float = 1.2,
    n_levels: int = 8,
) -> MapState:
    """SearchInNeighbors for the newest keyframe: fuse both directions
    against its best covisible neighbors (localmapping.cpp:722)."""
    window = covis_window(state, ref_slot, n_window)

    def body(i, st):
        nb = window[i]
        al = nb >= 0
        nb = jnp.clip(nb, 0, st.kf_mp.shape[0] - 1)
        st = fuse_pair_dir(
            cam, st, ref_slot, nb, al, width, height, max_fuse=max_fuse,
            radius=radius, th_low=th_low, scale_factor=scale_factor,
            n_levels=n_levels,
        )
        st = fuse_pair_dir(
            cam, st, nb, ref_slot, al, width, height, max_fuse=max_fuse,
            radius=radius, th_low=th_low, scale_factor=scale_factor,
            n_levels=n_levels,
        )
        return st

    return jax.lax.fori_loop(1, n_window, body, state)


@jax.jit
def gather_global_ba_problem(cam: CameraParams, state: MapState,
                             scale_factor: float = 1.2) -> BAProblem:
    """Whole-map BAProblem: every valid keyframe is a camera (global slot
    index == camera index), every valid point a landmark, observations
    straight from the incidence arrays (GlobalBundleAdjustemnt setup,
    optimizer.cpp:34-380). Slot 0 (the origin keyframe) is fixed."""
    K, N = state.kf_mp.shape
    M, P = state.mp_obs_kf.shape
    poses = SE3(state.kf_R, state.kf_t)
    fixed = ~state.kf_valid
    fixed = fixed.at[0].set(True)

    obs_kf = state.mp_obs_kf
    obs_idx = state.mp_obs_idx
    okf_safe = jnp.clip(obs_kf, 0, K - 1)
    oidx_safe = jnp.clip(obs_idx, 0, N - 1)
    obs_has = (obs_kf >= 0) & state.kf_valid[okf_safe]

    uv = state.kf_xy[okf_safe, oidx_safe]
    ur = state.kf_uright[okf_safe, oidx_safe]
    lvl = state.kf_level[okf_safe, oidx_safe]
    stereo = ur > 0
    uvr = jnp.concatenate([uv, jnp.where(stereo, ur, 0.0)[..., None]], axis=-1)
    sigma2 = scale_factor ** (2.0 * lvl.astype(jnp.float32))

    return BAProblem(
        poses=poses,
        fixed=fixed,
        points=state.mp_pos,
        point_valid=state.mp_valid,
        obs_cam=jnp.where(obs_has, okf_safe, 0).astype(jnp.int32),
        obs_uvr=uvr,
        obs_stereo=stereo,
        obs_sigma2=sigma2,
        obs_mask=obs_has & state.mp_valid[:, None],
    )


@jax.jit
def scatter_global_ba_result(
    state: MapState, poses: SE3, points: jnp.ndarray
) -> MapState:
    """Write whole-map BA results back (valid, non-fixed rows only)."""
    upd_kf = state.kf_valid.at[0].set(False)
    new_R = jnp.where(upd_kf[:, None, None], poses.R, state.kf_R)
    new_t = jnp.where(upd_kf[:, None], poses.t, state.kf_t)
    new_pos = jnp.where(state.mp_valid[:, None], points, state.mp_pos)
    return state._replace(kf_R=new_R, kf_t=new_t, mp_pos=new_pos)


class TriangulationCandidates(NamedTuple):
    """Output of match_and_triangulate: fixed-capacity new-point batch."""

    kp_new: jnp.ndarray  # (C,) keypoint index in the new KF
    kp_ref: jnp.ndarray  # (C,) keypoint index in the reference KF
    pos: jnp.ndarray  # (C, 3) world positions
    desc: jnp.ndarray  # (C, 8) descriptors (from the new KF)
    normal: jnp.ndarray  # (C, 3)
    min_dist: jnp.ndarray  # (C,)
    max_dist: jnp.ndarray  # (C,)
    create: jnp.ndarray  # (C,) bool


@partial(jax.jit, static_argnames=("max_new", "n_levels"))
def match_and_triangulate(
    cam: CameraParams,
    state: MapState,
    kf_new: jnp.ndarray,
    kf_ref: jnp.ndarray,
    max_new: int,
    th_low: int = 50,
    ratio: float = 0.8,
    scale_factor: float = 1.2,
    n_levels: int = 8,
) -> TriangulationCandidates:
    """Epipolar-constrained matching of *unmatched* keypoints between two
    keyframes + DLT triangulation — the monocular new-point path
    (`LocalMapping::CreateNewMapPoints` localmapping.cpp:363 +
    `FMatcher::SearchForTriangulation` fmatcher.cpp:1242 semantics).

    The BoW-node pruning of the reference becomes a full MXU Hamming
    matrix; the epipolar constraint and cheirality/parallax/reprojection
    gates are vectorized masks.
    """
    from vi_slam_tpu.geometry.epipolar import fundamental_from_poses
    from vi_slam_tpu.geometry.triangulate import triangulate_dlt
    from vi_slam_tpu.ops.hamming import hamming_matrix

    N = state.kf_mp.shape[1]
    d_new = state.kf_desc[kf_new]
    d_ref = state.kf_desc[kf_ref]
    free_new = state.kf_kp_valid[kf_new] & (state.kf_mp[kf_new] < 0)
    free_ref = state.kf_kp_valid[kf_ref] & (state.kf_mp[kf_ref] < 0)

    T_new = SE3(state.kf_R[kf_new], state.kf_t[kf_new])
    T_ref = SE3(state.kf_R[kf_ref], state.kf_t[kf_ref])

    D = hamming_matrix(d_new, d_ref).astype(jnp.float32)
    big = 1e9
    D = jnp.where(free_new[:, None] & free_ref[None, :], D, big)

    # epipolar gate: distance of ref keypoint to the epiline of the new kp
    Kmat = jnp.asarray(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]],
        state.kf_xy.dtype,
    )
    F = fundamental_from_poses(T_new, T_ref, Kmat, Kmat)  # x_new^T F x_ref = 0
    uv_new = state.kf_xy[kf_new]
    uv_ref = state.kf_xy[kf_ref]
    x1h = jnp.concatenate([uv_new, jnp.ones((N, 1), uv_new.dtype)], axis=-1)
    x2h = jnp.concatenate([uv_ref, jnp.ones((N, 1), uv_ref.dtype)], axis=-1)
    lines = x1h @ F  # row i = (F^T x1_i)^T — epiline of new kp i in ref image
    # d(line_i, kp_j)^2 for all pairs
    l_norm = jnp.maximum(lines[:, 0] ** 2 + lines[:, 1] ** 2, 1e-12)  # (N,)
    dot = lines @ x2h.T  # (N_new, N_ref)
    epi_d2 = dot * dot / l_norm[:, None]
    sigma2_ref = scale_factor ** (
        2.0 * state.kf_level[kf_ref].astype(jnp.float32)
    )
    epi_ok = epi_d2 < 3.84 * sigma2_ref[None, :]
    D = jnp.where(epi_ok, D, big)

    j_best = jnp.argmin(D, axis=1)
    d_best = jnp.min(D, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1)
    D2 = jnp.where(cols == j_best[:, None], big, D)
    d_second = jnp.min(D2, axis=1)
    i_best_of_j = jnp.argmin(D, axis=0)
    mutual = i_best_of_j[j_best] == jnp.arange(N)
    good = (d_best < th_low) & (d_best < ratio * d_second) & mutual & free_new

    # triangulate from model-dispatched bearings (pinhole OR KB8; the
    # epipolar F gate above stays linear — approximate off-center for
    # fisheye, with the dispatched reprojection gates below as the
    # correctness backstop)
    kp_ref_idx = j_best.astype(jnp.int32)
    b_new = camlib.unproject(cam, uv_new)
    uv_r = uv_ref[kp_ref_idx]
    b_ref = camlib.unproject(cam, uv_r)

    # ray parallax from the BEARINGS (pre-triangulation), exactly like
    # CreateNewMapPoints (localmapping.cpp:363: cosParallaxRays between
    # Rwc1*xn1 and Rwc2*xn2); a DLT solve from near-parallel rays is
    # noise-amplifying, so low-parallax pairs must fall back to stereo
    # depth or be skipped
    ray_new_w = jnp.einsum("ji,nj->ni", T_new.R, b_new)  # Rwc = Rcw^T
    ray_ref_w = jnp.einsum("ji,nj->ni", T_ref.R, b_ref)
    cos_rays = jnp.sum(ray_new_w * ray_ref_w, axis=-1) / jnp.maximum(
        jnp.linalg.norm(ray_new_w, axis=-1)
        * jnp.linalg.norm(ray_ref_w, axis=-1),
        1e-12,
    )
    # stereo-implied parallax: cos(2*atan2(b/2, z)) per kp with stereo
    # depth; 1.1 (= "worse than any ray parallax") when mono/no depth
    baseline = cam.bf / cam.fx
    d_new_st = state.kf_depth[kf_new]
    d_ref_st = state.kf_depth[kf_ref][kp_ref_idx]
    has_st_new = d_new_st > 0
    has_st_ref = d_ref_st > 0
    cos_st_new = jnp.where(
        has_st_new,
        jnp.cos(2.0 * jnp.arctan2(baseline / 2.0, jnp.maximum(d_new_st, 1e-6))),
        1.1,
    )
    cos_st_ref = jnp.where(
        has_st_ref,
        jnp.cos(2.0 * jnp.arctan2(baseline / 2.0, jnp.maximum(d_ref_st, 1e-6))),
        1.1,
    )
    cos_st = jnp.minimum(cos_st_new, cos_st_ref)

    tri_ok = (cos_rays < cos_st) & (cos_rays > 0) & (cos_rays < 0.9998)
    xw_dlt = triangulate_dlt(T_new, T_ref, b_new, b_ref)
    Twc_new = T_new.inverse()
    Twc_ref = T_ref.inverse()
    xw_st_new = Twc_new.apply(b_new * d_new_st[:, None])
    xw_st_ref = Twc_ref.apply(b_ref * d_ref_st[:, None])
    use_st_new = ~tri_ok & has_st_new & (cos_st_new < cos_st_ref)
    use_st_ref = ~tri_ok & ~use_st_new & has_st_ref
    xw = jnp.where(
        use_st_new[:, None],
        xw_st_new,
        jnp.where(use_st_ref[:, None], xw_st_ref, xw_dlt),
    )
    good = good & (tri_ok | use_st_new | use_st_ref)

    pc_new = T_new.apply(xw)
    pc_ref = T_ref.apply(xw)
    z_new, z_ref = pc_new[:, 2], pc_ref[:, 2]
    c_new = Twc_new.t
    c_ref = Twc_ref.t

    # reprojection gates: 5.991*sigma2 mono rows, 7.815*sigma2 with the
    # stereo right-coordinate residual added (CreateNewMapPoints chi2)
    lvl_new = state.kf_level[kf_new].astype(jnp.float32)
    sig2_new = scale_factor ** (2.0 * lvl_new)
    pr_new = camlib.project(cam, pc_new)
    pr_ref = camlib.project(cam, pc_ref)
    ur_new = state.kf_uright[kf_new]
    ur_ref = state.kf_uright[kf_ref][kp_ref_idx]
    e_new = jnp.sum((pr_new - uv_new) ** 2, axis=-1)
    e_ref = jnp.sum((pr_ref - uv_r) ** 2, axis=-1)
    ur_pred_new = pr_new[:, 0] - cam.bf / jnp.maximum(z_new, 1e-6)
    ur_pred_ref = pr_ref[:, 0] - cam.bf / jnp.maximum(z_ref, 1e-6)
    e_new3 = e_new + (ur_pred_new - ur_new) ** 2
    e_ref3 = e_ref + (ur_pred_ref - ur_ref) ** 2
    sig2_ref_m = sigma2_ref[kp_ref_idx]
    gate_new = jnp.where(
        ur_new > 0, e_new3 < 7.815 * sig2_new, e_new < 5.991 * sig2_new
    )
    gate_ref = jnp.where(
        ur_ref > 0, e_ref3 < 7.815 * sig2_ref_m, e_ref < 5.991 * sig2_ref_m
    )
    good = good & (z_new > 0.05) & (z_ref > 0.05) & gate_new & gate_ref

    # scale-consistency (CreateNewMapPoints ratioDist/ratioOctave gate):
    # the distance ratio between the two views must agree with the octave
    # ratio within ratioFactor = 1.5*scale
    dist_new_all = jnp.linalg.norm(xw - c_new[None, :], axis=-1)
    dist_ref_all = jnp.linalg.norm(xw - c_ref[None, :], axis=-1)
    ratio_dist = dist_ref_all / jnp.maximum(dist_new_all, 1e-9)
    lvl_ref = state.kf_level[kf_ref].astype(jnp.float32)[kp_ref_idx]
    ratio_octave = scale_factor ** (lvl_new - lvl_ref)
    ratio_factor = 1.5 * scale_factor
    good = (
        good
        & (dist_new_all > 1e-6)
        & (dist_ref_all > 1e-6)
        & (ratio_dist * ratio_factor > ratio_octave)
        & (ratio_dist < ratio_octave * ratio_factor)
    )

    # select up to max_new best (lowest descriptor distance)
    sel_score = jnp.where(good, -d_best, -big)
    _, sel = jax.lax.top_k(sel_score, max_new)
    sel = sel.astype(jnp.int32)
    create = good[sel]

    dist = jnp.linalg.norm(xw[sel] - c_new[None, :], axis=-1)
    lvl = state.kf_level[kf_new][sel].astype(jnp.float32)
    max_dist = dist * scale_factor ** lvl
    min_dist = max_dist / scale_factor ** (n_levels - 1)
    ray = xw[sel] - c_new[None, :]
    normal = ray / jnp.maximum(
        jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-9
    )
    return TriangulationCandidates(
        kp_new=sel,
        kp_ref=kp_ref_idx[sel],
        pos=xw[sel],
        desc=state.kf_desc[kf_new][sel],
        normal=normal,
        min_dist=min_dist,
        max_dist=max_dist,
        create=create,
    )
