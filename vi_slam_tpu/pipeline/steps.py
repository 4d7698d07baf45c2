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
from vi_slam_tpu.cameras import pinhole
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
    # Prefer the NEWEST points when the capacity cap truncates: unique()
    # keeps the smallest values, so sort on (M - id); invalid slots map past
    # the end and sort last.
    key = jnp.where(flat >= 0, M - flat, M + 1)
    uniq = jnp.unique(key, size=n_local, fill_value=M + 1)
    ids = jnp.where(uniq <= M, M - uniq, -1)
    return ids, ids >= 0


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
    uv = pinhole.project(cam, pc)
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

    # global slot -> window index lookup
    slot_of = jnp.full((K_total,), -1, jnp.int32)
    widx = jnp.arange(n_window, dtype=jnp.int32)
    slot_of = slot_of.at[kf_safe].set(jnp.where(kf_alive, widx, -1))

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
    """Write optimized poses/points back into the map."""
    K_total = state.kf_R.shape[0]
    M_total = state.mp_pos.shape[0]
    kf_safe = jnp.clip(window_kfs, 0, K_total - 1)
    upd = (window_kfs >= 0) & ~window_fixed
    new_R = state.kf_R.at[kf_safe].set(
        jnp.where(upd[:, None, None], poses.R, state.kf_R[kf_safe])
    )
    new_t = state.kf_t.at[kf_safe].set(
        jnp.where(upd[:, None], poses.t, state.kf_t[kf_safe])
    )
    ids_safe = jnp.clip(mp_ids, 0, M_total - 1)
    updp = (mp_ids >= 0) & state.mp_valid[ids_safe]
    new_pos = state.mp_pos.at[ids_safe].set(
        jnp.where(updp[:, None], points, state.mp_pos[ids_safe])
    )
    return state._replace(kf_R=new_R, kf_t=new_t, mp_pos=new_pos)
