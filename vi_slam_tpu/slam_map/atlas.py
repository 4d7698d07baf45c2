"""Atlas: multi-map management and map merging.

Semantic reference: `Atlas` (`/root/reference/src/datastructures/atlas.cpp:45`
CreateNewMap / ChangeMap / SetMapBad) and the merge path of LoopClosing
(`/root/reference/src/core/loopclosing.cpp:1021` MergeLocal: compute the
Sim3 welding transform from a cross-map common-region detection, transform
the active map into the matched map's frame, move keyframes/points over,
fuse seam duplicates, then welding bundle adjustment /
MergeBundleAdjustmentVisual `optimizer.cpp:5030`).

TPU redesign: each map is one fixed-capacity `MapState` pytree, so
"moving" the active map into a stored map is a single jitted append
kernel (`merge_into`): keyframe slots shift by a constant offset,
map-point ids shift by another, and the Sim3 weld is applied to the
copied poses/points in the same pass — no pointer surgery. Cross-map
common-region detection reuses the MXU Hamming matcher and the vmapped
Sim3 RANSAC on a *pair of* map states.

The host `StereoVO` pipeline owns the fork/merge policy (when to call
these); this module owns the device kernels and the verification driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.lie.sim3 import Sim3
from vi_slam_tpu.loop.sim3_solver import sim3_ransac
from vi_slam_tpu.ops.hamming import hamming_matrix
from vi_slam_tpu.optim.sim3_opt import optimize_sim3
from vi_slam_tpu.slam_map.state import MapState


@dataclass
class StoredMap:
    """A non-active map parked in the Atlas (atlas.h mspMaps entry)."""

    map: MapState
    n_kf: int
    n_mp: int
    map_id: int
    db: Any = None  # KeyFrameDatabase of this map (place recognition)
    covis: Any = None  # native CovisGraph
    loop_edges: List[Tuple[int, int]] = field(default_factory=list)
    culled_parent: Dict[int, Tuple[int, np.ndarray]] = field(
        default_factory=dict
    )
    # inertial sidecar (IMU maps only): preintegration chain, per-KF
    # velocities, biases, gravity, chain bookkeeping — parked with the
    # map so an inertial merge (MergeLocal2/MergeInertialBA semantics,
    # loopclosing.cpp:1021, optimizer.cpp:6129) can weld them back
    inertial: Optional[Dict[str, Any]] = None


@jax.jit
def merge_into(
    dst: MapState, src: MapState, S: Sim3,
    kf_offset: jnp.ndarray, mp_offset: jnp.ndarray,
) -> MapState:
    """Append every allocated keyframe/map point of `src` into `dst`,
    transforming src coordinates from src-world into dst-world by the
    Sim3 weld `S` (x_dst = S(x_src)).

    Keyframe slot k of src lands at kf_offset + k; map-point id m lands
    at mp_offset + m — the constant-offset relabeling that replaces the
    reference's per-object UpdateMap/ChangeMap pointer rewrites
    (atlas.cpp, loopclosing.cpp:1219-1303). Rows that would overflow
    capacity are dropped (the host checks capacity before calling).
    Culled src slots stay invalid but keep their relabeled slot so the
    host's spanning-tree records stay consistent.
    """
    K, N = dst.kf_mp.shape
    M, P = dst.mp_obs_kf.shape
    src_nkf = src.kf_count[0]
    src_nmp = src.mp_count[0]
    dt = dst.kf_t.dtype
    S = Sim3(S.R.astype(dt), S.t.astype(dt), S.s.astype(dt))
    Sinv = S.inverse()

    # --- keyframes: Tcw' = SE3 part of (Tcw_src ∘ S^-1), the Sim3->SE3
    # conversion of CorrectLoop/MergeLocal (loopclosing.cpp:905)
    ones = jnp.ones((K,), dst.kf_t.dtype)
    G = Sim3(src.kf_R, src.kf_t, ones).compose(Sinv)
    new_R = G.R
    new_t = G.t / jnp.maximum(G.s, 1e-12)[:, None]

    k = jnp.arange(K, dtype=jnp.int32)
    copy_kf = k < src_nkf
    dst_k = jnp.where(copy_kf & (kf_offset + k < K), kf_offset + k, K)
    mp_shift = jnp.where(src.kf_mp >= 0, src.kf_mp + mp_offset, -1)

    st = dst._replace(
        kf_R=dst.kf_R.at[dst_k].set(new_R, mode="drop"),
        kf_t=dst.kf_t.at[dst_k].set(new_t, mode="drop"),
        kf_valid=dst.kf_valid.at[dst_k].set(src.kf_valid, mode="drop"),
        kf_frame_id=dst.kf_frame_id.at[dst_k].set(
            src.kf_frame_id, mode="drop"
        ),
        kf_timestamp=dst.kf_timestamp.at[dst_k].set(
            src.kf_timestamp, mode="drop"
        ),
        kf_xy=dst.kf_xy.at[dst_k].set(src.kf_xy, mode="drop"),
        kf_level=dst.kf_level.at[dst_k].set(src.kf_level, mode="drop"),
        kf_angle=dst.kf_angle.at[dst_k].set(src.kf_angle, mode="drop"),
        kf_desc=dst.kf_desc.at[dst_k].set(src.kf_desc, mode="drop"),
        kf_uright=dst.kf_uright.at[dst_k].set(src.kf_uright, mode="drop"),
        kf_depth=dst.kf_depth.at[dst_k].set(src.kf_depth, mode="drop"),
        kf_kp_valid=dst.kf_kp_valid.at[dst_k].set(
            src.kf_kp_valid, mode="drop"
        ),
        kf_mp=dst.kf_mp.at[dst_k].set(mp_shift, mode="drop"),
    )

    # --- map points: x' = S(x), normals rotate, scale range scales
    pos_new = S.apply(src.mp_pos)
    normal_new = jnp.einsum("ij,mj->mi", S.R, src.mp_normal)
    m = jnp.arange(M, dtype=jnp.int32)
    copy_mp = m < src_nmp
    dst_m = jnp.where(copy_mp & (mp_offset + m < M), mp_offset + m, M)
    kf_shift = lambda a: jnp.where(a >= 0, a + kf_offset, -1)

    st = st._replace(
        mp_pos=st.mp_pos.at[dst_m].set(pos_new, mode="drop"),
        mp_valid=st.mp_valid.at[dst_m].set(src.mp_valid, mode="drop"),
        mp_desc=st.mp_desc.at[dst_m].set(src.mp_desc, mode="drop"),
        mp_normal=st.mp_normal.at[dst_m].set(normal_new, mode="drop"),
        mp_min_dist=st.mp_min_dist.at[dst_m].set(
            src.mp_min_dist * S.s, mode="drop"
        ),
        mp_max_dist=st.mp_max_dist.at[dst_m].set(
            src.mp_max_dist * S.s, mode="drop"
        ),
        mp_ref_kf=st.mp_ref_kf.at[dst_m].set(
            kf_shift(src.mp_ref_kf), mode="drop"
        ),
        mp_first_kf=st.mp_first_kf.at[dst_m].set(
            kf_shift(src.mp_first_kf), mode="drop"
        ),
        mp_obs_kf=st.mp_obs_kf.at[dst_m].set(
            kf_shift(src.mp_obs_kf), mode="drop"
        ),
        mp_obs_idx=st.mp_obs_idx.at[dst_m].set(
            src.mp_obs_idx, mode="drop"
        ),
        mp_n_obs=st.mp_n_obs.at[dst_m].set(src.mp_n_obs, mode="drop"),
        mp_count=(mp_offset + src_nmp)[None].astype(jnp.int32),
        kf_count=(kf_offset + src_nkf)[None].astype(jnp.int32),
    )
    return st


@jax.jit
def _match_cross(
    state_a: MapState, kf_a: jnp.ndarray,
    state_b: MapState, kf_b: jnp.ndarray,
    th: float = 50.0, ratio: float = 0.75,
):
    """Mutual-best Hamming matching between map-point keypoints of one KF
    in each of TWO maps (the cross-map SearchByBoW of
    DetectCommonRegionsFromBoW, loopclosing.cpp:491, applied across
    Atlas maps). Returns (kp_a, kp_b, mp_a, mp_b, valid) full-length-N
    arrays ranked by distance."""
    da = state_a.kf_desc[kf_a]
    db = state_b.kf_desc[kf_b]
    mp_a = state_a.kf_mp[kf_a]
    mp_b = state_b.kf_mp[kf_b]
    Ma = state_a.mp_pos.shape[0]
    Mb = state_b.mp_pos.shape[0]
    ok_a = state_a.kf_kp_valid[kf_a] & (mp_a >= 0)
    ok_a &= state_a.mp_valid[jnp.clip(mp_a, 0, Ma - 1)]
    ok_b = state_b.kf_kp_valid[kf_b] & (mp_b >= 0)
    ok_b &= state_b.mp_valid[jnp.clip(mp_b, 0, Mb - 1)]
    D = hamming_matrix(da, db).astype(jnp.float32)
    big = 1e9
    D = jnp.where(ok_a[:, None] & ok_b[None, :], D, big)
    j_best = jnp.argmin(D, axis=1)
    d_best = jnp.min(D, axis=1)
    n = D.shape[0]
    D2 = D.at[jnp.arange(n), j_best].set(big)
    d_second = jnp.min(D2, axis=1)
    mutual = jnp.argmin(D, axis=0)[j_best] == jnp.arange(n)
    good = (d_best < th) & (d_best < ratio * d_second) & mutual & ok_a
    kp_a = jnp.arange(n, dtype=jnp.int32)
    kp_b = j_best.astype(jnp.int32)
    return kp_a, kp_b, mp_a, mp_b[kp_b], good


@jax.jit
def _cross_geometry(
    state_a: MapState, kf_a: jnp.ndarray,
    state_b: MapState, kf_b: jnp.ndarray,
    kp_a: jnp.ndarray, kp_b: jnp.ndarray,
    mp_a: jnp.ndarray, mp_b: jnp.ndarray, valid: jnp.ndarray,
):
    """Sim3Solver inputs for cross-map pairs: camera-frame points, pixel
    measurements, pyramid variances (sim3solver.cpp contract)."""
    Ma = state_a.mp_pos.shape[0]
    Mb = state_b.mp_pos.shape[0]
    xa_w = state_a.mp_pos[jnp.clip(mp_a, 0, Ma - 1)]
    xb_w = state_b.mp_pos[jnp.clip(mp_b, 0, Mb - 1)]
    Ta = SE3(state_a.kf_R[kf_a], state_a.kf_t[kf_a])
    Tb = SE3(state_b.kf_R[kf_b], state_b.kf_t[kf_b])
    x1 = Ta.apply(xa_w)
    x2 = Tb.apply(xb_w)
    uv1 = state_a.kf_xy[kf_a, kp_a]
    uv2 = state_b.kf_xy[kf_b, kp_b]
    s1 = 1.2 ** (2.0 * state_a.kf_level[kf_a, kp_a].astype(jnp.float32))
    s2 = 1.2 ** (2.0 * state_b.kf_level[kf_b, kp_b].astype(jnp.float32))
    return x1, x2, uv1, uv2, s1, s2, valid


def verify_merge(
    cam: CameraParams,
    state_cur: MapState, cur: int,
    state_old: MapState, cand: int,
    key: jax.Array,
    min_inliers: int = 20,
    th: int = 50,
    fix_scale: bool = True,
):
    """Cross-map common-region verification: descriptor matching + Sim3
    RANSAC + Sim3 GN (NewDetectCommonRegions loopclosing.cpp:302 geometric
    half). Returns (ok, S_cl, (mp_cur, mp_old, inlier_mask)) with S_cl the
    Sim3 mapping cand-camera coordinates to cur-camera coordinates."""
    kp_a, kp_b, mp_a, mp_b, valid = _match_cross(
        state_cur, jnp.int32(cur), state_old, jnp.int32(cand), th=float(th)
    )
    x1, x2, uv1, uv2, s1, s2, valid = _cross_geometry(
        state_cur, jnp.int32(cur), state_old, jnp.int32(cand),
        kp_a, kp_b, mp_a, mp_b, valid,
    )
    if int(jnp.sum(valid)) < min_inliers:
        return False, None, None
    res = sim3_ransac(
        cam, cam, x1, x2, uv1, uv2, valid, s1, s2, key,
        n_hyp=256, fix_scale=fix_scale,
    )
    if int(res.n_inliers) < min_inliers:
        return False, None, None
    opt = optimize_sim3(
        cam, cam, res.S12, x1, x2, uv1, uv2, valid & res.inliers, s1, s2,
        fix_scale=fix_scale,
    )
    if int(opt.n_inliers) < min_inliers:
        return False, None, None
    return True, opt.S12, (mp_a, mp_b, valid & opt.inliers)


def weld_transform(
    S_cl: Sim3, T_cur: SE3, T_cand: SE3, dtype=jnp.float32
) -> Sim3:
    """Sim3 mapping active-map world -> stored-map world given the
    verified camera-to-camera Sim3 S_cl (cur-cam <- cand-cam), the current
    KF pose in the active map and the candidate KF pose in the stored map
    (gSw1/gSw2 algebra of MergeLocal, loopclosing.cpp:1100-1160):
        x_stored = T_cand^-1 ∘ S_cl^-1 ∘ T_cur (x_active)
    """
    one = jnp.ones((), dtype)
    Scur = Sim3(T_cur.R, T_cur.t, one)
    Scand = Sim3(T_cand.R, T_cand.t, one)
    return Scand.inverse().compose(S_cl.inverse()).compose(Scur)
