"""Struct-of-arrays SLAM map: keyframes, map points, observations.

Semantic reference: the reference's pointer-graph map —
`KeyFrame` (`/root/reference/include/vi_slam/datastructures/keyframe.h:44-`,
covisibility :79-93), `MapPoint` (`mappoint.h:25-178`, observations map
:138, distinctive descriptor :160, normal/depth :164-170), `Map`
(`map.h:34-152`) — redesigned as fixed-capacity padded tensors with alive
masks (SURVEY §7.1): culling is a mask clear, graph queries are matmuls
or segment reductions, and the whole map checkpoint is a flat pytree.

Capacities: K keyframes x N keypoints each; M map points with up to P
observations. Slots are allocated monotonically by the host pipeline;
`kf_valid`/`mp_valid` masks define liveness.

Conventions: poses are Tcw (world->camera). `kf_mp[k, i]` is the map-point
id observed by keypoint i of keyframe k (-1 = none). `mp_obs_kf[m, j]` /
`mp_obs_idx[m, j]` are the inverse incidence (-1 = empty slot).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.features.extractor import Features
from vi_slam_tpu.lie.se3 import SE3


class MapState(NamedTuple):
    # --- keyframes ---
    kf_R: jnp.ndarray  # (K, 3, 3) Tcw rotation
    kf_t: jnp.ndarray  # (K, 3)
    kf_valid: jnp.ndarray  # (K,) bool
    kf_frame_id: jnp.ndarray  # (K,) int32 — source frame index
    kf_timestamp: jnp.ndarray  # (K,) float32 (host keeps float64 originals)
    # per-keyframe features
    kf_xy: jnp.ndarray  # (K, N, 2)
    kf_level: jnp.ndarray  # (K, N) int32
    kf_angle: jnp.ndarray  # (K, N)
    kf_desc: jnp.ndarray  # (K, N, 8) uint32
    kf_uright: jnp.ndarray  # (K, N) float32, -1 = mono
    kf_depth: jnp.ndarray  # (K, N) float32, -1 = unknown
    kf_kp_valid: jnp.ndarray  # (K, N) bool
    kf_mp: jnp.ndarray  # (K, N) int32 — map point id or -1
    # --- map points ---
    mp_pos: jnp.ndarray  # (M, 3)
    mp_valid: jnp.ndarray  # (M,) bool
    mp_desc: jnp.ndarray  # (M, 8) uint32 — distinctive descriptor
    mp_normal: jnp.ndarray  # (M, 3) mean viewing direction
    mp_min_dist: jnp.ndarray  # (M,) scale-invariance range
    mp_max_dist: jnp.ndarray  # (M,)
    mp_ref_kf: jnp.ndarray  # (M,) int32
    mp_first_kf: jnp.ndarray  # (M,) int32 (culling bookkeeping)
    mp_obs_kf: jnp.ndarray  # (M, P) int32, -1 empty
    mp_obs_idx: jnp.ndarray  # (M, P) int32
    mp_n_obs: jnp.ndarray  # (M,) int32
    # device-resident allocation cursors: number of map-point ids / KF
    # slots ever allocated. Keeping them on device lets the in-frame
    # keyframe decision + creation chain without a host round trip (the
    # host mirrors refresh from the per-frame packed pull).
    mp_count: jnp.ndarray  # (1,) int32
    kf_count: jnp.ndarray  # (1,) int32

    @property
    def capacity(self) -> Tuple[int, int, int, int]:
        K, N = self.kf_mp.shape
        M, P = self.mp_obs_kf.shape
        return K, N, M, P

    def kf_pose(self, k=None) -> SE3:
        if k is None:
            return SE3(self.kf_R, self.kf_t)
        return SE3(self.kf_R[k], self.kf_t[k])


def allocate(
    max_keyframes: int,
    n_features: int,
    max_points: int,
    max_obs: int,
    dtype=jnp.float32,
) -> MapState:
    K, N, M, P = max_keyframes, n_features, max_points, max_obs
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (K, 3, 3))
    return MapState(
        kf_R=eye,
        kf_t=jnp.zeros((K, 3), dtype),
        kf_valid=jnp.zeros((K,), bool),
        kf_frame_id=jnp.full((K,), -1, jnp.int32),
        kf_timestamp=jnp.zeros((K,), jnp.float32),
        kf_xy=jnp.zeros((K, N, 2), dtype),
        kf_level=jnp.zeros((K, N), jnp.int32),
        kf_angle=jnp.zeros((K, N), dtype),
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_uright=jnp.full((K, N), -1.0, dtype),
        kf_depth=jnp.full((K, N), -1.0, dtype),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_mp=jnp.full((K, N), -1, jnp.int32),
        mp_pos=jnp.zeros((M, 3), dtype),
        mp_valid=jnp.zeros((M,), bool),
        mp_desc=jnp.zeros((M, 8), jnp.uint32),
        mp_normal=jnp.zeros((M, 3), dtype),
        mp_min_dist=jnp.zeros((M,), dtype),
        mp_max_dist=jnp.full((M,), 1e9, dtype),
        mp_ref_kf=jnp.full((M,), -1, jnp.int32),
        mp_first_kf=jnp.full((M,), -1, jnp.int32),
        mp_obs_kf=jnp.full((M, P), -1, jnp.int32),
        mp_obs_idx=jnp.full((M, P), -1, jnp.int32),
        mp_n_obs=jnp.zeros((M,), jnp.int32),
        mp_count=jnp.zeros((1,), jnp.int32),
        kf_count=jnp.zeros((1,), jnp.int32),
    )


@jax.jit
def insert_keyframe(
    state: MapState,
    slot: jnp.ndarray,
    pose: SE3,
    frame_id: jnp.ndarray,
    timestamp: jnp.ndarray,
    feats: Features,
    uright: jnp.ndarray,
    depth: jnp.ndarray,
    mp_ids: jnp.ndarray,
) -> MapState:
    """Write a keyframe into `slot` and register observations for keypoints
    already associated to map points (mp_ids[i] >= 0).

    Mirrors Tracking::CreateNewKeyFrame + KeyFrame construction +
    MapPoint::AddObservation (tracking.cpp:3063, keyframe.cpp,
    mappoint.cpp). Each keypoint maps to at most one distinct map point, so
    the observation scatter is collision-free.
    """
    M, P = state.mp_obs_kf.shape
    state = state._replace(
        kf_R=state.kf_R.at[slot].set(pose.R),
        kf_t=state.kf_t.at[slot].set(pose.t),
        kf_valid=state.kf_valid.at[slot].set(True),
        kf_frame_id=state.kf_frame_id.at[slot].set(frame_id),
        kf_timestamp=state.kf_timestamp.at[slot].set(timestamp),
        kf_xy=state.kf_xy.at[slot].set(feats.xy),
        kf_level=state.kf_level.at[slot].set(feats.level),
        kf_angle=state.kf_angle.at[slot].set(feats.angle),
        kf_desc=state.kf_desc.at[slot].set(feats.desc),
        kf_uright=state.kf_uright.at[slot].set(uright),
        kf_depth=state.kf_depth.at[slot].set(depth),
        kf_kp_valid=state.kf_kp_valid.at[slot].set(feats.valid),
        kf_mp=state.kf_mp.at[slot].set(jnp.where(feats.valid, mp_ids, -1)),
    )
    # add observations mp -> (slot, kp_idx); guard against ids of points
    # culled since the match was computed (async pipeline: the tracking
    # result may be one map version behind)
    has_mp = (mp_ids >= 0) & feats.valid
    has_mp = has_mp & state.mp_valid[jnp.clip(mp_ids, 0, M - 1)]
    # NB: the forward link is kept even when the reverse observation list
    # is at capacity (can_add False below): kf_mp drives matching/covis/
    # fuse ("this keypoint tracks this point"), while mp_obs_* is the
    # capacity-bounded BA measurement list — they legitimately diverge for
    # heavily-observed points.
    state = state._replace(
        kf_mp=state.kf_mp.at[slot].set(jnp.where(has_mp, mp_ids, -1))
    )
    mp_safe = jnp.where(has_mp, mp_ids, M - 1)  # dump row for invalid
    obs_slot = jnp.clip(state.mp_n_obs[mp_safe], 0, P - 1)
    can_add = has_mp & (state.mp_n_obs[mp_safe] < P)
    kp_idx = jnp.arange(mp_ids.shape[0], dtype=jnp.int32)
    write_m = jnp.where(can_add, mp_safe, M - 1)
    # guard the dump row by restoring it afterwards
    dump_kf = state.mp_obs_kf[M - 1]
    dump_idx = state.mp_obs_idx[M - 1]
    new_obs_kf = state.mp_obs_kf.at[write_m, obs_slot].set(
        jnp.where(can_add, slot, state.mp_obs_kf[write_m, obs_slot])
    )
    new_obs_idx = state.mp_obs_idx.at[write_m, obs_slot].set(
        jnp.where(can_add, kp_idx, state.mp_obs_idx[write_m, obs_slot])
    )
    new_obs_kf = new_obs_kf.at[M - 1].set(dump_kf)
    new_obs_idx = new_obs_idx.at[M - 1].set(dump_idx)
    new_n_obs = state.mp_n_obs.at[write_m].add(
        jnp.where(can_add, 1, 0).astype(jnp.int32)
    )
    new_n_obs = new_n_obs.at[M - 1].set(state.mp_n_obs[M - 1])
    return state._replace(
        mp_obs_kf=new_obs_kf,
        mp_obs_idx=new_obs_idx,
        mp_n_obs=new_n_obs,
        kf_count=jnp.maximum(state.kf_count, slot + 1).astype(jnp.int32),
    )


@jax.jit
def create_points(
    state: MapState,
    base_id: jnp.ndarray,
    kf_slot: jnp.ndarray,
    kp_idx: jnp.ndarray,
    pos: jnp.ndarray,
    desc: jnp.ndarray,
    normal: jnp.ndarray,
    min_dist: jnp.ndarray,
    max_dist: jnp.ndarray,
    create: jnp.ndarray,
) -> Tuple[MapState, jnp.ndarray]:
    """Create up to C new map points at contiguous ids starting at base_id.

    kp_idx/pos/desc/...: (C,) arrays describing candidate points observed by
    keyframe `kf_slot` at keypoint kp_idx. `create` masks real candidates.
    Returns (state, mp_ids (C,)) with -1 where not created.

    Mirrors StereoInitialization / CreateNewKeyFrame close-point creation
    (tracking.cpp:2167/:3063) and MapPoint construction.
    """
    M, P = state.mp_obs_kf.shape
    C = kp_idx.shape[0]
    offsets = jnp.cumsum(create.astype(jnp.int32)) - 1
    ids = jnp.where(create, base_id + offsets, -1)
    ids_safe = jnp.where(create, ids, M - 1)

    dump = {
        "pos": state.mp_pos[M - 1],
        "valid": state.mp_valid[M - 1],
        "desc": state.mp_desc[M - 1],
        "normal": state.mp_normal[M - 1],
        "mind": state.mp_min_dist[M - 1],
        "maxd": state.mp_max_dist[M - 1],
        "ref": state.mp_ref_kf[M - 1],
        "first": state.mp_first_kf[M - 1],
        "okf": state.mp_obs_kf[M - 1],
        "oidx": state.mp_obs_idx[M - 1],
        "nobs": state.mp_n_obs[M - 1],
    }
    st = state._replace(
        mp_pos=state.mp_pos.at[ids_safe].set(pos),
        mp_valid=state.mp_valid.at[ids_safe].set(True),
        mp_desc=state.mp_desc.at[ids_safe].set(desc),
        mp_normal=state.mp_normal.at[ids_safe].set(normal),
        mp_min_dist=state.mp_min_dist.at[ids_safe].set(min_dist),
        mp_max_dist=state.mp_max_dist.at[ids_safe].set(max_dist),
        mp_ref_kf=state.mp_ref_kf.at[ids_safe].set(kf_slot),
        mp_first_kf=state.mp_first_kf.at[ids_safe].set(kf_slot),
        mp_obs_kf=state.mp_obs_kf.at[ids_safe, 0].set(
            jnp.where(create, kf_slot, state.mp_obs_kf[ids_safe, 0])
        ),
        mp_obs_idx=state.mp_obs_idx.at[ids_safe, 0].set(
            jnp.where(create, kp_idx, state.mp_obs_idx[ids_safe, 0])
        ),
        mp_n_obs=state.mp_n_obs.at[ids_safe].set(
            jnp.where(create, 1, state.mp_n_obs[ids_safe])
        ),
    )
    # restore dump row unless it was legitimately allocated
    top = base_id + jnp.sum(create.astype(jnp.int32))
    legit = top >= M  # never true in practice (host checks capacity)
    st = st._replace(
        mp_pos=jnp.where(legit, st.mp_pos, st.mp_pos.at[M - 1].set(dump["pos"])),
        mp_valid=jnp.where(
            legit, st.mp_valid, st.mp_valid.at[M - 1].set(dump["valid"])
        ),
        mp_desc=jnp.where(legit, st.mp_desc, st.mp_desc.at[M - 1].set(dump["desc"])),
        mp_normal=jnp.where(
            legit, st.mp_normal, st.mp_normal.at[M - 1].set(dump["normal"])
        ),
        mp_min_dist=jnp.where(
            legit, st.mp_min_dist, st.mp_min_dist.at[M - 1].set(dump["mind"])
        ),
        mp_max_dist=jnp.where(
            legit, st.mp_max_dist, st.mp_max_dist.at[M - 1].set(dump["maxd"])
        ),
        mp_ref_kf=jnp.where(
            legit, st.mp_ref_kf, st.mp_ref_kf.at[M - 1].set(dump["ref"])
        ),
        mp_first_kf=jnp.where(
            legit, st.mp_first_kf, st.mp_first_kf.at[M - 1].set(dump["first"])
        ),
        mp_obs_kf=jnp.where(
            legit, st.mp_obs_kf, st.mp_obs_kf.at[M - 1].set(dump["okf"])
        ),
        mp_obs_idx=jnp.where(
            legit, st.mp_obs_idx, st.mp_obs_idx.at[M - 1].set(dump["oidx"])
        ),
        mp_n_obs=jnp.where(
            legit, st.mp_n_obs, st.mp_n_obs.at[M - 1].set(dump["nobs"])
        ),
    )
    # link from the keyframe side
    kp_safe = jnp.clip(kp_idx, 0, state.kf_mp.shape[1] - 1)
    kf_mp_row = st.kf_mp[kf_slot]
    kf_mp_row = kf_mp_row.at[kp_safe].set(
        jnp.where(create, ids, kf_mp_row[kp_safe])
    )
    st = st._replace(
        kf_mp=st.kf_mp.at[kf_slot].set(kf_mp_row),
        mp_count=jnp.maximum(
            st.mp_count, base_id + jnp.sum(create.astype(jnp.int32))
        ).astype(jnp.int32),
    )
    return st, ids


def covisibility_row(state: MapState, kf_slot: int) -> jnp.ndarray:
    """Covisibility weights of one keyframe vs all others: number of shared
    map points (KeyFrame::UpdateConnections semantics, keyframe.h:79-86)."""
    K, N, M, P = state.capacity
    mp = state.kf_mp[kf_slot]  # (N,)
    has = mp >= 0
    mp_safe = jnp.where(has, mp, 0)
    obs_kf = state.mp_obs_kf[mp_safe]  # (N, P)
    w = jnp.where(
        has[:, None] & (obs_kf >= 0), jnp.ones_like(obs_kf, jnp.float32), 0.0
    )
    counts = jax.ops.segment_sum(
        w.reshape(-1), jnp.clip(obs_kf.reshape(-1), 0, K - 1), num_segments=K
    )
    counts = counts.at[kf_slot].set(0.0)
    return counts


def positions_of(state: MapState, mp_ids: jnp.ndarray) -> jnp.ndarray:
    safe = jnp.clip(mp_ids, 0, state.mp_pos.shape[0] - 1)
    return state.mp_pos[safe]


@jax.jit
def update_point_stats(state: MapState, mp_ids: jnp.ndarray) -> MapState:
    """Refresh normal/scale range and distinctive descriptor for the given
    points (MapPoint::UpdateNormalAndDepth + ComputeDistinctiveDescriptors
    semantics, mappoint.cpp). Distinctive descriptor = observation whose
    descriptor minimizes the median distance to the others; we use the
    cheaper min-sum criterion, equivalent in practice."""
    M, P = state.mp_obs_kf.shape
    ids = jnp.clip(mp_ids, 0, M - 1)
    obs_kf = state.mp_obs_kf[ids]  # (C, P)
    obs_idx = state.mp_obs_idx[ids]
    mask = obs_kf >= 0
    kf_safe = jnp.where(mask, obs_kf, 0)
    idx_safe = jnp.where(mask, obs_idx, 0)
    # camera centers of observing KFs
    R = state.kf_R[kf_safe]  # (C, P, 3, 3)
    t = state.kf_t[kf_safe]
    centers = -jnp.einsum("cpji,cpj->cpi", R, t)  # (C, P, 3) — R^T t with sign
    pos = state.mp_pos[ids][:, None, :]
    rays = pos - centers
    norms = jnp.linalg.norm(rays, axis=-1)
    rays_n = rays / jnp.maximum(norms[..., None], 1e-9)
    n_obs = jnp.maximum(jnp.sum(mask, axis=-1), 1)
    normal = jnp.sum(jnp.where(mask[..., None], rays_n, 0.0), axis=1) / n_obs[:, None]
    # scale range from the reference observation's level (use obs 0)
    lvl0 = state.kf_level[kf_safe[:, 0], idx_safe[:, 0]]
    scale = 1.2 ** lvl0.astype(jnp.float32)
    dist0 = norms[:, 0]
    max_dist = dist0 * scale
    min_dist = max_dist / (1.2 ** 7)
    # distinctive descriptor: min total Hamming distance among observations
    descs = state.kf_desc[kf_safe, idx_safe]  # (C, P, 8)
    from vi_slam_tpu.ops.hamming import popcount_u32

    x = descs[:, :, None, :] ^ descs[:, None, :, :]
    d = jnp.sum(popcount_u32(x), axis=-1).astype(jnp.float32)  # (C, P, P)
    pair_mask = mask[:, :, None] & mask[:, None, :]
    d = jnp.where(pair_mask, d, 0.0)
    tot = jnp.sum(d, axis=-1) + jnp.where(mask, 0.0, 1e9)
    best = jnp.argmin(tot, axis=-1)
    best_desc = jnp.take_along_axis(
        descs, best[:, None, None], axis=1
    )[:, 0]
    valid_row = jnp.sum(mask, axis=-1) > 0
    return state._replace(
        mp_normal=state.mp_normal.at[ids].set(
            jnp.where(valid_row[:, None], normal, state.mp_normal[ids])
        ),
        mp_min_dist=state.mp_min_dist.at[ids].set(
            jnp.where(valid_row, min_dist, state.mp_min_dist[ids])
        ),
        mp_max_dist=state.mp_max_dist.at[ids].set(
            jnp.where(valid_row, max_dist, state.mp_max_dist[ids])
        ),
        mp_desc=state.mp_desc.at[ids].set(
            jnp.where(valid_row[:, None], best_desc, state.mp_desc[ids])
        ),
    )


@jax.jit
def register_obs(
    state: MapState,
    mp_ids: jnp.ndarray,
    kf_slot: jnp.ndarray,
    kp_idx: jnp.ndarray,
    valid: jnp.ndarray,
) -> MapState:
    """Add observations of existing map points from one keyframe
    (MapPoint::AddObservation + KeyFrame::AddMapPoint semantics).

    mp_ids/kp_idx/valid: (C,) parallel arrays. Each keypoint appears at
    most once, so the scatter is collision-free (same contract as
    insert_keyframe)."""
    M, P = state.mp_obs_kf.shape
    N = state.kf_mp.shape[1]
    ok = valid & (mp_ids >= 0) & (kp_idx >= 0)
    mp_safe = jnp.where(ok, mp_ids, M - 1)
    obs_slot = jnp.clip(state.mp_n_obs[mp_safe], 0, P - 1)
    can = ok & (state.mp_n_obs[mp_safe] < P)
    write_m = jnp.where(can, mp_safe, M - 1)
    dump_kf = state.mp_obs_kf[M - 1]
    dump_idx = state.mp_obs_idx[M - 1]
    dump_n = state.mp_n_obs[M - 1]
    obs_kf = state.mp_obs_kf.at[write_m, obs_slot].set(
        jnp.where(can, kf_slot, state.mp_obs_kf[write_m, obs_slot])
    )
    obs_idx = state.mp_obs_idx.at[write_m, obs_slot].set(
        jnp.where(can, kp_idx, state.mp_obs_idx[write_m, obs_slot])
    )
    n_obs = state.mp_n_obs.at[write_m].add(jnp.where(can, 1, 0).astype(jnp.int32))
    obs_kf = obs_kf.at[M - 1].set(dump_kf)
    obs_idx = obs_idx.at[M - 1].set(dump_idx)
    n_obs = n_obs.at[M - 1].set(dump_n)
    # keyframe side (kept even when the obs list is at capacity — see
    # insert_keyframe: the forward link drives matching/covis/fuse, the
    # reverse list is the capacity-bounded BA measurement set)
    kp_safe = jnp.clip(kp_idx, 0, N - 1)
    row = state.kf_mp[kf_slot]
    row = row.at[kp_safe].set(jnp.where(ok, mp_ids, row[kp_safe]))
    return state._replace(
        mp_obs_kf=obs_kf,
        mp_obs_idx=obs_idx,
        mp_n_obs=n_obs,
        kf_mp=state.kf_mp.at[kf_slot].set(row),
    )


@jax.jit
def fuse_points(
    state: MapState,
    src: jnp.ndarray,  # (C,) loser mp ids to be replaced
    dst: jnp.ndarray,  # (C,) winner mp ids
    valid: jnp.ndarray,  # (C,) bool
) -> MapState:
    """Merge duplicated map points (MapPoint::Replace, mappoint.cpp +
    SearchAndFuse / SearchInNeighbors-Fuse, loopclosing.cpp:1754,
    localmapping.cpp:722): every kf_mp reference to src is remapped to
    dst, src rows are invalidated, and src's observations are appended to
    dst's list (capacity permitting) — fully vectorized.

    Winners must be unique across the batch (duplicate winners are
    dropped here; callers enforce uniqueness with a segment-min pick)."""
    M, P = state.mp_obs_kf.shape
    ok = valid & (src >= 0) & (dst >= 0) & (src != dst)
    # keep only the first pair per winner (collision-free scatter rows)
    dst_safe = jnp.where(ok, dst, M - 1)
    C = src.shape[0]
    first = jax.ops.segment_min(
        jnp.where(ok, jnp.arange(C), C), dst_safe, num_segments=M
    )
    ok = ok & (first[dst_safe] == jnp.arange(C))

    # remap keyframe-side references src -> dst
    remap = jnp.arange(M, dtype=jnp.int32)
    remap = remap.at[jnp.where(ok, src, M - 1)].set(
        jnp.where(ok, dst, remap[M - 1])
    )
    remap = remap.at[M - 1].set(M - 1)
    kf_mp = jnp.where(state.kf_mp >= 0, remap[state.kf_mp], state.kf_mp)

    # invalidate losers
    src_safe = jnp.where(ok, src, M - 1)
    mp_valid = state.mp_valid.at[src_safe].set(
        jnp.where(ok, False, state.mp_valid[src_safe])
    )
    mp_valid = mp_valid.at[M - 1].set(state.mp_valid[M - 1])

    # append loser observations to the winner rows: obs slot j of loser c
    # lands at winner slot n_obs[dst] + (#addable loser obs before j).
    # A keyframe already observing the winner keeps its winner keypoint
    # and the loser's entry is erased instead (MapPoint::Replace: "if
    # pKF already observes pMP, just erase this observation").
    lo_kf = state.mp_obs_kf[src_safe]  # (C,P)
    lo_idx = state.mp_obs_idx[src_safe]
    lv = (lo_kf >= 0) & ok[:, None]
    win_kf = state.mp_obs_kf[dst_safe]  # (C,P)
    dup_obs = jnp.any(
        lo_kf[:, :, None]
        == jnp.where(win_kf >= 0, win_kf, -2)[:, None, :],
        axis=-1,
    )
    lv_add = lv & ~dup_obs
    base = state.mp_n_obs[dst_safe]  # (C,)
    off = jnp.cumsum(lv_add.astype(jnp.int32), axis=1) - 1
    slot = base[:, None] + off
    can = lv_add & (slot >= 0) & (slot < P)
    w_row = jnp.where(can, dst_safe[:, None], M)  # drop-route overflow
    s_col = jnp.clip(slot, 0, P - 1)
    obs_kf = state.mp_obs_kf.at[w_row, s_col].set(lo_kf, mode="drop")
    obs_idx = state.mp_obs_idx.at[w_row, s_col].set(lo_idx, mode="drop")
    n_obs = state.mp_n_obs.at[jnp.where(ok, dst_safe, M)].add(
        jnp.sum(can, axis=1).astype(jnp.int32), mode="drop"
    )
    # erase the keyframe-side links of dropped duplicate observations
    N = state.kf_mp.shape[1]
    K = state.kf_valid.shape[0]
    clr_kf = jnp.where(lv & dup_obs, lo_kf, K)
    kf_mp = kf_mp.at[clr_kf, jnp.clip(lo_idx, 0, N - 1)].set(
        -1, mode="drop"
    )
    # clear loser obs rows
    obs_kf = obs_kf.at[src_safe].set(
        jnp.where(ok[:, None], -1, obs_kf[src_safe])
    )
    obs_idx = obs_idx.at[src_safe].set(
        jnp.where(ok[:, None], -1, obs_idx[src_safe])
    )
    n_obs = n_obs.at[src_safe].set(jnp.where(ok, 0, n_obs[src_safe]))
    return state._replace(
        kf_mp=kf_mp, mp_valid=mp_valid, mp_obs_kf=obs_kf,
        mp_obs_idx=obs_idx, mp_n_obs=n_obs,
    )


@partial(jax.jit, static_argnames=())
def cull_young_points(
    state: MapState,
    current_kf: jnp.ndarray,
    min_obs: jnp.ndarray,
) -> Tuple[MapState, jnp.ndarray]:
    """MapPointCulling (localmapping.cpp:322): a recently created point
    must gather observations quickly or die. Points whose first keyframe
    is 2..4 KFs old with fewer than `min_obs` observations are
    invalidated; older points are permanent (the reference stops testing
    after 3 KFs).

    Returns (state, n_culled)."""
    age = current_kf - state.mp_first_kf
    young = (age >= 2) & (age <= 4) & (state.mp_first_kf >= 0)
    dead = state.mp_valid & young & (state.mp_n_obs < min_obs)
    # clear keyframe links of dead points — only RECENT keyframes can
    # link a 2-4-KF-old point (creation + fuse both touch the covisible
    # neighborhood of the newest KF), so the LUT pass runs over a bounded
    # recent window instead of the whole (K, N) table (the full-table
    # gather costs ~10 ms on TPU); any stale link elsewhere points at an
    # invalidated id and every consumer checks mp_valid
    M = state.mp_valid.shape[0]
    K, N = state.kf_mp.shape
    RECENT = min(64, K)
    base = jnp.clip(current_kf - (RECENT - 1), 0, K - 1)
    slots = base + jnp.arange(RECENT, dtype=jnp.int32)
    slots = jnp.clip(slots, 0, K - 1)
    rows = state.kf_mp[slots]  # (RECENT, N)
    linked_dead = (rows >= 0) & dead[jnp.clip(rows, 0, M - 1)]
    rows = jnp.where(linked_dead, -1, rows)
    kf_mp = state.kf_mp.at[slots].set(rows)
    state = state._replace(
        mp_valid=state.mp_valid & ~dead,
        mp_n_obs=jnp.where(dead, 0, state.mp_n_obs),
        mp_obs_kf=jnp.where(dead[:, None], -1, state.mp_obs_kf),
        mp_obs_idx=jnp.where(dead[:, None], -1, state.mp_obs_idx),
        kf_mp=kf_mp,
    )
    return state, jnp.sum(dead).astype(jnp.int32)


@jax.jit
def keyframe_redundancy(state: MapState) -> jnp.ndarray:
    """Per-KF fraction of its tracked map points that are observed by at
    least 3 other keyframes (KeyFrameCulling criterion,
    localmapping.cpp:946: cull when >= 90%)."""
    K, N = state.kf_mp.shape
    M = state.mp_pos.shape[0]
    mp = jnp.clip(state.kf_mp, 0, M - 1)
    has = (state.kf_mp >= 0) & state.mp_valid[mp] & state.kf_kp_valid
    n_obs = state.mp_n_obs[mp]
    redundant = has & (n_obs >= 4)  # >= 3 others + itself
    n_pts = jnp.maximum(jnp.sum(has, axis=1), 1)
    return jnp.sum(redundant, axis=1) / n_pts


@jax.jit
def cull_redundant_keyframe(
    state: MapState, lo: jnp.ndarray, hi: jnp.ndarray
) -> Tuple[MapState, jnp.ndarray]:
    """Pick and remove at most one redundant keyframe in slots [lo, hi)
    (KeyFrameCulling, localmapping.cpp:946: >= 90% of its points seen by
    >= 3 others) — fully on device so the KF-rate chain never syncs.

    Returns (state, info (15,) f32): [did, slot, parent, R_rel row-major
    (9), t_rel (3)] where T_rel = T_culled @ inv(T_parent) at cull time —
    the spanning-tree hop the trajectory writer needs (system.cpp:440-449).
    """
    K = state.kf_valid.shape[0]
    M = state.mp_pos.shape[0]
    # redundancy only for a bounded candidate window starting at `lo`
    # (the reference examines local covisible KFs, localmapping.cpp:946;
    # a full-table mp_n_obs/mp_valid gather costs ~8 ms on TPU)
    C = min(48, K)
    cslots = jnp.clip(lo + jnp.arange(C, dtype=jnp.int32), 0, K - 1)
    rows = state.kf_mp[cslots]  # (C, N)
    mp = jnp.clip(rows, 0, M - 1)
    has = (rows >= 0) & state.mp_valid[mp] & state.kf_kp_valid[cslots]
    redundant = has & (state.mp_n_obs[mp] >= 4)
    n_pts = jnp.maximum(jnp.sum(has, axis=1), 1)
    red_c = jnp.sum(redundant, axis=1) / n_pts  # (C,)
    in_range = (
        state.kf_valid[cslots]
        & (cslots >= lo) & (cslots < hi)
        & (lo + jnp.arange(C) < K)
    )
    cand_c = in_range & (red_c > 0.9)
    pick_c = jnp.argmax(jnp.where(cand_c, red_c, -1.0)).astype(jnp.int32)
    did = cand_c[pick_c]
    pick = cslots[pick_c]
    slots = jnp.arange(K, dtype=jnp.int32)
    # parent: nearest older live KF
    older = state.kf_valid & (slots < pick)
    parent = jnp.argmax(jnp.where(older, slots, -1)).astype(jnp.int32)
    T_k = SE3(state.kf_R[pick], state.kf_t[pick])
    T_p = SE3(state.kf_R[parent], state.kf_t[parent])
    T_rel = T_k.compose(T_p.inverse())
    info = jnp.concatenate(
        [
            jnp.stack(
                [
                    did.astype(jnp.float32),
                    pick.astype(jnp.float32),
                    parent.astype(jnp.float32),
                ]
            ),
            T_rel.R.reshape(-1).astype(jnp.float32),
            T_rel.t.astype(jnp.float32),
        ]
    )
    culled = remove_keyframe(state, pick)
    new_state = jax.tree.map(
        lambda a, b: jnp.where(did, a, b), culled, state
    )
    return new_state, info


@jax.jit
def remove_keyframe(state: MapState, slot: jnp.ndarray) -> MapState:
    """KeyFrame::SetBadFlag (keyframe.cpp): drop a keyframe, scrub its
    observations from all map points and compact the observation lists
    (valid entries first, counts refreshed)."""
    M, P = state.mp_obs_kf.shape
    hit = state.mp_obs_kf == slot
    obs_kf = jnp.where(hit, -1, state.mp_obs_kf)
    obs_idx = jnp.where(hit, -1, state.mp_obs_idx)
    # stable compaction: order invalid entries last
    order = jnp.argsort(jnp.where(obs_kf < 0, 1, 0), axis=1, stable=True)
    obs_kf = jnp.take_along_axis(obs_kf, order, axis=1)
    obs_idx = jnp.take_along_axis(obs_idx, order, axis=1)
    n_obs = jnp.sum(obs_kf >= 0, axis=1).astype(jnp.int32)
    # points anchored to the dead KF re-anchor to their first live observer
    # (MapPoint::SetBadFlag / reference-KF update semantics)
    new_ref = jnp.where(
        state.mp_ref_kf == slot, obs_kf[:, 0], state.mp_ref_kf
    )
    N = state.kf_mp.shape[1]
    return state._replace(
        mp_ref_kf=new_ref,
        kf_valid=state.kf_valid.at[slot].set(False),
        kf_kp_valid=state.kf_kp_valid.at[slot].set(
            jnp.zeros((N,), bool)
        ),
        kf_mp=state.kf_mp.at[slot].set(jnp.full((N,), -1, jnp.int32)),
        mp_obs_kf=obs_kf,
        mp_obs_idx=obs_idx,
        mp_n_obs=n_obs,
    )
