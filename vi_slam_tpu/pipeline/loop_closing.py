"""Loop detection + correction over the array map.

Semantic reference: `LoopClosing::Run`
(`/root/reference/src/core/loopclosing.cpp:44-253` — BoW candidates,
Sim3 geometric verification `DetectCommonRegionsFromBoW` :491,
`CorrectLoop` :805: propagate corrected Sim3 through the covisible
window, transform their map points, `SearchAndFuse` :1754, essential
graph optimization, then global BA).

TPU redesign: detection is the dense BoW database query
(retrieval/database.py); verification is a single batched descriptor
match (MXU Hamming matrix) + one vmapped Sim3 RANSAC + one Sim3 GN;
correction is one jitted kernel that rewrites all keyframe poses and
map-point positions from per-KF (old, new) Sim3 pairs; duplicate-point
fusion is a remap-table scatter. The essential-graph solve is
optim/pose_graph.py. Host code only sequences these device programs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.lie.sim3 import Sim3
from vi_slam_tpu.loop.sim3_solver import sim3_ransac
from vi_slam_tpu.ops.hamming import hamming_matrix
from vi_slam_tpu.optim.pose_graph import optimize_pose_graph
from vi_slam_tpu.optim.sim3_opt import optimize_sim3
from vi_slam_tpu.retrieval import database as kfdb
from vi_slam_tpu.retrieval import vocabulary as voc
from vi_slam_tpu.slam_map.state import MapState
from vi_slam_tpu.utils.config import SystemConfig


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_pairs",))
def _match_kf_pair(
    state: MapState,
    kf_a: jnp.ndarray,
    kf_b: jnp.ndarray,
    max_pairs: int,
    th: int = 50,
    ratio: float = 0.75,
):
    """Mutual-best Hamming matching restricted to keypoints with map points
    (SearchByBoW fmatcher.cpp:546 capability; the BoW-node pruning is
    unnecessary when the full distance matrix is one MXU matmul).

    Returns per-pair arrays (max_pairs,): kp indices in a/b, mp ids in a/b,
    valid mask — selected by best distance.
    """
    da = state.kf_desc[kf_a]
    db = state.kf_desc[kf_b]
    mp_a = state.kf_mp[kf_a]
    mp_b = state.kf_mp[kf_b]
    ok_a = state.kf_kp_valid[kf_a] & (mp_a >= 0)
    ok_b = state.kf_kp_valid[kf_b] & (mp_b >= 0)
    D = hamming_matrix(da, db).astype(jnp.float32)
    big = 1e9
    D = jnp.where(ok_a[:, None] & ok_b[None, :], D, big)
    # best + second best along rows
    j_best = jnp.argmin(D, axis=1)
    d_best = jnp.min(D, axis=1)
    D2 = D.at[jnp.arange(D.shape[0]), j_best].set(big)
    d_second = jnp.min(D2, axis=1)
    # mutual check
    i_best_of_j = jnp.argmin(D, axis=0)
    mutual = i_best_of_j[j_best] == jnp.arange(D.shape[0])
    good = (
        (d_best < th)
        & (d_best < ratio * d_second)
        & mutual
        & ok_a
    )
    # select top max_pairs by distance
    sel_score = jnp.where(good, -d_best, -big)
    _, sel = jax.lax.top_k(sel_score, max_pairs)
    sel = sel.astype(jnp.int32)
    valid = good[sel]
    kp_a = sel
    kp_b = j_best[sel].astype(jnp.int32)
    return kp_a, kp_b, mp_a[sel], mp_b[kp_b], valid


@jax.jit
def _pair_geometry(
    state: MapState,
    kf_a: jnp.ndarray,
    kf_b: jnp.ndarray,
    kp_a: jnp.ndarray,
    kp_b: jnp.ndarray,
    mp_a: jnp.ndarray,
    mp_b: jnp.ndarray,
    valid: jnp.ndarray,
):
    """Camera-frame coordinates + pixel measurements + pyramid variances
    for matched map-point pairs (Sim3Solver input contract)."""
    M = state.mp_pos.shape[0]
    xa_w = state.mp_pos[jnp.clip(mp_a, 0, M - 1)]
    xb_w = state.mp_pos[jnp.clip(mp_b, 0, M - 1)]
    Ta = SE3(state.kf_R[kf_a], state.kf_t[kf_a])
    Tb = SE3(state.kf_R[kf_b], state.kf_t[kf_b])
    x1 = Ta.apply(xa_w)
    x2 = Tb.apply(xb_w)
    uv1 = state.kf_xy[kf_a, kp_a]
    uv2 = state.kf_xy[kf_b, kp_b]
    s1 = 1.2 ** (2.0 * state.kf_level[kf_a, kp_a].astype(jnp.float32))
    s2 = 1.2 ** (2.0 * state.kf_level[kf_b, kp_b].astype(jnp.float32))
    valid = valid & (mp_a >= 0) & (mp_b >= 0)
    valid = valid & state.mp_valid[jnp.clip(mp_a, 0, M - 1)]
    valid = valid & state.mp_valid[jnp.clip(mp_b, 0, M - 1)]
    return x1, x2, uv1, uv2, s1, s2, valid


@jax.jit
def _apply_correction(
    state: MapState,
    old_R: jnp.ndarray,
    old_t: jnp.ndarray,
    old_s: jnp.ndarray,
    new_R: jnp.ndarray,
    new_t: jnp.ndarray,
    new_s: jnp.ndarray,
    updated: jnp.ndarray,
) -> MapState:
    """Rewrite keyframe poses and map points from per-KF Sim3 pairs.

    For updated KF k: pose <- SE3(new_R, new_t / new_s) (the reference's
    Sim3->SE3 conversion in CorrectLoop, loopclosing.cpp:905). For map
    point m with ref KF r updated: x <- S_new_r^-1(S_old_r(x))
    (loopclosing.cpp:869-887 / essential-graph point correction
    optimizer.cpp:2380-2420).
    """
    K = state.kf_R.shape[0]
    upd = updated
    kf_R = jnp.where(upd[:, None, None], new_R, state.kf_R)
    kf_t = jnp.where(
        upd[:, None], new_t / jnp.maximum(new_s, 1e-12)[:, None], state.kf_t
    )
    ref = jnp.clip(state.mp_ref_kf, 0, K - 1)
    S_old = Sim3(old_R[ref], old_t[ref], old_s[ref])
    S_new = Sim3(new_R[ref], new_t[ref], new_s[ref])
    x_cam = S_old.apply(state.mp_pos)
    x_new = S_new.inverse().apply(x_cam)
    move = upd[ref] & state.mp_valid & (state.mp_ref_kf >= 0)
    mp_pos = jnp.where(move[:, None], x_new, state.mp_pos)
    return state._replace(kf_R=kf_R, kf_t=kf_t, mp_pos=mp_pos)


@partial(jax.jit, static_argnames=("k", "levels", "n_words"))
def _kf_bow(state: MapState, slot: jnp.ndarray, vocab_bits, idf, k, levels, n_words):
    words, _ = voc._transform_bits(
        # unpack on the fly
        _unpack(state.kf_desc[slot]), vocab_bits, k, levels, max(levels - 3, 0)
    )
    return voc.bow_vectors(
        words[None], state.kf_kp_valid[slot][None], idf, n_words
    )[0]


def _unpack(desc):
    from vi_slam_tpu.ops.orb import unpack_bits

    return unpack_bits(desc)


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------


@dataclass
class LoopCloserStats:
    n_queries: int = 0
    n_candidates: int = 0
    n_verified: int = 0
    n_loops_closed: int = 0


class LoopCloser:
    """Per-keyframe loop detection + correction (LoopClosing thread
    equivalent; runs synchronously at KF rate in the host pipeline).

    The covisibility graph / spanning tree lives in the native host
    runtime (`native.CovisGraph`, matching the reference's in-KeyFrame
    graph bookkeeping, keyframe.h:79-93) fed with each keyframe's
    map-point row — the per-query (K, K) device covisibility reduction
    and its blocking pull are gone."""

    def __init__(
        self,
        cfg: SystemConfig,
        cam: CameraParams,
        vocab: voc.Vocabulary,
        fix_scale: bool = True,
        min_inliers: int = 20,
        max_pairs: int = 256,
        min_gap_kfs: int = 10,
        run_gba: bool = True,
    ):
        from vi_slam_tpu.native import CovisGraph

        self.cfg = cfg
        self.cam = cam
        self.vocab = vocab
        self.fix_scale = fix_scale
        self.min_inliers = min_inliers
        self.max_pairs = max_pairs
        self.min_gap_kfs = min_gap_kfs
        self.run_gba = run_gba
        self.db = kfdb.KeyFrameDatabase(
            cfg.map.max_keyframes, vocab.n_words, n_cand=16
        )
        self.covis = CovisGraph(cfg.map.max_keyframes)
        self.loop_edges: List[Tuple[int, int]] = []
        self.last_closed_kf = -(10**9)
        self.stats = LoopCloserStats()
        self._key = jax.random.PRNGKey(7)
        # inertial pipelines set these once the IMU is initialized: loop
        # corrections then run the gravity-referenced 4DoF graph and the
        # owner rotates keyframe velocities via _last_old_poses
        self.gravity_aligned = False
        self.gravity_w = None
        self._last_old_poses = None  # (old_R, old_t) at correction entry
        # consecutive-query covisibility consistency required before a
        # candidate is geometrically verified (mnCovisibilityConsistencyTh)
        self.consistency_th = 3
        self._consistent_groups: list = []

    # -- helpers

    def reset_for_new_map(self) -> None:
        """Fresh place-recognition DB + covisibility graph for a new
        Atlas map (CreateMapInAtlas side effects, tracking.cpp:3686);
        the caller parks the previous db/covis with the stored map."""
        from vi_slam_tpu.native import CovisGraph

        self.db = kfdb.KeyFrameDatabase(
            self.cfg.map.max_keyframes, self.vocab.n_words, n_cand=16
        )
        self.covis = CovisGraph(self.cfg.map.max_keyframes)
        self.loop_edges = []
        self.last_closed_kf = -(10**9)

    def _bow_of(self, state: MapState, slot: int) -> jnp.ndarray:
        return _kf_bow(
            state,
            jnp.int32(slot),
            self.vocab.node_bits,
            self.vocab.idf,
            self.vocab.k,
            self.vocab.levels,
            self.vocab.n_words,
        )

    def add_bow(self, state: MapState, slot: int) -> None:
        """Register a KF in the place-recognition database (device side)."""
        self.db.add(slot, self._bow_of(state, slot))

    def register_covis(self, slot: int, mp_row: np.ndarray) -> None:
        """Feed a keyframe's map-point row into the native covisibility
        graph (KeyFrame::UpdateConnections). The pipeline passes a row it
        pulled asynchronously; tests pass it directly."""
        self.covis.add_keyframe(slot, np.asarray(mp_row, np.int64))

    def add_keyframe(self, state: MapState, slot: int,
                     mp_row: Optional[np.ndarray] = None) -> None:
        """BoW + covisibility registration in one call (synchronous pull
        of the map-point row when the caller has none in flight)."""
        self.add_bow(state, slot)
        if mp_row is None:
            mp_row = np.asarray(state.kf_mp[slot])
        self.register_covis(slot, mp_row)

    def remove_keyframe(self, slot: int) -> None:
        """Culled-KF cleanup: drop from the BoW database and the graph."""
        self.db.remove(slot)
        self.covis.remove_keyframe(slot)

    def process(
        self, state: MapState, cur: int, n_kf: int, refresh_cb=None
    ) -> Tuple[MapState, bool]:
        """Detect and (if verified) close a loop for keyframe `cur`.
        Returns (possibly corrected map state, closed?).

        refresh_cb: optional callable invoked after geometric
        verification but BEFORE the correction; it must drain the
        owner's in-flight frame pipeline and return the fresh map state
        (frames dispatched against pre-correction poses finalize wrong
        against corrected anchors — the reference stops LocalMapping for
        the same reason, loopclosing.cpp:811-836)."""
        self.stats.n_queries += 1
        if cur - self.last_closed_kf < self.min_gap_kfs:
            return state, False
        K = state.kf_R.shape[0]
        n_ids, n_w = self.covis.best_neighbors(cur, K)
        exclude = np.zeros((K,), bool)
        exclude[n_ids] = True  # any shared observation
        # recent KFs can't be loop candidates
        lo = max(0, cur - self.min_gap_kfs)
        exclude[lo : cur + 1] = True
        exclude[cur] = True

        # min score = worst BoW similarity among strongly covisible KFs —
        # computed on device inside the fused query (one pull per KF).
        # The query KF's BoW was computed by add_bow at insertion: read
        # the stored row instead of re-running the vocab transform.
        bow_cur = self.db.db.bow[cur]
        strong = n_ids[n_w >= self.cfg.map.covis_weight_min]
        K_db = self.db.db.valid.shape[0]
        strong_mask = np.zeros((K_db,), bool)
        strong_mask[strong] = True
        cands = self.db.detect_loop_candidates_fused(
            state, bow_cur, jnp.asarray(exclude), jnp.asarray(strong_mask)
        )
        cands = [c for c in cands.tolist() if not exclude[c]]
        self.stats.n_candidates += len(cands)
        if not cands:
            self._consistent_groups = []
            return state, False

        # covisibility-consistency gate (LoopClosing::DetectLoopCandidates
        # mnCovisibilityConsistencyTh = 3, loopclosing.cpp:370-470): a
        # candidate is only verified after its covisibility group has
        # been re-detected in 3 consecutive keyframe queries. This both
        # rejects spurious single-shot matches (a wrong weld corrupts the
        # whole map) and cuts the per-keyframe verification cost ~10x.
        prev = getattr(self, "_consistent_groups", [])
        new_groups = []
        consistent = []
        for cand in cands[:8]:
            g_ids, g_w = self.covis.best_neighbors(cand, 16)
            grp = set(int(i) for i in g_ids[g_w > 0]) | {int(cand)}
            cnt = 1
            for pgrp, pcnt in prev:
                if grp & pgrp:
                    cnt = max(cnt, pcnt + 1)
            new_groups.append((grp, cnt))
            if cnt >= self.consistency_th:
                consistent.append(cand)
        self._consistent_groups = new_groups
        if not consistent:
            return state, False

        for cand in consistent[:3]:
            ok, S_cl, fused = self._verify(state, cur, cand)
            if not ok:
                continue
            self.stats.n_verified += 1
            if refresh_cb is not None:
                fresh = refresh_cb()
                if fresh is not None:
                    state = fresh
                    # the flush may have fused/culled points: re-validate
                    mp_a, mp_b, fvalid = fused
                    M = state.mp_valid.shape[0]
                    fvalid = (
                        fvalid
                        & state.mp_valid[jnp.clip(mp_a, 0, M - 1)]
                        & state.mp_valid[jnp.clip(mp_b, 0, M - 1)]
                    )
                    fused = (mp_a, mp_b, fvalid)
            state = self._correct(state, cur, cand, S_cl, fused)
            self.loop_edges.append((cur, cand))
            self.last_closed_kf = cur
            self.stats.n_loops_closed += 1
            return state, True
        return state, False

    def _verify(self, state: MapState, cur: int, cand: int):
        """Sim3 RANSAC + GN on matched map points
        (DetectCommonRegionsFromBoW loopclosing.cpp:491 semantics)."""
        kp_a, kp_b, mp_a, mp_b, valid = _match_kf_pair(
            state,
            jnp.int32(cur),
            jnp.int32(cand),
            self.max_pairs,
            th=self.cfg.matcher.th_low,
        )
        x1, x2, uv1, uv2, s1, s2, valid = _pair_geometry(
            state, jnp.int32(cur), jnp.int32(cand), kp_a, kp_b, mp_a, mp_b,
            valid,
        )
        n_valid = int(jnp.sum(valid))
        if n_valid < self.min_inliers:
            return False, None, None
        self._key, sub = jax.random.split(self._key)
        res = sim3_ransac(
            self.cam, self.cam, x1, x2, uv1, uv2, valid, s1, s2, sub,
            n_hyp=256, fix_scale=self.fix_scale,
        )
        if int(res.n_inliers) < self.min_inliers:
            return False, None, None
        opt = optimize_sim3(
            self.cam, self.cam, res.S12, x1, x2, uv1, uv2,
            valid & res.inliers, s1, s2, fix_scale=self.fix_scale,
        )
        if int(opt.n_inliers) < self.min_inliers:
            return False, None, None
        fused = (mp_a, mp_b, valid & opt.inliers)
        return True, opt.S12, fused

    def _correct(
        self,
        state: MapState,
        cur: int,
        cand: int,
        S_cl: Sim3,
        fused,
    ) -> MapState:
        """CorrectLoop (loopclosing.cpp:805): propagate the corrected Sim3
        through cur's covisible window, move their points, fuse seam
        duplicates, optimize the essential graph, then run whole-map BA
        (RunGlobalBundleAdjustment, loopclosing.cpp:1895 — here inline:
        the map cannot advance concurrently, so the reference's
        spanning-tree propagation to KFs created during the BA thread is
        unnecessary by construction)."""
        K = state.kf_R.shape[0]
        kf_R = np.asarray(state.kf_R)
        kf_t = np.asarray(state.kf_t)
        kf_valid = np.asarray(state.kf_valid)

        # corrected Sim3 of cur: S_cw = S_cl o S_lw  (S_lw scale 1)
        S_lw = Sim3(
            jnp.asarray(kf_R[cand]), jnp.asarray(kf_t[cand]),
            jnp.asarray(1.0, state.kf_t.dtype),
        )
        S_cw_new = S_cl.compose(S_lw)
        S_cw_old = Sim3(
            jnp.asarray(kf_R[cur]), jnp.asarray(kf_t[cur]),
            jnp.asarray(1.0, state.kf_t.dtype),
        )

        # window: cur + its covisible neighbors
        n_ids, n_w = self.covis.best_neighbors(cur, K)
        window = np.zeros((K,), bool)
        window[n_ids[n_w >= self.cfg.map.covis_weight_min]] = True
        window[cur] = True
        window &= kf_valid

        old_R = jnp.asarray(kf_R)
        old_t = jnp.asarray(kf_t)
        old_s = jnp.ones((K,), state.kf_t.dtype)
        # snapshot for the owner's velocity re-rotation hook (inertial
        # CorrectLoop rotates KF velocities with the yaw correction)
        self._last_old_poses = (old_R, old_t)
        # S_iw_new = S_ic o S_cw_new, with S_ic = S_iw_old o S_cw_old^-1
        S_iw_old = Sim3(old_R, old_t, old_s)
        S_ic = S_iw_old.compose(S_cw_old.inverse())

        def comp(S_ic_R, S_ic_t, S_ic_s):
            Sic = Sim3(S_ic_R, S_ic_t, S_ic_s)
            Snew = Sic.compose(S_cw_new)
            return Snew.R, Snew.t, Snew.s

        new_R, new_t, new_s = jax.vmap(comp)(S_ic.R, S_ic.t, S_ic.s)
        upd = jnp.asarray(window)
        state = _apply_correction(
            state, old_R, old_t, old_s, new_R, new_t, new_s, upd
        )

        # fuse seam duplicates: current-side mp replaced by loop-side mp
        mp_a, mp_b, fvalid = fused
        from vi_slam_tpu.slam_map.state import fuse_points

        state = fuse_points(state, mp_a, mp_b, fvalid)

        # essential graph over all valid KFs. Structural-edge measurements
        # come from the PRE-correction poses (locally consistent odometry —
        # the reference's NonCorrectedSim3 map, loopclosing.cpp:843-905);
        # the loop edge carries the verified corrected measurement S_cl.
        # Edge set = spanning tree + covisibility >= threshold from the
        # native graph + previously closed loop edges (optimizer.cpp:2122).
        max_edges = 4096
        pairs = set()
        for a, b in self.covis.essential_edges(
            self.cfg.map.essential_weight_min, max_edges
        ).tolist():
            if kf_valid[a] and kf_valid[b]:
                pairs.add((a, b))
        for a, b in self.loop_edges:
            pairs.add((min(a, b), max(a, b)))
        pairs = sorted(pairs)[: max_edges - 1]
        edges_np = np.zeros((max_edges, 2), np.int32)
        evalid_np = np.zeros((max_edges,), bool)
        ew_np = np.ones((max_edges,), np.float32)
        if pairs:
            edges_np[: len(pairs)] = np.asarray(pairs, np.int32)
            evalid_np[: len(pairs)] = True
        # structural measurements from old (pre-correction) poses
        ii = edges_np[:, 0]
        jj = edges_np[:, 1]
        S_old_all = Sim3(old_R, old_t, old_s)
        Si = Sim3(S_old_all.R[ii], S_old_all.t[ii], S_old_all.s[ii])
        Sj = Sim3(S_old_all.R[jj], S_old_all.t[jj], S_old_all.s[jj])
        meas = Sj.compose(Si.inverse())
        # append the loop edge (i=cand, j=cur): S_ji = S_cw_new o S_lw^-1 = S_cl
        free_slots = np.flatnonzero(~evalid_np)
        if free_slots.size == 0:
            return state  # edge budget exhausted; skip graph opt
        slot = int(free_slots[0])
        edges_np[slot] = (cand, cur)
        evalid_np[slot] = True
        ew_np[slot] = 1.0
        meas = Sim3(
            meas.R.at[slot].set(S_cl.R),
            meas.t.at[slot].set(S_cl.t),
            meas.s.at[slot].set(S_cl.s),
        )
        # init: corrected poses (post window propagation)
        poses = Sim3(
            state.kf_R, state.kf_t, jnp.ones((K,), state.kf_t.dtype)
        )
        fixed = np.zeros((K,), bool)
        fixed[cand] = True
        fixed |= ~kf_valid
        # inertial maps are gravity-aligned: correct with the
        # yaw+translation graph so the correction cannot tilt the
        # estimated gravity (LoopClosing::CorrectLoop inertial branch,
        # loopclosing.cpp:992 -> OptimizeEssentialGraph4DoF,
        # optimizer.cpp:7521); otherwise se3 (stereo) / sim3 (mono)
        if self.gravity_aligned and self.gravity_w is not None:
            mode = "4dof"
            yaw_axis = jnp.asarray(self.gravity_w, state.kf_t.dtype)
        else:
            mode = "se3" if self.fix_scale else "sim3"
            yaw_axis = None
        res = optimize_pose_graph(
            poses, jnp.asarray(edges_np), meas, jnp.asarray(evalid_np),
            jnp.asarray(ew_np), jnp.asarray(fixed), iters=15, mode=mode,
            yaw_axis=yaw_axis,
        )
        state = _apply_correction(
            state,
            poses.R,
            poses.t,
            poses.s,
            res.poses.R,
            res.poses.t,
            res.poses.s,
            jnp.asarray(kf_valid),
        )

        # whole-map bundle adjustment (RunGlobalBundleAdjustment,
        # loopclosing.cpp:1895-2060) — dispatch-only; scatter assembly
        # keeps memory bounded at full-map camera counts
        if self.run_gba:
            from vi_slam_tpu.optim.local_ba import bundle_adjust
            from vi_slam_tpu.pipeline import steps

            prob = steps.gather_global_ba_problem(self.cam, state)
            gres = bundle_adjust(
                self.cam, prob, iters=self.cfg.ba.gba_iters,
                assembly="scatter",
            )
            state = steps.scatter_global_ba_result(
                state, gres.poses, gres.points
            )
        return state
