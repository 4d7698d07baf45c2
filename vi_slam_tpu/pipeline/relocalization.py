"""Relocalization: recover a lost tracker from the place-recognition DB.

Semantic reference: `Tracking::Relocalization`
(`/root/reference/src/core/tracking.cpp:3456` — BoW candidates from
`KeyFrameDatabase::DetectRelocalizationCandidates` keyframedatabase.cpp
:707, per-candidate `SearchByBoW` matching >=15, `MLPnPsolver::iterate`
RANSAC, `PoseOptimization` with >=50 inliers to accept).

TPU redesign: candidate matching is one MXU Hamming matrix per
candidate; PnP is the batched P6P RANSAC (optim/pnp.py); the final check
is the standard fused pose GN. Host code only walks the (few) candidates.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.features.extractor import Features
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.ops.hamming import hamming_matrix
from vi_slam_tpu.optim import pose_opt
from vi_slam_tpu.optim.pnp import pnp_ransac
from vi_slam_tpu.optim.pose_opt import PoseObs
from vi_slam_tpu.slam_map.state import MapState


@jax.jit
def _match_frame_to_kf(
    state: MapState,
    kf: jnp.ndarray,
    desc: jnp.ndarray,
    kp_valid: jnp.ndarray,
    th: int = 50,
    ratio: float = 0.75,
):
    """Frame keypoints -> candidate-KF map points (SearchByBoW(frame, KF)
    capability). Returns per-frame-keypoint (mp_id, valid)."""
    M = state.mp_pos.shape[0]
    d_kf = state.kf_desc[kf]
    mp_kf = state.kf_mp[kf]
    ok_kf = state.kf_kp_valid[kf] & (mp_kf >= 0)
    ok_kf = ok_kf & state.mp_valid[jnp.clip(mp_kf, 0, M - 1)]
    D = hamming_matrix(desc, d_kf).astype(jnp.float32)
    big = 1e9
    D = jnp.where(kp_valid[:, None] & ok_kf[None, :], D, big)
    j_best = jnp.argmin(D, axis=1)
    d_best = jnp.min(D, axis=1)
    N = D.shape[0]
    D2 = D.at[jnp.arange(N), j_best].set(big)
    d_second = jnp.min(D2, axis=1)
    i_best_of_j = jnp.argmin(D, axis=0)
    mutual = i_best_of_j[j_best] == jnp.arange(N)
    good = (d_best < th) & (d_best < ratio * d_second) & mutual & kp_valid
    mp = jnp.where(good, mp_kf[j_best], -1)
    return mp.astype(jnp.int32), good


@partial(jax.jit, static_argnames=("rounds", "iters"))
def _reloc_attempt(
    cam: CameraParams,
    state: MapState,
    kf: jnp.ndarray,
    feats: Features,
    uright: jnp.ndarray,
    level_scales: jnp.ndarray,
    key: jax.Array,
    rounds: int = 4,
    iters: int = 10,
):
    """One candidate: match + PnP RANSAC + pose GN. Returns
    (T, n_matches, n_pnp_inliers, n_final_inliers)."""
    M = state.mp_pos.shape[0]
    mp, good = _match_frame_to_kf(state, kf, feats.desc, feats.valid)
    xw = state.mp_pos[jnp.clip(mp, 0, M - 1)]
    sigma2 = (
        level_scales[jnp.clip(feats.level, 0, level_scales.shape[0] - 1)] ** 2
    )
    res = pnp_ransac(cam, xw, feats.xy, good, sigma2, key)
    stereo = uright > 0
    uvr = jnp.concatenate(
        [feats.xy, jnp.where(stereo, uright, 0.0)[:, None]], axis=-1
    )
    obs = PoseObs(
        xw=xw,
        uvr=uvr,
        stereo=stereo,
        sigma2=sigma2,
        valid=good & res.inliers,
    )
    T_opt, inlier, n_in = pose_opt.pose_optimize(
        cam, res.T_cw, obs, rounds=rounds, iters=iters
    )
    return T_opt, jnp.sum(good), res.n_inliers, n_in


class Relocalizer:
    """Host-side relocalization driver over the KF database."""

    def __init__(self, cam: CameraParams, level_scales, min_matches=15,
                 min_inliers=30):
        self.cam = cam
        self.level_scales = level_scales
        self.min_matches = min_matches
        self.min_inliers = min_inliers
        self._key = jax.random.PRNGKey(11)

    def try_relocalize(
        self,
        state: MapState,
        db,
        bow_vec: jnp.ndarray,
        feats: Features,
        uright: jnp.ndarray,
    ) -> Tuple[Optional[SE3], int]:
        """Returns (pose, n_inliers) or (None, 0)."""
        cands = db.detect_reloc_candidates(state, bow_vec)
        best: Tuple[Optional[SE3], int] = (None, 0)
        for cand in cands.tolist()[:5]:
            self._key, sub = jax.random.split(self._key)
            T, n_match, n_pnp, n_in = _reloc_attempt(
                self.cam, state, jnp.int32(cand), feats, uright,
                self.level_scales, sub,
            )
            if int(n_match) < self.min_matches:
                continue
            if int(n_in) >= 50:
                # candidates are score-ordered; a strong fix wins outright
                # (tracking.cpp:3609 nGood >= 50 accept)
                return SE3(T.R, T.t), int(n_in)
            if int(n_in) >= self.min_inliers and int(n_in) > best[1]:
                best = (SE3(T.R, T.t), int(n_in))
        return best
