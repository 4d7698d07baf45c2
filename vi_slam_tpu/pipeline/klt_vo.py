"""KLT (track-then-redetect) stereo VO frontend.

Semantic reference — vilib's GPU feature tracker, the reference's
performance-relevant native frontend (SURVEY.md:24-30):
  * `FeatureTrackerGPU::track`
    (`/root/reference/thirdparty/vilib/visual_lib/src/feature_tracker/
    feature_tracker_gpu.cpp`) — per-frame pyramidal inverse-compositional
    LK on the live track set,
  * `track_features_kernel` / `update_tracks_kernel`
    (`feature_tracker_cuda_tools.cu:190/:625`) — track iteration +
    lifecycle (kill on divergence, respawn from fresh detections),
  * occupancy-grid respawn (`common/occupancy_grid_2d.h`) — detect new
    features only where no live track exists.

TPU design: between keyframes a frame costs ONE fused dispatch of
pyramid build (0.05 ms) + batched IC-LK over all tracks (0.05 ms) +
motion-only pose GN — no ORB extraction, no descriptor matching, no
projection search (tracks carry their map-point ids). The full ORB
extract + scanline stereo runs only inside the keyframe branch of a
`lax.cond` (so its cost lands only on keyframe frames), where fresh
keypoints are associated to surviving tracks by position, the keyframe
is created exactly like the ORB frontend's, and the track set respawns
from the keyframe's keypoints (map-point-bearing ones only). Everything
downstream — mapping pass, local BA, culling, loop closing, Atlas —
is the unchanged StereoVO machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.cameras import dispatch as camlib
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.ops import klt
from vi_slam_tpu.ops import pyramid as pyr_ops
from vi_slam_tpu.optim import pose_opt
from vi_slam_tpu.pipeline.stereo_vo import (
    NOT_INITIALIZED,
    OK,
    FrameJob,
    StereoVO,
    TrackBundle,
    TrackStats,
    _PK_KFCOUNT,
    _PK_KFFLAG,
    _PK_KFSLOT,
    _PK_NIN,
)
from vi_slam_tpu.utils.config import SystemConfig


class KltStereoVO(StereoVO):
    """StereoVO with the LK track-then-redetect frontend
    (cfg.tracker.frontend == "klt")."""

    def __init__(self, cfg: SystemConfig, timer=None, vocab=None):
        super().__init__(cfg, timer=timer, vocab=vocab)
        N = cfg.extractor.n_features
        self.trk_xy_dev = jnp.zeros((N, 2), jnp.float32)
        self.trk_mp_dev = jnp.full((N,), -1, jnp.int32)
        self.trk_level_dev = jnp.zeros((N,), jnp.int32)
        self.trk_valid_dev = jnp.zeros((N,), bool)
        self.prev_pyr_dev = None
        self._build_klt_fns()

    # ----------------------------------------------------- device programs

    def _build_klt_fns(self):
        cfg = self.cfg
        cam = self.cam
        tr_cfg = cfg.tracker
        ext_cfg = cfg.extractor
        N = ext_cfg.n_features
        KL = tr_cfg.klt_levels
        KH = tr_cfg.klt_half
        KI = tr_cfg.klt_iters
        sf = ext_cfg.scale_factor
        min_ok_static, kf_budget = self._kf_decision_consts
        r2 = float(tr_cfg.klt_assoc_radius) ** 2
        rounds = cfg.ba.pose_rounds
        iters = cfg.ba.pose_iters_per_round
        max_res = tr_cfg.klt_max_residual
        rescue_min = tr_cfg.klt_rescue_min

        def _pyr(imgs_u8):
            return tuple(
                pyr_ops.build_halfsample_pyramid(
                    imgs_u8[0].astype(jnp.float32), KL
                )
            )

        self._pyr_fn = jax.jit(_pyr)

        def _frame_klt(imgs_u8, mstate, prev_pyr, trk_xy, trk_mp,
                       trk_level, trk_valid, carry, T_last, vel, frame_id,
                       ts, loc_only):
            """Fused KLT frame program: pyramid + LK + pose GN + on-device
            keyframe decision/creation/respawn — one dispatch."""
            pyrL = _pyr(imgs_u8)
            M = mstate.mp_pos.shape[0]
            mp_safe = jnp.clip(trk_mp, 0, M - 1)
            xw = mstate.mp_pos[mp_safe]
            alive = mstate.mp_valid[mp_safe] & (trk_mp >= 0)
            # motion-model initial guess: project the track's map point at
            # the predicted pose, so LK only corrects the prediction error
            # (the vilib tracker seeds from the previous position and dies
            # on fast motion; the map gives us better for free)
            T_pred0 = vel.compose(T_last)
            pc = T_pred0.apply(xw)
            guess = camlib.project(cam, pc)
            infront = pc[..., 2] > 0.1
            guess = jnp.where(
                (alive & infront)[:, None], guess, trk_xy
            ).astype(jnp.float32)
            tr = klt.track_pyramidal(
                prev_pyr, pyrL, trk_xy, trk_valid, xy_guess=guess,
                half=KH, iters=KI, max_residual=max_res,
            )
            sigma2 = sf ** (2.0 * trk_level.astype(jnp.float32))

            def optimize(xy_cur, ok_cur, T0, ur=None):
                obs_valid = ok_cur & trk_valid & alive
                if ur is None:
                    stereo = jnp.zeros((N,), bool)
                    ur_col = jnp.zeros((N, 1), jnp.float32)
                else:
                    stereo = ur > 0
                    ur_col = jnp.where(stereo, ur, 0.0)[:, None]
                uvr = jnp.concatenate([xy_cur, ur_col], axis=-1)
                obs = pose_opt.PoseObs(
                    xw=xw, uvr=uvr, stereo=stereo,
                    sigma2=sigma2, valid=obs_valid,
                )
                return pose_opt.pose_optimize(
                    cam, T0, obs, rounds=rounds, iters=iters
                ) + (obs_valid,)

            T1, _inl1, _n1, _ov1 = optimize(tr.xy, tr.ok, T_pred0)
            # refinement pass: with the optimized pose, re-seed every
            # track at its map-point projection and re-track — recovers
            # tracks whose motion-model guess was outside the LK basin
            # (first frames after init, velocity discontinuities)
            pc1 = T1.apply(xw)
            guess2 = camlib.project(cam, pc1)
            guess2 = jnp.where(
                (alive & (pc1[..., 2] > 0.1))[:, None], guess2, tr.xy
            ).astype(jnp.float32)
            tr2 = klt.track_pyramidal(
                prev_pyr, pyrL, trk_xy, trk_valid, xy_guess=guess2,
                half=KH, iters=KI, max_residual=max_res,
            )
            # rescue ONLY tracks the first pass lost: re-seeding healthy
            # tracks at T1-consistent projections lets repetitive texture
            # snap them one cell over, locking consensus onto a shifted
            # pose (measured: periodic catastrophic inlier collapses)
            use2 = tr2.ok & ~tr.ok
            xy_f = jnp.where(use2[:, None], tr2.xy, tr.xy)
            ok_f = tr.ok | tr2.ok
            # stereo rows: LK-track each feature into the RIGHT image
            # (template = current left patch), seeded at the map-predicted
            # disparity. Mono-only rows leave z-translation weakly
            # constrained (measured: ~1 m prediction spikes every few
            # frames on fast sequences); the u_right residual restores the
            # reference's stereo constraint (frame.h mvuRight).
            pyrR = tuple(
                pyr_ops.build_halfsample_pyramid(
                    imgs_u8[1].astype(jnp.float32), KL
                )
            )
            z1 = jnp.maximum(T1.apply(xw)[..., 2], 0.5)
            disp_pred = cam.bf / z1
            guess_r = xy_f - jnp.stack(
                [disp_pred, jnp.zeros_like(disp_pred)], axis=-1
            )
            trR = klt.track_pyramidal(
                pyrL, pyrR, xy_f, ok_f & trk_valid & alive,
                xy_guess=guess_r, half=KH, iters=KI,
                max_residual=max_res,
            )
            disp = xy_f[:, 0] - trR.xy[:, 0]
            r_ok = (
                trR.ok
                & (jnp.abs(trR.xy[:, 1] - xy_f[:, 1]) < 2.0)
                & (disp > 0.1)
            )
            ur = jnp.where(r_ok, trR.xy[:, 0], -1.0)
            T, inlier, n_in, obs_valid = optimize(xy_f, ok_f, T1, ur=ur)
            trk_xy = xy_f
            # keep LK-healthy tracks alive even when the pose pass calls
            # them outliers this frame (single-KF stereo depth is noisy;
            # killing on chi2 starves the track set within ~10 frames —
            # the reference's matcher re-finds such points every frame)
            trk_valid = ok_f & trk_valid & alive

            # --- ORB rescue branch (cfg.tracker.klt_rescue_min) ---
            def do_rescue(op):
                feats, uright, depth = self._extract_pair_core(imgs_u8)
                K_ = mstate.kf_R.shape[0]
                ref_slot = jnp.clip(mstate.kf_count[0] - 1, 0, K_ - 1)
                b = self._track_core(
                    mstate, ref_slot, feats, uright, depth, T_last, vel
                )
                T_r = SE3(b.T_R.astype(T.R.dtype), b.T_t.astype(T.t.dtype))
                n_r = b.packed[_PK_NIN].astype(n_in.dtype)
                tva_r = feats.valid & (b.matched_mp >= 0)
                better = n_r > n_in

                def take(_):
                    # dtypes pinned to the no-rescue operand (x64 test
                    # runs promote some intermediates)
                    return (T_r, n_r, feats.xy.astype(trk_xy.dtype),
                            b.matched_mp.astype(trk_mp.dtype),
                            feats.level.astype(trk_level.dtype), tva_r)

                return jax.lax.cond(better, take, lambda _: op, None)

            rescue = n_in < rescue_min
            (T, n_in, trk_xy, trk_mp, trk_level, trk_valid) = jax.lax.cond(
                rescue, do_rescue, lambda op: op,
                (T, n_in, trk_xy, trk_mp, trk_level, trk_valid),
            )
            n_tracks = jnp.sum(trk_valid)

            fs = carry[0] + 1
            ref_tracked = jnp.maximum(carry[1], 1)
            K = mstate.kf_R.shape[0]
            ok = n_in >= min_ok_static
            capacity = mstate.kf_count[0] < K - 1
            timeout = fs >= tr_cfg.max_frames_between_kf
            min_frames_ok = fs >= tr_cfg.min_frames_between_kf
            starving = n_tracks < tr_cfg.klt_min_tracks
            weak = n_tracks.astype(jnp.float32) < (
                tr_cfg.kf_ref_ratio * ref_tracked.astype(jnp.float32)
            )
            kf_new = (
                ok & capacity & jnp.logical_not(loc_only)
                & (timeout | (min_frames_ok & (starving | weak)))
            )
            slot = mstate.kf_count[0]

            def do_kf(op):
                ms, txy, tmp, tlv, tva = op
                feats, uright, depth = self._extract_pair_core(imgs_u8)
                # associate fresh keypoints to surviving tracks by
                # position (the respawned track inherits the map point);
                # one-keypoint-per-track via the reverse argmin
                d2 = jnp.sum(
                    (feats.xy[:, None, :] - txy[None, :, :]) ** 2, axis=-1
                )
                d2t = jnp.where(tva[None, :], d2, jnp.inf)
                j = jnp.argmin(d2t, axis=1)
                dmin = jnp.min(d2t, axis=1)
                d2k = jnp.where(feats.valid[:, None], d2t, jnp.inf)
                i_best = jnp.argmin(d2k, axis=0)
                mutual = i_best[j] == jnp.arange(N)
                matched_mp = jnp.where(
                    feats.valid & (dmin < r2) & mutual, tmp[j], -1
                )
                ms = self._create_kf_core(
                    ms, slot, T, frame_id, ts, feats, uright, depth,
                    matched_mp, kf_budget,
                )
                new_mp = ms.kf_mp[slot]
                tva2 = feats.valid & (new_mp >= 0)
                return ms, feats.xy, new_mp, feats.level, tva2

            (mstate, trk_xy, trk_mp, trk_level, trk_valid) = jax.lax.cond(
                kf_new, do_kf, lambda op: op,
                (mstate, trk_xy, trk_mp, trk_level, trk_valid),
            )
            carry_new = jnp.where(
                kf_new,
                jnp.stack([jnp.int32(0), n_tracks.astype(jnp.int32)]),
                jnp.stack([fs, carry[1]]),
            ).astype(jnp.int32)

            vel_new = T.compose(T_last.inverse())
            ref_safe = jnp.clip(slot - 1, 0, K - 1)
            packed = jnp.concatenate(
                [
                    T.R.reshape(-1), T.t,
                    mstate.kf_R[ref_safe].reshape(-1),
                    mstate.kf_t[ref_safe],
                    jnp.stack([
                        n_in.astype(jnp.float32),
                        jnp.sum(obs_valid).astype(jnp.float32),
                        n_tracks.astype(jnp.float32),
                        jnp.zeros((), jnp.float32),
                        jnp.zeros((), jnp.float32),
                        mstate.mp_count[0].astype(jnp.float32),
                        kf_new.astype(jnp.float32),
                        jnp.where(kf_new, slot, -1).astype(jnp.float32),
                        mstate.kf_count[0].astype(jnp.float32),
                    ]),
                ]
            ).astype(jnp.float32)
            bundle = TrackBundle(
                T_R=T.R, T_t=T.t, vel_R=vel_new.R, vel_t=vel_new.t,
                matched_mp=trk_mp, packed=packed,
            )
            return (bundle, mstate, trk_xy, trk_mp, trk_level, trk_valid,
                    carry_new, pyrL)

        self._frame_klt_fn = jax.jit(
            _frame_klt, donate_argnums=(1, 2, 3, 4, 5, 6, 7)
        )

    # ------------------------------------------------------------------ API

    def process_stereo(self, img_left, img_right,
                       timestamp: float) -> TrackStats:
        self._pre_frame(timestamp)
        imgs = self._upload_images(img_left, img_right)
        if self.state == NOT_INITIALIZED or self.prev_pyr_dev is None:
            self.flush()
            feats, uright, depth = self._extract_pair_fn(imgs)
            st = self._track_entry(feats, uright, depth, timestamp, None)
            if self.state == OK:
                self._seed_tracks(feats, self.map.kf_mp[self.ref_kf])
                self.prev_pyr_dev = self._pyr_fn(imgs)
            return st
        self.frame_id += 1
        with self.timer.stage("frame_core"):
            (bundle, self.map, self.trk_xy_dev, self.trk_mp_dev,
             self.trk_level_dev, self.trk_valid_dev, self.carry_dev,
             self.prev_pyr_dev) = self._frame_klt_fn(
                imgs, self.map, self.prev_pyr_dev, self.trk_xy_dev,
                self.trk_mp_dev, self.trk_level_dev, self.trk_valid_dev,
                self.carry_dev, self.T_dev, self.vel_dev,
                jnp.int32(self.frame_id),
                jnp.asarray(timestamp, jnp.float32),
                jnp.asarray(self.localization_only),
            )
        job = FrameJob(self.frame_id, timestamp, self.ref_kf, bundle,
                       None, None, None, fused=True, imgs=imgs)
        bundle.packed.copy_to_host_async()
        self.T_dev = SE3(bundle.T_R, bundle.T_t)
        self.vel_dev = SE3(bundle.vel_R, bundle.vel_t)
        self._inflight.append(job)
        st = None
        while len(self._inflight) > self.pipeline_depth:
            st = self._finalize(self._inflight.popleft())
        return st if st is not None else TrackStats(
            n_kfs=self.n_kf, n_mps=self.n_mp, state=self.state
        )

    # --------------------------------------------------------------- hooks

    def _seed_tracks(self, feats, mp_ids):
        """Respawn the track set from a keyframe's keypoints (only the
        map-point-bearing ones constrain pose)."""
        self.trk_xy_dev = feats.xy
        self.trk_mp_dev = jnp.asarray(mp_ids, jnp.int32)
        self.trk_level_dev = feats.level
        self.trk_valid_dev = feats.valid & (self.trk_mp_dev >= 0)

    def _clear_tracks(self):
        N = self.cfg.extractor.n_features
        self.trk_xy_dev = jnp.zeros((N, 2), jnp.float32)
        self.trk_mp_dev = jnp.full((N,), -1, jnp.int32)
        self.trk_level_dev = jnp.zeros((N,), jnp.int32)
        self.trk_valid_dev = jnp.zeros((N,), bool)
        self.prev_pyr_dev = None

    def reset(self):
        super().reset()
        self._clear_tracks()

    def _create_map_in_atlas(self):
        super()._create_map_in_atlas()
        self._clear_tracks()

    def _handle_failure(self, job: FrameJob, st: TrackStats,
                        T_np: np.ndarray) -> TrackStats:
        """KLT frames carry no descriptors; extract on demand so the
        relocalization ladder can run, then respawn tracks from the
        relocalized local-map association."""
        if job.feats is None and job.imgs is not None:
            feats, ur, dp = self._extract_pair_fn(job.imgs)
            job = dataclasses.replace(job, feats=feats, uright=ur, depth=dp)
        st = super()._handle_failure(job, st, T_np)
        if st.state == OK and job.imgs is not None:
            # relocalized: rebuild the track set against the local map
            bundle = self._track_fn(
                self.map, jnp.int32(max(self.ref_kf, 0)), job.feats,
                job.uright, job.depth, self.T_dev, SE3.identity(),
            )
            self._seed_tracks(job.feats, bundle.matched_mp)
            self.prev_pyr_dev = self._pyr_fn(job.imgs)
        return st


def make_stereo_vo(cfg: SystemConfig, timer=None, vocab=None) -> StereoVO:
    """Frontend dispatch (cfg.tracker.frontend)."""
    if cfg.tracker.frontend == "klt":
        return KltStereoVO(cfg, timer=timer, vocab=vocab)
    return StereoVO(cfg, timer=timer, vocab=vocab)
