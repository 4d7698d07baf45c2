"""Stereo/mono visual-inertial odometry pipeline.

Semantic reference — the inertial branches of the reference's core loop:
  * `Tracking::PreintegrateIMU` (/root/reference/src/core/tracking.cpp:1384)
    — per-frame integration of the sample queue,
  * `Tracking::PredictStateIMU` (tracking.cpp:1507) — IMU pose prediction
    replacing the constant-velocity model,
  * `Optimizer::PoseInertialOptimizationLastFrame` (optimizer.cpp:7095) —
    per-frame visual+inertial pose/velocity solve,
  * `LocalMapping::InitializeIMU` (localmapping.cpp:1231) — staged
    gravity/scale/bias initialization (VIBA1 @2s, VIBA2 @15s analogues),
  * `Optimizer::LocalInertialBA` (optimizer.cpp:3974) — keyframe-rate
    sliding-window visual-inertial BA,
  * the IMU branch of the RECENTLY_LOST ladder (tracking.cpp:1816-1835) —
    dead reckoning bridges the grace window.

TPU design:
  * The per-keyframe preintegration chain lives DEVICE-RESIDENT as one
    stacked `Preintegrated` with a leading (max_keyframes,) dim; keyframe
    creation closes the running segment with one tiny scatter dispatch, and
    keyframe culling welds the chain by composing neighbours in closed form
    (`preintegration.compose`) instead of re-integrating raw samples.
  * Per frame: ONE `integrate` scan over a fixed-capacity padded sample
    buffer, one `compose` into the running segment, and one fused
    track program (predict -> project -> match -> 9-dof GN with the
    inertial prior). No data-dependent shapes anywhere.
  * VI-BA gathers its temporal window (consecutive chain keyframes) and
    the matching preintegration rows entirely on device.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.imu import preintegration as pre
from vi_slam_tpu.lie import se3, so3
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.ops import match as match_ops
from vi_slam_tpu.optim import pose_inertial
from vi_slam_tpu.optim import inertial_init as iinit
from vi_slam_tpu.optim import smoother as smoother_mod
from vi_slam_tpu.optim import vi_ba
from vi_slam_tpu.pipeline import steps
from vi_slam_tpu.pipeline.stereo_vo import (
    LOST,
    NOT_INITIALIZED,
    OK,
    RECENTLY_LOST,
    FrameJob,
    StereoVO,
    TrackBundle,
    TrackStats,
    make_oracle_features,
    _PK_NIN,
)
from vi_slam_tpu.utils.config import SystemConfig
from vi_slam_tpu.utils.precision import precise


def _pad_imu(samples: np.ndarray, t_prev: float, t_now: float, cap: int):
    """Pad an (n, 7) [t, acc3, gyro3] batch into fixed-capacity
    (acc (cap,3), gyro (cap,3), dts (cap,)) with per-sample dt spans
    covering (t_prev, t_now] exactly (zero-dt rows are skipped by the
    integrator)."""
    acc = np.zeros((cap, 3), np.float32)
    gyro = np.zeros((cap, 3), np.float32)
    dts = np.zeros((cap,), np.float32)
    if samples is None or len(samples) == 0:
        return acc, gyro, dts
    s = np.asarray(samples, np.float64)[:cap]
    t = s[:, 0]
    n = len(s)
    # dt_i spans from the previous stamp (or t_prev) to this stamp; the last
    # sample's span is stretched to t_now (PreintegrateIMU boundary handling,
    # tracking.cpp:1415-1460 simplified to zero-order hold)
    prev = np.concatenate([[t_prev], t[:-1]])
    d = t - prev
    d[-1] = max(t_now - prev[-1], 0.0)
    acc[:n] = s[:, 1:4]
    gyro[:n] = s[:, 4:7]
    dts[:n] = np.maximum(d, 0.0)
    return acc, gyro, dts


class StereoInertialVO(StereoVO):
    """IMU_STEREO / IMU_RGBD sensor mode (system.h:96-102): StereoVO with
    the four inertial subsystems wired in."""

    def __init__(self, cfg: SystemConfig, timer=None, vocab=None):
        super().__init__(cfg, timer=timer, vocab=vocab)
        ic = cfg.imu
        self.calib = pre.ImuCalib.make(
            ic.noise_gyro, ic.noise_acc, ic.walk_gyro, ic.walk_acc, ic.freq
        )
        # fixed sample capacity per frame: generous 4x nominal rate
        self.imu_cap = int(4 * max(ic.freq / cfg.camera.fps, 1))
        if ic.T_bc is not None:
            T = np.asarray(ic.T_bc, np.float64).reshape(4, 4)
        else:
            T = np.eye(4)
        self.R_bc = jnp.asarray(T[:3, :3], jnp.float32)
        self.t_bc = jnp.asarray(T[:3, 3], jnp.float32)
        self.gravity_mag = float(ic.gravity)

        K = cfg.map.max_keyframes
        ident = pre.identity_preintegrated()
        self.kf_preint_dev = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (K, *x.shape)).copy(), ident
        )
        self.kf_vel_dev = jnp.zeros((K, 3), jnp.float32)
        self.bg_dev = jnp.zeros((3,), jnp.float32)
        self.ba_dev = jnp.zeros((3,), jnp.float32)
        self.g_w_dev = jnp.zeros((3,), jnp.float32)
        self.vel_w_dev = jnp.zeros((3,), jnp.float32)
        self._accum = ident
        self.prior_dev = pose_inertial.initial_prior(
            SE3.identity(), jnp.zeros((3,)), jnp.zeros((3,)), jnp.zeros((3,))
        )
        self._last_ts: Optional[float] = None
        self.imu_ready = False
        self._init_stage = 0  # 0 = none, 1 = first init, 2 = refined
        self.kf_chain: List[int] = []  # live KF slots in temporal order
        # slots whose incoming chain edge has NO physical preintegration
        # (first keyframe after an inertial map merge seam)
        self._chain_breaks: set = set()
        # bad-IMU detection (mbBadImu, localmapping.cpp:120-128): a
        # divergent initialization forces an active-map reset instead of
        # silently corrupting the map
        self.bad_imu = False
        self._init_attempts = 0
        # per-frame fixed-lag smoother window (the ISAM2/GTSAM capability
        # on the tracking path, gtsamoptimizer.h:107-262): device-resident,
        # threaded through every inertial frame dispatch
        self.smoother_win = smoother_mod.allocate_window(
            cfg.ba.smoother_window, cfg.ba.smoother_vis
        )
        self.smoother_count = jnp.zeros((), jnp.int32)
        self._build_vio_fns()

    # ----------------------------------------------------- device programs

    def _build_vio_fns(self):
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
        level_scales = self.level_scales
        n_feats = ext_cfg.n_features
        n_window = cfg.ba.max_local_kfs
        R_bc, t_bc = self.R_bc, self.t_bc
        min_matches = cfg.tracker.min_matches_motion

        def _integrate_and_accum(accum, acc, gyro, dts, bg, ba):
            p_frame = pre.integrate(self.calib, acc, gyro, dts, bg, ba)
            return pre.compose(accum, p_frame), p_frame

        self._integrate_fn = jax.jit(_integrate_and_accum)

        walk_g2_f = float(cfg.imu.walk_gyro) ** 2
        walk_a2_f = float(cfg.imu.walk_acc) ** 2

        SW = cfg.ba.smoother_window
        SV = cfg.ba.smoother_vis
        sm_iters = cfg.ba.smoother_iters
        use_smoother = cfg.ba.use_smoother
        nominal_dt = 1.0 / max(cfg.camera.fps, 1.0)
        wig_s = jnp.asarray(1.0 / (walk_g2_f * nominal_dt), jnp.float32)
        wia_s = jnp.asarray(1.0 / (walk_a2_f * nominal_dt), jnp.float32)

        def _smoother_step(win, count, T, v, bg, ba, p_frame, obs,
                           anchor_ok, g_w):
            """One fixed-lag smoother update (the per-frame ISAM2-style
            incremental pass, gtsamoptimizer.h:107-262 /
            iSAM2Optimizer.h:123-130): slide (exact Schur marginalization
            of the oldest frame state, optimizer.cpp:4581), insert the
            robust-GN state with its inlier visual anchors, re-optimize
            the whole window warm-started."""
            # top-SV inlier anchors, finest levels (lowest sigma2) first
            score = jnp.where(anchor_ok, -obs.sigma2, -jnp.inf)
            _, sel = jax.lax.top_k(score, SV)
            sel = sel.astype(jnp.int32)
            vvalid = anchor_ok[sel] & jnp.isfinite(score[sel])
            xw = obs.xw[sel]
            uv = obs.uvr[sel, :2]
            s2 = jnp.maximum(obs.sigma2[sel], 1e-6)

            full = count >= SW
            win = jax.lax.cond(
                full,
                lambda w: smoother_mod.marginalize_oldest(
                    cam, w, g_w, wig_s, wia_s
                ),
                lambda w: w,
                win,
            )
            k = jnp.minimum(count, SW - 1)
            prev = jnp.clip(k - 1, 0, SW - 2)
            win = win._replace(
                T_R=win.T_R.at[k].set(T.R),
                T_t=win.T_t.at[k].set(T.t),
                vel=win.vel.at[k].set(v),
                bg=win.bg.at[k].set(bg),
                ba=win.ba.at[k].set(ba),
                valid=win.valid.at[k].set(True),
                vis_xw=win.vis_xw.at[k].set(xw),
                vis_uv=win.vis_uv.at[k].set(uv),
                vis_sigma2=win.vis_sigma2.at[k].set(s2),
                vis_valid=win.vis_valid.at[k].set(vvalid),
                preint=jax.tree.map(
                    lambda d, s: d.at[prev].set(
                        jnp.where(k > 0, s, d[prev])
                    ),
                    win.preint, p_frame,
                ),
                inertial_valid=win.inertial_valid.at[prev].set(
                    jnp.where(k > 0, True, win.inertial_valid[prev])
                ),
            )
            prior_H0 = jnp.diag(jnp.asarray(
                [1e2] * 6 + [1e1] * 3 + [1e4] * 3 + [1e3] * 3, jnp.float32
            ))
            win = jax.lax.cond(
                count == 0,
                lambda w: w._replace(
                    prior_H=prior_H0, prior_R=T.R, prior_t=T.t,
                    prior_vel=v, prior_bg=bg, prior_ba=ba,
                ),
                lambda w: w,
                win,
            )
            win, _cost = smoother_mod.optimize_window(
                cam, win, g_w, wig_s, wia_s, iters=sm_iters
            )
            T_out = SE3(win.T_R[k], win.T_t[k])
            return (win, count + 1, T_out, win.vel[k], win.bg[k],
                    win.ba[k])

        @precise
        def _track_vio(mstate, ref_slot, feats, uright, depth, T_last,
                       v_last, p_frame, bg, ba, g_w, prior, win, count):
            """Fused inertial frame core: PredictStateIMU + projection
            matching + the full PoseInertialOptimizationLastFrame graph
            (both frame states move; the previous frame carries the
            marginal prior and is Schur-marginalized back out), one
            dispatch."""
            T_pred, v_pred = pose_inertial.predict_camera_pose(
                p_frame, T_last, v_last, bg, ba, g_w, R_bc, t_bc
            )
            window = steps.covis_window(mstate, ref_slot, n_window)
            mp_ids, mp_mask = steps.gather_local_points(mstate, window, n_local)
            proj = steps.project_local_points(
                cam, mstate, mp_ids, mp_mask, T_pred, W, H,
                n_levels=ext_cfg.n_levels, scale_factor=ext_cfg.scale_factor,
            )
            dt = jnp.maximum(p_frame.dt, 1e-3)
            wig = 1.0 / (walk_g2_f * dt)
            wia = 1.0 / (walk_a2_f * dt)

            def run_match(rad):
                m = match_ops.search_by_projection(
                    proj.uv, proj.level, proj.desc, proj.valid,
                    feats.xy, feats.level, feats.desc, feats.valid,
                    radius=rad, level_scales=level_scales,
                    max_dist=th_high, ratio=ratio,
                )
                m = match_ops.resolve_duplicate_targets(m, n_feats)
                obs, kp_idx = steps.build_pose_obs(proj, m, feats, uright)
                (T_opt, v_opt, bg_opt, ba_opt, prior_new, inlier,
                 n_in) = pose_inertial.pose_inertial_prior_optimize(
                    cam, prior, T_last, v_last, bg, ba, T_pred, v_pred,
                    obs, p_frame, g_w, R_bc, t_bc, wig, wia,
                    rounds=rounds, iters=iters,
                )
                return (m, kp_idx, T_opt, v_opt, bg_opt, ba_opt, prior_new,
                        inlier, n_in)

            r1 = run_match(radius)
            # wide-radius retry only when the narrow pass failed (lax.cond:
            # the second match+GN costs nothing on healthy frames)
            use_wide = r1[-1] < min_matches
            (m, kp_idx, T, v_new, bg_new, ba_new, prior_new, inlier,
             n_in) = jax.lax.cond(
                use_wide, lambda: run_match(3.0 * radius), lambda: r1
            )

            ok = m.ok & proj.valid & inlier
            if use_smoother:
                obs_s, _ = steps.build_pose_obs(proj, m, feats, uright)
                win, count, T_sm, v_sm, _bg_sm, _ba_sm = _smoother_step(
                    win, count, T, v_new, bg_new, ba_new, p_frame, obs_s,
                    ok & obs_s.valid, g_w,
                )
                # consume the smoothed pose/velocity; biases stay with the
                # staged estimator (InertialOptimization priors +
                # LocalInertialBA) — a 6-frame window under generic priors
                # cannot observe biases better than the KF-rate chain
                T, v_new = T_sm, v_sm
            matched_mp = steps.scatter_matches_to_kps(
                n_feats, kp_idx, jnp.where(mp_ids >= 0, mp_ids, -1), ok
            )
            vel_se3 = T.compose(T_last.inverse())  # keep SE3 motion mirror
            close = (depth > 0) & (depth < self.close_depth) & feats.valid
            has_mp = matched_mp >= 0
            ref_safe = jnp.clip(ref_slot, 0, mstate.kf_R.shape[0] - 1)
            packed = jnp.concatenate(
                [
                    T.R.reshape(-1), T.t,
                    mstate.kf_R[ref_safe].reshape(-1), mstate.kf_t[ref_safe],
                    jnp.stack([
                        n_in.astype(jnp.float32),
                        jnp.sum(m.ok & proj.valid).astype(jnp.float32),
                        jnp.sum(mp_mask).astype(jnp.float32),
                        jnp.sum(close & has_mp).astype(jnp.float32),
                        jnp.sum(close & ~has_mp).astype(jnp.float32),
                        mstate.mp_count[0].astype(jnp.float32),
                        jnp.zeros((), jnp.float32),
                        jnp.full((), -1.0, jnp.float32),
                        mstate.kf_count[0].astype(jnp.float32),
                    ]),
                ]
            ).astype(jnp.float32)
            bundle = TrackBundle(
                T_R=T.R, T_t=T.t, vel_R=vel_se3.R, vel_t=vel_se3.t,
                matched_mp=matched_mp, packed=packed,
            )
            return bundle, v_new, bg_new, ba_new, prior_new, win, count

        self._track_vio_fn = jax.jit(_track_vio, donate_argnums=(12,))

        tr_cfg = cfg.tracker
        min_ok_static, kf_budget = self._kf_decision_consts

        def _frame_vio(imgs_u8, mstate, kf_preint, kf_vel, carry, T_last,
                       v_last, bg, ba, g_w, prior, accum, acc, gyro, dts,
                       frame_id, ts, loc_only, win, count):
            """Fused inertial per-frame program (the pipelined VIO path):
            extract + stereo + preintegrate + inertial track + KEYFRAME
            DECISION AND CREATION (incl. closing the preintegration
            segment) in one dispatch — the inertial mirror of the visual
            `_frame` (tracking.cpp:1229 GrabImageStereo + :1384
            PreintegrateIMU + :2925/:3063 NeedNew/CreateNewKeyFrame)."""
            feats, uright, depth = self._extract_pair_core(imgs_u8)
            p_frame = pre.integrate(self.calib, acc, gyro, dts, bg, ba)
            accum2 = pre.compose(accum, p_frame)
            K = mstate.kf_R.shape[0]
            ref_slot = jnp.clip(mstate.kf_count[0] - 1, 0, K - 1)
            bundle, v_new, bg_new, ba_new, prior_new, win, count = _track_vio(
                mstate, ref_slot, feats, uright, depth, T_last, v_last,
                p_frame, bg, ba, g_w, prior, win, count,
            )
            from vi_slam_tpu.pipeline.stereo_vo import (
                _PK_NCLOSE, _PK_NCREAT, _PK_KFFLAG, _PK_KFSLOT, _PK_KFCOUNT,
            )

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

            def do_create(ops):
                ms, kfp, kfv, acc_run = ops
                ms = self._create_kf_core(
                    ms, slot, T_new, frame_id, ts, feats, uright, depth,
                    bundle.matched_mp, kf_budget,
                )
                kfp, kfv, fresh = _close_segment(
                    kfp, kfv, slot, acc_run, v_new, bg_new, ba_new
                )
                return ms, kfp, kfv, fresh

            mstate, kf_preint, kf_vel, accum3 = jax.lax.cond(
                kf_new, do_create, lambda ops: ops,
                (mstate, kf_preint, kf_vel, accum2),
            )
            carry_new = jnp.where(
                kf_new,
                jnp.stack([jnp.int32(0), n_in]),
                jnp.stack([fs, carry[1]]),
            ).astype(jnp.int32)
            packed = (
                p.at[_PK_KFFLAG].set(kf_new.astype(jnp.float32))
                .at[_PK_KFSLOT].set(jnp.where(kf_new, slot, -1).astype(jnp.float32))
                .at[_PK_KFCOUNT].set(mstate.kf_count[0].astype(jnp.float32))
            )
            bundle = bundle._replace(packed=packed)
            return (bundle, mstate, kf_preint, kf_vel, carry_new, accum3,
                    v_new, bg_new, ba_new, prior_new, win, count,
                    feats, uright, depth)

        self._frame_vio_fn = jax.jit(_frame_vio, donate_argnums=(1, 2, 3, 18))

        def _close_segment(kf_preint, kf_vel, slot, accum, v, bg, ba):
            """Keyframe creation: store the finished segment + velocity,
            return a reset accumulator linearized at the current biases."""
            kf_preint = jax.tree.map(
                lambda buf, x: buf.at[slot].set(x), kf_preint, accum
            )
            kf_vel = kf_vel.at[slot].set(v)
            fresh = pre.identity_preintegrated()._replace(
                bias_gyro=bg, bias_acc=ba
            )
            return kf_preint, kf_vel, fresh

        self._close_segment_fn = jax.jit(_close_segment)

        def _weld_inertial(st_preint, st_vel, act_preint, act_vel, R_S,
                           s_S, kf_off):
            """Inertial map-merge weld: scatter the active map's chain
            buffers into the stored map's at +kf_off; velocities rotate
            (and scale) into the stored world, preintegration segments are
            body-frame and copy unchanged."""
            K = st_vel.shape[0]
            k = jnp.arange(K, dtype=jnp.int32)
            dstk = jnp.where(k + kf_off < K, k + kf_off, K)
            preint = jax.tree.map(
                lambda d, s: d.at[dstk].set(s, mode="drop"),
                st_preint, act_preint,
            )
            vel_rot = s_S * jnp.einsum("ij,kj->ki", R_S, act_vel)
            vel = st_vel.at[dstk].set(vel_rot, mode="drop")
            return preint, vel

        self._weld_inertial_fn = jax.jit(_weld_inertial)

        def _weld_segment(kf_preint, culled, nxt):
            """Keyframe culling: compose the culled KF's incoming segment
            into its successor's (MergePrevious semantics, imu.cpp:305)."""
            p_c = jax.tree.map(lambda x: x[culled], kf_preint)
            p_n = jax.tree.map(lambda x: x[nxt], kf_preint)
            merged = pre.compose(p_c, p_n)
            return jax.tree.map(
                lambda buf, x: buf.at[nxt].set(x), kf_preint, merged
            )

        self._weld_segment_fn = jax.jit(_weld_segment)

        INIT_K = 16
        self._init_k = INIT_K

        def _gather_init(mstate, kf_preint, window, pre_ok):
            """Inputs for inertial init: body poses + stacked segments for
            a (INIT_K,) -1-padded temporal window of chain slots; pre_ok
            masks edges without a physical preintegration segment."""
            K = mstate.kf_R.shape[0]
            safe = jnp.clip(window, 0, K - 1)
            poses = SE3(mstate.kf_R[safe], mstate.kf_t[safe])
            Rwb, pwb = vi_ba._body_from_cam(poses, R_bc, t_bc)
            seg = jax.tree.map(lambda x: x[safe[1:]], kf_preint)
            valid = (window[1:] >= 0) & (window[:-1] >= 0) & pre_ok
            # seed gravity direction from accumulated velocity deltas
            # (InitializeIMU dirG accumulation, localmapping.cpp:1276)
            w = valid.astype(jnp.float32)
            dirG = -jnp.sum(
                jnp.einsum("kij,kj->ki", Rwb[:-1], seg.dV) * w[:, None],
                axis=0,
            )
            dirG = dirG / jnp.maximum(jnp.linalg.norm(dirG), 1e-9)
            g0_hat = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
            vaxis = jnp.cross(g0_hat, dirG)
            s = jnp.linalg.norm(vaxis)
            c = jnp.dot(g0_hat, dirG)
            ang = jnp.arctan2(s, c)
            axis = vaxis / jnp.maximum(s, 1e-9)
            Rwg0 = jnp.where(
                s > 1e-6, so3.exp(axis * ang), jnp.eye(3, dtype=jnp.float32)
            )
            return Rwb, pwb, seg, valid, Rwg0

        self._gather_init_fn = jax.jit(_gather_init)

        ba_cfg = cfg.ba
        walk_g2 = float(cfg.imu.walk_gyro) ** 2
        walk_a2 = float(cfg.imu.walk_acc) ** 2

        def _make_vi_ba(Wv, WF, n_iters):
            """Builds a jitted VI-BA program over a (Wv,) temporal chain
            window plus WF fixed covisible anchors, n_iters LM iterations.
            Instantiated twice: the keyframe-rate LocalInertialBA and the
            post-init whole-chain FullInertialBA."""
            WT = Wv + WF
            fn = _vi_ba_body(Wv, WF, WT, n_iters)
            return jax.jit(fn, donate_argnums=(0,))

        def _vi_ba_body(Wv, WF, WT, n_iters):
            @precise
            def _vi_local_ba(mstate, kf_preint, kf_vel, temporal, fixed_t,
                             pre_ok, last_idx, bg, ba, g_w, ref_slot):
                """LocalInertialBA (optimizer.cpp:3974): the temporal
                keyframe chain carries pose/vel/bias states and inertial
                edges; on top, the most-covisible OUT-of-window keyframes
                join as fixed vertices (optimizer.cpp:4076
                lFixedKeyFrames) so shared map points stay anchored to
                the rest of the map. Scatters poses/points/velocities
                back and returns the pose-chain correction like the
                visual `_local_ba`."""
                K = mstate.kf_R.shape[0]
                if WF > 0:
                    # fixed covisible anchors: top covis of ref, minus
                    # temporal ones
                    cand = steps.covis_window(mstate, ref_slot, WT)
                    in_temp = jnp.any(
                        cand[:, None] == temporal[None, :], axis=1
                    ) | (cand < 0)
                    key = jnp.where(in_temp, WT + 1, jnp.arange(WT))
                    order = jnp.argsort(key)[:WF]
                    anchors = jnp.where(
                        key[order] <= WT, cand[order], -1
                    ).astype(jnp.int32)
                    window = jnp.concatenate([temporal, anchors])
                    fixed = jnp.concatenate(
                        [fixed_t, jnp.ones((WF,), bool)]
                    )
                else:
                    window = temporal
                    fixed = fixed_t
                mp_ids, _ = steps.gather_local_points(
                    mstate, temporal, ba_cfg.max_local_points
                )
                visual = steps.gather_ba_problem(
                    cam, mstate, window, fixed, mp_ids,
                    n_window=WT, n_points=ba_cfg.max_local_points,
                    n_obs=cfg.map.max_obs_per_point,
                )
                safe = jnp.clip(window, 0, K - 1)
                vel = kf_vel[safe]
                seg = jax.tree.map(lambda x: x[safe[1:]], kf_preint)
                # inertial edges only along the temporal chain prefix;
                # pre_ok masks edges with no physical preintegration —
                # the seam of an inertial map merge (MergeInertialBA must
                # not link keyframes across the time gap,
                # optimizer.cpp:6129 welding-window semantics)
                ivalid = (
                    (window[1:] >= 0) & (window[:-1] >= 0)
                    & (jnp.arange(WT - 1) < Wv - 1)
                    & jnp.concatenate(
                        [pre_ok, jnp.zeros((WT - Wv,), bool)]
                    )
                )
                dt = jnp.maximum(seg.dt, 1e-3)
                prob = vi_ba.VIBAProblem(
                    visual=visual,
                    vel=vel,
                    bg=jnp.broadcast_to(bg, (WT, 3)),
                    ba=jnp.broadcast_to(ba, (WT, 3)),
                    preint=seg,
                    inertial_valid=ivalid,
                    gravity=g_w,
                    walk_info_g=1.0 / (walk_g2 * dt),
                    walk_info_a=1.0 / (walk_a2 * dt),
                    R_bc=R_bc, t_bc=t_bc,
                )
                res = vi_ba.vi_bundle_adjust(
                    cam, prob, iters=n_iters, use_huber=True
                )
                ref_pre = SE3(mstate.kf_R[ref_slot], mstate.kf_t[ref_slot])
                mstate = steps.scatter_ba_result(
                    mstate, window, fixed, mp_ids, res.poses, res.points
                )
                ref_post = SE3(mstate.kf_R[ref_slot], mstate.kf_t[ref_slot])
                # drop-mode scatter: pad rows must not clobber slot 0
                upd = (window >= 0) & ~fixed
                kf_vel = kf_vel.at[jnp.where(upd, window, K)].set(
                    res.vel, mode="drop"
                )
                delta = ref_pre.inverse().compose(ref_post)
                return (mstate, kf_vel, res.bg[last_idx], res.ba[last_idx],
                        delta.R, delta.t)

            return _vi_local_ba

        Wv = ba_cfg.inertial_window
        WF = min(6, ba_cfg.max_fixed_kfs)
        self._vi_ba_fn = _make_vi_ba(Wv, WF, ba_cfg.local_ba_iters)
        # FullInertialBA (optimizer.cpp:385): whole temporal chain, no
        # covisible anchors, only the origin fixed, more iterations. At
        # inertial-init time the map is small, so a 32-slot chain window
        # covers it entirely (the reference's call sites,
        # localmapping.cpp:1320-1390, run it exactly then).
        self._full_w = 32
        self._full_vi_ba_fn = _make_vi_ba(self._full_w, 0,
                                          2 * ba_cfg.local_ba_iters)

        def _apply_init(kf_vel, window, vel, v_now_slot):
            K = kf_vel.shape[0]
            # drop-mode scatter: pad rows must not clobber slot 0
            idx = jnp.where(window >= 0, window, K)
            kf_vel = kf_vel.at[idx].set(vel, mode="drop")
            return kf_vel, kf_vel[v_now_slot]

        self._apply_init_fn = jax.jit(_apply_init)

    # ------------------------------------------------------------------ API

    def process_oracle_inertial(self, xy, uright, depth, desc, level,
                                imu_samples, timestamp: float) -> TrackStats:
        """Oracle-feature inertial path (tests/benchmarks without the image
        frontend). `imu_samples`: (n, 7) [t, acc xyz, gyro xyz] in
        (t_prev, t_now]."""
        self._pre_frame(timestamp)
        feats, ur, dp = make_oracle_features(
            self.cfg.extractor.n_features, xy, uright, depth, desc, level
        )
        return self._inertial_entry(feats, ur, dp, imu_samples, timestamp)

    def process_stereo_inertial(self, img_left, img_right, imu_samples,
                                timestamp: float) -> TrackStats:
        """Image inertial path (GrabImageStereo + GrabImuData semantics,
        tracking.cpp:1229/:1362). Before inertial initialization (and
        while recovering) the path is synchronous; once the inertial
        state is live it pipelines exactly like the visual path — the
        IMU chain couples consecutive frames only through device-resident
        state (accumulator, biases, marginal prior), so dispatches chain
        without host round trips."""
        self._pre_frame(timestamp)
        if not self.imu_ready or self.state != OK or self._last_ts is None:
            self.flush()
            self._vio_pipelined = False
            imgs = self._upload_images(img_left, img_right)
            feats, ur, dp = self._extract_pair_fn(imgs)
            return self._inertial_entry(feats, ur, dp, imu_samples,
                                        timestamp)
        if not getattr(self, "_vio_pipelined", False):
            # entering the pipelined regime: sync the device KF-decision
            # carry with the host mirrors from the synchronous phase
            self.carry_dev = jnp.asarray(
                [self.frames_since_kf, max(self._ref_kf_tracked, 1)],
                jnp.int32,
            )
            self._vio_pipelined = True
        imgs = self._upload_images(img_left, img_right)
        acc, gyro, dts = _pad_imu(
            imu_samples, self._last_ts, timestamp, self.imu_cap
        )
        self._last_ts = timestamp
        self.frame_id += 1
        with self.timer.stage("frame_core"):
            (bundle, self.map, self.kf_preint_dev, self.kf_vel_dev,
             self.carry_dev, self._accum, self.vel_w_dev, self.bg_dev,
             self.ba_dev, self.prior_dev, self.smoother_win,
             self.smoother_count, feats, ur, dp) = (
                self._frame_vio_fn(
                    imgs, self.map, self.kf_preint_dev, self.kf_vel_dev,
                    self.carry_dev, self.T_dev, self.vel_w_dev,
                    self.bg_dev, self.ba_dev, self.g_w_dev, self.prior_dev,
                    self._accum, jnp.asarray(acc), jnp.asarray(gyro),
                    jnp.asarray(dts), jnp.int32(self.frame_id),
                    jnp.asarray(timestamp, jnp.float32),
                    jnp.asarray(self.localization_only),
                    self.smoother_win, self.smoother_count,
                )
            )
        job = FrameJob(self.frame_id, timestamp, self.ref_kf, bundle,
                       feats, ur, dp, fused=True)
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

    def _on_keyframe_created(self, job: FrameJob, slot: int):
        """Fused-path hook: the device already created the KF and closed
        its preintegration segment; the host mirrors the chain and drives
        the staged inertial init."""
        if job.fused:
            self.kf_chain.append(slot)
            self._maybe_init_imu()

    def _inertial_entry(self, feats, ur, dp, imu_samples,
                        timestamp: float) -> TrackStats:
        p_frame = self._preintegrate(imu_samples, timestamp)
        if self.state == NOT_INITIALIZED:
            return self._track_entry(feats, ur, dp, timestamp, None)
        if self.imu_ready and p_frame is not None:
            (bundle, v_new, bg_new, ba_new, prior_new, self.smoother_win,
             self.smoother_count) = self._track_vio_fn(
                self.map, jnp.int32(max(self.ref_kf, 0)), feats, ur, dp,
                self.T_dev, self.vel_w_dev, p_frame,
                self.bg_dev, self.ba_dev, self.g_w_dev, self.prior_dev,
                self.smoother_win, self.smoother_count,
            )
            self.vel_w_dev = v_new
            self.bg_dev = bg_new
            self.ba_dev = ba_new
            self.prior_dev = prior_new
        else:
            bundle = self._track_fn(
                self.map, jnp.int32(max(self.ref_kf, 0)), feats, ur, dp,
                self.T_dev, self.vel_dev,
            )
        return self._track_entry(feats, ur, dp, timestamp, bundle)

    # ------------------------------------------------------------ inertial

    def _preintegrate(self, imu_samples, timestamp: float):
        """PreintegrateIMU (tracking.cpp:1384): integrate this frame's
        sample batch and fold it into the running keyframe segment."""
        if self._last_ts is None:
            self._last_ts = timestamp
            return None
        acc, gyro, dts = _pad_imu(
            imu_samples, self._last_ts, timestamp, self.imu_cap
        )
        self._last_ts = timestamp
        self._accum, p_frame = self._integrate_fn(
            self._accum, jnp.asarray(acc), jnp.asarray(gyro),
            jnp.asarray(dts), self.bg_dev, self.ba_dev,
        )
        return p_frame

    def _create_keyframe(self, feats, uright, depth, matched_mp, timestamp,
                         pose_dev=None, frame_id=None, pose_np=None):
        super()._create_keyframe(
            feats, uright, depth, matched_mp, timestamp,
            pose_dev=pose_dev, frame_id=frame_id, pose_np=pose_np,
        )
        slot = self.ref_kf
        self.kf_preint_dev, self.kf_vel_dev, self._accum = (
            self._close_segment_fn(
                self.kf_preint_dev, self.kf_vel_dev, jnp.int32(slot),
                self._accum, self.vel_w_dev, self.bg_dev, self.ba_dev,
            )
        )
        self.kf_chain.append(slot)
        self._maybe_init_imu()

    def _apply_cull_info(self, info: np.ndarray):
        if float(info[0]) >= 0.5:
            slot = int(info[1])
            if slot in self.kf_chain:
                i = self.kf_chain.index(slot)
                if 0 < i < len(self.kf_chain) - 1:
                    nxt = self.kf_chain[i + 1]
                    if slot in self._chain_breaks:
                        # the culled slot sits on a merge/init seam: its
                        # incoming "segment" is nonphysical, so welding it
                        # into the successor would fabricate an IMU edge —
                        # transfer the break flag instead
                        self._chain_breaks.add(nxt)
                    else:
                        self.kf_preint_dev = self._weld_segment_fn(
                            self.kf_preint_dev, jnp.int32(slot),
                            jnp.int32(nxt),
                        )
                if i > 0:
                    self.kf_chain.pop(i)
            self._chain_breaks.discard(slot)
        super()._apply_cull_info(info)

    def _pre_frame(self, timestamp: float):
        """Inertial pre-frame checks: a bad-IMU verdict forces an
        active-map reset BEFORE the next frame is tracked
        (Tracking::Track's mbBadImu branch, tracking.cpp:1670-1675 ->
        ResetActiveMap). The bad map is discarded, not parked — its
        geometry was built on a divergent inertial state."""
        if self.bad_imu:
            self.flush()
            self.metrics.event("bad_imu_reset", kfs=self.n_kf)
            # Freeze pre-reset trajectory records to ABSOLUTE poses before
            # the map (and its keyframe table) is discarded: their ref_kf
            # slots would otherwise resolve against the freshly allocated
            # identity-pose table and export a corrupted segment.
            self._freeze_active_records()
            m = self.cfg.map
            from vi_slam_tpu.slam_map import state as map_state_mod

            self.map = map_state_mod.allocate(
                m.max_keyframes, self.cfg.extractor.n_features,
                m.max_points, m.max_obs_per_point,
            )
            self.n_kf = 0
            self.n_mp = 0
            self.ref_kf = -1
            self.culled_parent = {}
            self.state = NOT_INITIALIZED
            self.frames_since_kf = 0
            self._ref_kf_tracked = 0
            self.T_dev = SE3.identity()
            self.vel_dev = SE3.identity()
            self.T_np = np.eye(4)
            self.ref_pose_np = np.eye(4)
            self._last_good = (self.T_dev.R, self.T_dev.t)
            self.carry_dev = jnp.zeros((2,), jnp.int32)
            if self.loop_closer is not None:
                self.loop_closer.reset_for_new_map()
            self._reset_inertial_state()
            self.bad_imu = False
        super()._pre_frame(timestamp)

    def _apply_map_scale(self, s: float):
        """Rescale the whole map by s (mono-inertial metric recovery —
        Map::ApplyScaledRotation semantics with R = I, map.h:152): every
        translation-like quantity scales; rotations and body-frame
        quantities (biases, preintegration) do not."""
        sj = jnp.asarray(s, self.map.kf_t.dtype)
        self.map = self.map._replace(
            kf_t=self.map.kf_t * sj,
            mp_pos=self.map.mp_pos * sj,
            mp_min_dist=self.map.mp_min_dist * sj,
            mp_max_dist=self.map.mp_max_dist * sj,
        )
        self.kf_vel_dev = self.kf_vel_dev * sj
        self.vel_w_dev = self.vel_w_dev * sj
        self.T_dev = SE3(self.T_dev.R, self.T_dev.t * sj)
        self.vel_dev = SE3(self.vel_dev.R, self.vel_dev.t * sj)
        self._last_good = (self.T_dev.R, self.T_dev.t)
        self.T_np = self.T_np.copy()
        self.T_np[:3, 3] *= s
        self.ref_pose_np = self.ref_pose_np.copy()
        self.ref_pose_np[:3, 3] *= s
        for i, rec in enumerate(self.records):
            # only active-map records: parked Atlas maps are NOT scaled,
            # so their records' reference keyframes stay consistent as-is
            if rec.map_id != self.active_map_id:
                continue
            T_rel = rec.T_rel.copy()
            T_rel[:3, 3] *= s
            self.records[i] = rec.__class__(
                rec.frame_id, rec.timestamp, rec.ref_kf, T_rel,
                rec.state, rec.map_id,
            )
        new_culled = {}
        for k, (p, T) in self.culled_parent.items():
            T2 = T.copy()
            T2[:3, 3] *= s
            new_culled[k] = (p, T2)
        self.culled_parent = new_culled
        self._reset_smoother()

    def _pre_ok(self, window: np.ndarray, Wv: int) -> np.ndarray:
        """(Wv-1,) bool: True where the chain edge window[i] -> window[i+1]
        has a physical preintegration segment (False across merge seams)."""
        out = np.ones((Wv - 1,), bool)
        for i in range(Wv - 1):
            if window[i + 1] < 0 or int(window[i + 1]) in self._chain_breaks:
                out[i] = False
        return out

    def _reset_inertial_state(self):
        """Fresh inertial state for a new (or reset) map."""
        K = self.cfg.map.max_keyframes
        ident = pre.identity_preintegrated()
        self.kf_preint_dev = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (K, *x.shape)).copy(), ident
        )
        self.kf_vel_dev = jnp.zeros((K, 3), jnp.float32)
        self.bg_dev = jnp.zeros((3,), jnp.float32)
        self.ba_dev = jnp.zeros((3,), jnp.float32)
        self.g_w_dev = jnp.zeros((3,), jnp.float32)
        self.vel_w_dev = jnp.zeros((3,), jnp.float32)
        self._accum = pre.identity_preintegrated()
        self.prior_dev = pose_inertial.initial_prior(
            SE3.identity(), jnp.zeros((3,)), jnp.zeros((3,)), jnp.zeros((3,))
        )
        self.imu_ready = False
        self._init_stage = 0
        self._init_attempts = 0
        self.kf_chain = []
        self._chain_breaks = set()
        self._last_ts = None
        self._vio_pipelined = False
        if self.loop_closer is not None:
            self.loop_closer.gravity_aligned = False
            self.loop_closer.gravity_w = None
        self._reset_smoother()

    # ------------------------------------------------- Atlas (inertial)

    def _create_map_in_atlas(self):
        """CreateMapInAtlas for the inertial pipeline: park the visual map
        (super) WITH its inertial sidecar — preintegration chain, per-KF
        velocities, biases, gravity — so a later merge can weld
        gravity-consistent states (MergeLocal2 capability,
        loopclosing.cpp:1021)."""
        sidecar = {
            "kf_preint": self.kf_preint_dev,
            "kf_vel": self.kf_vel_dev,
            "bg": self.bg_dev,
            "ba": self.ba_dev,
            "g_w": self.g_w_dev,
            "imu_ready": self.imu_ready,
            "init_stage": self._init_stage,
            "kf_chain": list(self.kf_chain),
            "chain_breaks": set(self._chain_breaks),
        }
        super()._create_map_in_atlas()
        if self.atlas_stored:
            self.atlas_stored[-1].inertial = sidecar
        self._reset_inertial_state()

    def reset(self):
        super().reset()
        self._reset_inertial_state()
        self.bad_imu = False
        self._last_ts = None

    def _do_merge(self, si: int, cur: int, cand: int, S_cl, pairs) -> bool:
        """Inertial map merge (MergeLocal2 + MergeInertialBA,
        loopclosing.cpp:1021 / optimizer.cpp:6129): after the visual weld,
        rotate the active chain's velocities into the stored world frame,
        append its preintegration segments at the slot offset, mark the
        seam edge as having no physical preintegration, and run a welding
        visual-inertial BA over the seam window."""
        # drain in-flight frames BEFORE snapshotting the inertial state:
        # super()._do_merge flushes first, and that flush can finalize
        # frames, create keyframes (appending to kf_chain / closing
        # preintegration segments) and even run _maybe_init_imu — a
        # pre-flush snapshot would drop those KFs from the welded chain
        self.flush()
        sm = self.atlas_stored[si]
        kf_off = sm.n_kf
        act_preint = self.kf_preint_dev
        act_vel = self.kf_vel_dev
        act_chain = list(self.kf_chain)
        act_breaks = set(self._chain_breaks)
        act_ready = self.imu_ready
        act_stage = self._init_stage
        ok = super()._do_merge(si, cur, cand, S_cl, pairs)
        if not ok:
            return False
        side = sm.inertial or {}
        R_S = self._last_weld_S.R.astype(jnp.float32)
        s_S = self._last_weld_S.s.astype(jnp.float32)
        # weld the per-KF buffers: stored rows stay, active rows land at
        # +kf_off with world-frame velocities rotated by the weld
        st_preint = side.get("kf_preint", None)
        st_vel = side.get("kf_vel", None)
        if st_preint is None:
            st_preint = jax.tree.map(jnp.copy, act_preint)
            K = self.cfg.map.max_keyframes
            st_vel = jnp.zeros((K, 3), jnp.float32)
        self.kf_preint_dev, self.kf_vel_dev = self._weld_inertial_fn(
            st_preint, st_vel, act_preint, act_vel, R_S, s_S,
            jnp.int32(kf_off),
        )
        self.vel_w_dev = s_S * (R_S @ self.vel_w_dev)
        # gravity: the merged map lives in the stored world frame — adopt
        # the stored estimate when it has one, else rotate the active one
        if side.get("imu_ready", False):
            self.g_w_dev = side["g_w"]
        else:
            self.g_w_dev = R_S @ self.g_w_dev
        # biases are body-frame and most recent in the active map: keep
        self.kf_chain = list(side.get("kf_chain", [])) + [
            s + kf_off for s in act_chain
        ]
        self._chain_breaks = set(side.get("chain_breaks", set()))
        self._chain_breaks |= {s + kf_off for s in act_breaks}
        if act_chain:
            self._chain_breaks.add(act_chain[0] + kf_off)
        self.imu_ready = act_ready or side.get("imu_ready", False)
        self._init_stage = max(act_stage, side.get("init_stage", 0))
        self.prior_dev = pose_inertial.initial_prior(
            self.T_dev, self.vel_w_dev, self.bg_dev, self.ba_dev
        )
        self._reset_smoother()
        # welding inertial BA over the seam (MergeInertialBA)
        if self.imu_ready and len(self.kf_chain) >= 3:
            self._full_inertial_ba()
        self.metrics.event("inertial_merge", kf_offset=kf_off)
        return True

    def _after_loop_correction(self):
        """Inertial CorrectLoop epilogue (loopclosing.cpp:992 branch):
        after the 4DoF essential-graph correction rewrites keyframe
        poses, rotate each keyframe's world-frame velocity by its pose
        correction (the reference's Rcor * Vw), resync the live velocity
        through the reference KF's correction, and re-seed the marginal
        prior at the corrected state."""
        lc = self.loop_closer
        old = getattr(lc, "_last_old_poses", None) if lc else None
        if lc is not None:
            # consume unconditionally: _after_loop_correction also fires
            # on map merges, which must not re-apply a stale snapshot
            lc._last_old_poses = None
        super()._after_loop_correction()
        if not self.imu_ready or old is None:
            return
        old_R, _old_t = old
        new_R = self.map.kf_R
        # world-frame rotation correction per KF: x_w' = R_n^T R_o x_w
        R_cor = jnp.einsum("kji,kjl->kil", new_R, old_R)
        v_rot = jnp.einsum("kij,kj->ki", R_cor, self.kf_vel_dev)
        valid = self.map.kf_valid
        self.kf_vel_dev = jnp.where(valid[:, None], v_rot, self.kf_vel_dev)
        ref = max(self.ref_kf, 0)
        self.vel_w_dev = R_cor[ref] @ self.vel_w_dev
        self.prior_dev = pose_inertial.initial_prior(
            self.T_dev, self.vel_w_dev, self.bg_dev, self.ba_dev
        )
        self._reset_smoother()

    def _reset_smoother(self):
        """Drop the fixed-lag window (after inertial init the whole state
        basis — gravity frame, biases — changed; warm starts would be
        linearized at garbage)."""
        self.smoother_win = smoother_mod.allocate_window(
            self.cfg.ba.smoother_window, self.cfg.ba.smoother_vis
        )
        self.smoother_count = jnp.zeros((), jnp.int32)

    def _shift_smoother(self, delta: SE3):
        """Apply a keyframe-rate BA pose correction to the window states
        (right-multiplicative, same convention as the live pose chain);
        velocity/bias shifts are second-order for local-BA-sized deltas."""
        w = self.smoother_win
        T = SE3(w.T_R, w.T_t)
        Tn = jax.vmap(lambda R, t: SE3(R, t).compose(delta))(w.T_R, w.T_t)
        Tp = SE3(w.prior_R, w.prior_t).compose(delta)
        self.smoother_win = w._replace(
            T_R=Tn.R, T_t=Tn.t, prior_R=Tp.R, prior_t=Tp.t
        )

    # staged initialization: (min trajectory seconds, priorG, priorA), the
    # analogue of InitializeIMU(1e2,1e6) / VIBA1 InitializeIMU(1,1e5) /
    # VIBA2 InitializeIMU(0,0) (localmapping.cpp:1231 call sites
    # localmapping.cpp:330-345). Bias priors anneal to zero as orientation
    # diversity accumulates and makes the accel bias observable — keeping
    # them stiff forces the bias error into the gravity estimate.
    _INIT_STAGES = ((2.0, 1e2, 1e6), (5.0, 1.0, 1e5), (15.0, 1e-2, 1e-2))

    def _maybe_init_imu(self):
        """InitializeIMU (localmapping.cpp:1231): once enough keyframe
        baseline exists, solve gravity/biases/velocities against the fixed
        visual poses; stereo holds scale at 1. Re-runs at longer spans
        (stages) — gravity/bias observability improves with baseline, and
        the early estimate's error is what limits inertial tracking."""
        if self._init_stage >= len(self._INIT_STAGES):
            return
        min_kfs = 6
        if len(self.kf_chain) < min_kfs:
            return
        ts = jax.device_get(
            self.map.kf_timestamp[np.asarray(
                [self.kf_chain[0], self.kf_chain[-1]]
            )]
        )
        min_span, prior_g, prior_a = self._INIT_STAGES[self._init_stage]
        if float(ts[1] - ts[0]) < min_span:
            return
        window = np.full((self._init_k,), -1, np.int32)
        chain = self.kf_chain[-self._init_k:]
        window[: len(chain)] = chain
        pre_ok = np.asarray(
            [w >= 0 and int(w) not in self._chain_breaks
             for w in window[1:]], bool,
        )
        Rwb, pwb, seg, valid, Rwg0 = self._gather_init_fn(
            self.map, self.kf_preint_dev, jnp.asarray(window),
            jnp.asarray(pre_ok),
        )
        mono = float(self.cam.bf) <= 0
        # monocular keeps solving for scale at every stage: the later
        # re-runs ARE the reference's ScaleRefinement
        # (localmapping.cpp:1395) — gravity/bias observability and the
        # visual map both improve, so the residual scale error shrinks
        res = iinit.inertial_init(
            Rwb, pwb, seg, valid,
            prior_g=prior_g, prior_a=prior_a,
            optimize_scale=mono,
            gravity_mag=self.gravity_mag, Rwg0=Rwg0,
        )
        got = jax.device_get({"cost": res.cost, "bg": res.bg,
                              "ba": res.ba})
        costs = got["cost"]
        n_edges = max(int(np.sum(np.asarray(jax.device_get(valid)))), 1)
        self._last_init_cost = float(costs[-1]) / n_edges
        # acceptance: finite, improving, and residuals within the modeled
        # noise band (absolute per-edge chi2). A must-halve ratio gate is
        # wrong on noisier sequences — a solve that starts near the optimum
        # legitimately improves by less (measured: real billboard imagery
        # converges at ratio ~0.53 with healthy per-edge cost ~1e4)
        if (not np.isfinite(costs[-1])
                or costs[-1] > 0.95 * costs[0]
                or self._last_init_cost > 1e5):
            # didn't converge; repeated failure on a long-enough baseline
            # means the IMU stream or its calibration is bad — force an
            # active-map reset instead of tracking on a corrupt estimate
            # (mbBadImu, localmapping.cpp:120-128, tracking.cpp:1670-1675)
            self._init_attempts += 1
            if self._init_stage == 0 and self._init_attempts >= 12:
                self.bad_imu = True
                self.metrics.event("bad_imu", attempts=self._init_attempts)
            return
        # divergence guards: physically impossible biases, or a
        # "converged" solution whose residuals are astronomically out of
        # the modeled noise (garbage IMU converges to a self-consistent
        # nonsense state: measured ~5e7 per edge vs O(1e2) healthy)
        if (np.linalg.norm(got["bg"]) > 1.0
                or np.linalg.norm(got["ba"]) > 5.0
                or self._last_init_cost > 1e5):
            self._init_attempts += 1
            self.bad_imu = True
            self.metrics.event(
                "bad_imu", reason="divergence",
                cost=self._last_init_cost,
            )
            return
        self.bg_dev = res.bg
        self.ba_dev = res.ba
        g0 = jnp.asarray([0.0, 0.0, -self.gravity_mag], jnp.float32)
        self.g_w_dev = res.Rwg @ g0
        if mono:
            # ApplyScaledRotation capability (map.h:152 / ScaleRefinement
            # localmapping.cpp:1395): re-express the whole visual map in
            # metric units so the solved velocities/gravity are consistent
            s = float(jax.device_get(res.scale))
            if abs(s - 1.0) > 1e-4:
                self._apply_map_scale(s)
                self.metrics.event("scale_applied", scale=s,
                                   stage=self._init_stage)
        last = len(chain) - 1
        self.kf_vel_dev, self.vel_w_dev = self._apply_init_fn(
            self.kf_vel_dev, jnp.asarray(window), res.vel,
            jnp.int32(chain[last]),
        )
        # reset the running segment's linearization point to the new biases
        self._accum = self._accum._replace(bias_gyro=res.bg, bias_acc=res.ba)
        # seed (or re-seed) the per-frame marginal prior at the freshly
        # initialized state (the first EdgePriorPoseImu of the hot path)
        self.prior_dev = pose_inertial.initial_prior(
            self.T_dev, self.vel_w_dev, self.bg_dev, self.ba_dev
        )
        # the state basis (gravity frame, biases) just changed: restart the
        # fixed-lag window at the fresh state
        self._reset_smoother()
        self.imu_ready = True
        self._init_stage += 1
        if self.loop_closer is not None:
            # loop corrections must now preserve the gravity direction:
            # select the yaw+translation essential graph
            # (OptimizeEssentialGraph4DoF, optimizer.cpp:7521) and lock
            # scale (inertial maps are metric)
            self.loop_closer.gravity_aligned = True
            self.loop_closer.gravity_w = self.g_w_dev
            self.loop_closer.fix_scale = True
        self._full_inertial_ba()

    def _full_inertial_ba(self):
        """FullInertialBA after a successful inertial-init stage
        (optimizer.cpp:385, driven at localmapping.cpp:1320-1390): one
        whole-chain visual-inertial BA refines every keyframe pose,
        velocity and the shared biases against the freshly estimated
        gravity. The reference follows it with UpdateFrameIMU
        (tracking.cpp:3817) to rewrite the live frame's state; here the
        equivalent is re-anchoring the device pose chain and re-seeding
        the marginal prior (trajectory records are pose-relative to
        reference keyframes, so the keyframe scatter already reaches
        them; gravity stays a world-frame vector, so no ApplyScaledRotation
        rewrite exists by design)."""
        if len(self.kf_chain) < 3:
            return
        Wv = self._full_w
        window = np.full((Wv,), -1, np.int32)
        chain = self.kf_chain[-Wv:]
        window[: len(chain)] = chain
        fixed = np.zeros((Wv,), bool)
        fixed[0] = True
        fixed[len(chain):] = True
        (self.map, self.kf_vel_dev, self.bg_dev, self.ba_dev, dR,
         dt) = self._full_vi_ba_fn(
            self.map, self.kf_preint_dev, self.kf_vel_dev,
            jnp.asarray(window), jnp.asarray(fixed),
            jnp.asarray(self._pre_ok(window, Wv)),
            jnp.int32(len(chain) - 1),
            self.bg_dev, self.ba_dev, self.g_w_dev, jnp.int32(self.ref_kf),
        )
        delta = SE3(dR, dt)
        self.T_dev = self.T_dev.compose(delta)
        self._last_good = (self.T_dev.R, self.T_dev.t)
        self.vel_w_dev = self.kf_vel_dev[self.kf_chain[-1]]
        self.prior_dev = pose_inertial.initial_prior(
            self.T_dev, self.vel_w_dev, self.bg_dev, self.ba_dev
        )
        self._reset_smoother()

    def _local_ba(self):
        if not self.imu_ready:
            return super()._local_ba()
        Wv = self.cfg.ba.inertial_window
        if len(self.kf_chain) < 2:
            return
        window = np.full((Wv,), -1, np.int32)
        chain = self.kf_chain[-Wv:]
        window[: len(chain)] = chain
        fixed = np.zeros((Wv,), bool)
        fixed[0] = True  # oldest window KF anchors gauge
        fixed[len(chain):] = True
        (self.map, self.kf_vel_dev, self.bg_dev, self.ba_dev, dR,
         dt) = self._vi_ba_fn(
            self.map, self.kf_preint_dev, self.kf_vel_dev,
            jnp.asarray(window), jnp.asarray(fixed),
            jnp.asarray(self._pre_ok(window, Wv)),
            jnp.int32(len(chain) - 1),
            self.bg_dev, self.ba_dev, self.g_w_dev, jnp.int32(self.ref_kf),
        )
        delta = SE3(dR, dt)
        self.T_dev = self.T_dev.compose(delta)
        self._last_good = (self.T_dev.R, self.T_dev.t)
        # UpdateFrameIMU-equivalent resync (tracking.cpp:3817): mapping
        # just rewrote keyframe states and refined the biases, so the
        # accumulated per-frame marginal prior is linearized at a stale
        # chain — re-seed it at the corrected live state (this also
        # bounds the prior information, which otherwise grows without
        # forgetting and over-constrains the hot path)
        self.prior_dev = pose_inertial.initial_prior(
            self.T_dev, self.vel_w_dev, self.bg_dev, self.ba_dev
        )
        # carry the same correction into the fixed-lag window states
        self._shift_smoother(delta)

    def _handle_failure(self, job: FrameJob, st: TrackStats,
                        T_np: np.ndarray) -> TrackStats:
        """IMU branch of the recovery ladder (tracking.cpp:1816-1835):
        with a live inertial state the predicted pose IS the optimized pose
        (zero visual inliers leave only the inertial residual, which is
        zero at the prediction), so the grace window is bridged by dead
        reckoning instead of freezing the pose chain."""
        if not self.imu_ready or job.bundle is None:
            return super()._handle_failure(job, st, T_np)
        if self.state == OK:
            self.state = RECENTLY_LOST
            self._lost_since = job.timestamp
        within = (
            job.timestamp - self._lost_since
            <= self.cfg.tracker.recently_lost_sec
        )
        if within:
            # accept the dead-reckoned pose; the chain keeps advancing on
            # the optimistic device-side update already made at dispatch
            self.T_np = T_np
            self._record(job, T_np, self.ref_pose_np, self.ref_kf,
                         RECENTLY_LOST)
            st.n_kfs, st.n_mps, st.state = self.n_kf, self.n_mp, self.state
            self.stats.append(st)
            return st
        self.state = LOST
        return super()._handle_failure(job, st, T_np)


class MonoInertialVO(StereoInertialVO):
    """IMU_MONOCULAR sensor mode (system.h:96-102): monocular two-view
    bootstrap + triangulated landmark growth (MonoVO) combined with the
    full inertial stack (StereoInertialVO). The staged initializer solves
    gravity AND metric scale (InertialOptimization with VertexScale,
    optimizer.cpp:4697 / g2otypes.h:285), applies the scale to the map
    (ApplyScaledRotation, map.h:152), and keeps refining it at later
    stages (ScaleRefinement, localmapping.cpp:1395).

    Implementation: the mono behaviors are borrowed from MonoVO by
    composition — initialization, keyframe policy and triangulated point
    creation are delegated to unbound MonoVO methods so the inertial
    hooks of StereoInertialVO (_create_keyframe closing preintegration
    segments, _on_keyframe_created driving the staged init) keep working
    through the same super() chain they already use.
    """

    def __init__(self, cfg: SystemConfig, timer=None, vocab=None):
        from vi_slam_tpu.pipeline.mono_vo import MonoVO

        super().__init__(cfg, timer=timer, vocab=vocab)
        if self.loop_closer is not None:
            # mono-inertial: gravity+IMU make scale observable, so loop
            # corrections stay SE3 once the IMU is initialized; before
            # that the mono default (Sim3) would apply — the reference
            # flips the same way (loopclosing fixed-scale for inertial)
            self.loop_closer.fix_scale = True
        self._mono = MonoVO  # unbound method source
        self._init_ref = None
        self._key = jax.random.PRNGKey(3)
        MonoVO._build_mono_fns(self)

    # --- mono behaviors, delegated explicitly (no diamond MRO) ---

    def _initialize(self, feats, uright, depth, timestamp) -> bool:
        return self._mono._initialize(self, feats, uright, depth, timestamp)

    def _need_keyframe(self, n_in, n_tracked_close, n_creatable) -> bool:
        return self._mono._need_keyframe(
            self, n_in, n_tracked_close, n_creatable
        )

    def _create_kf_shell(self, feats, timestamp, frame_id=None):
        """Mono-init keyframe shells (the two bootstrap KFs): close the
        running preintegration into the slot and mark it as a chain
        break — the accumulator spans back past the init reference frame,
        so the stored segment is not the physical KF0->KF1 edge (the
        staged initializer and VI-BA mask it; later edges are exact)."""
        from vi_slam_tpu.pipeline.mono_vo import MonoVO

        MonoVO._create_kf_shell(self, feats, timestamp, frame_id=frame_id)
        slot = self.ref_kf
        self.kf_preint_dev, self.kf_vel_dev, self._accum = (
            self._close_segment_fn(
                self.kf_preint_dev, self.kf_vel_dev, jnp.int32(slot),
                self._accum, self.vel_w_dev, self.bg_dev, self.ba_dev,
            )
        )
        self.kf_chain.append(slot)
        self._chain_breaks.add(slot)

    def _create_keyframe(self, feats, uright, depth, matched_mp, timestamp,
                         pose_dev=None, frame_id=None, pose_np=None):
        """Mono KF creation + inertial segment close: insert + triangulate
        (MonoVO), then close the preintegration segment exactly like the
        stereo-inertial path."""
        self._mono._create_keyframe(
            self, feats, uright, depth, matched_mp, timestamp,
            pose_dev=pose_dev, frame_id=frame_id, pose_np=pose_np,
        )
        slot = self.ref_kf
        self.kf_preint_dev, self.kf_vel_dev, self._accum = (
            self._close_segment_fn(
                self.kf_preint_dev, self.kf_vel_dev, jnp.int32(slot),
                self._accum, self.vel_w_dev, self.bg_dev, self.ba_dev,
            )
        )
        self.kf_chain.append(slot)
        self._maybe_init_imu()

    # ------------------------------------------------------------------ API

    def process_oracle_mono_inertial(self, xy, desc, level, imu_samples,
                                     timestamp: float) -> TrackStats:
        """Oracle mono + IMU ingest (GrabImageMonocular + GrabImuData,
        tracking.cpp:1320/:1362)."""
        self._pre_frame(timestamp)
        n = self.cfg.extractor.n_features
        feats, ur, dp = make_oracle_features(
            n, xy, np.full((len(xy),), -1.0), np.full((len(xy),), -1.0),
            desc, level,
        )
        return self._inertial_entry(feats, ur, dp, imu_samples, timestamp)

    def process_mono_inertial(self, img, imu_samples,
                              timestamp: float) -> TrackStats:
        """Image mono + IMU ingest."""
        self._pre_frame(timestamp)
        img = jnp.asarray(img, jnp.float32)
        feats = self.extractor(img)
        n = feats.xy.shape[0]
        ur = jnp.full((n,), -1.0, jnp.float32)
        dp = jnp.full((n,), -1.0, jnp.float32)
        return self._inertial_entry(feats, ur, dp, imu_samples, timestamp)
