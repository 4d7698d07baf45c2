"""Fixed-lag visual-inertial smoother — the iSAM2/GTSAM capability,
rebuilt TPU-native.

Semantic reference: the reference's incremental-smoothing surface is
(a) `GTSAMOptimizer` mirroring the BA graph into an iSAM2/LM smoother
(`/root/reference/include/vi_slam/optimization/gtsamoptimizer.h:107-262`,
relinearizeThreshold=0.01 gtsamoptimizer.cpp:62-65), (b) the per-frame
VIO optimization with a marginalization prior —
`PoseInertialOptimizationLastFrame/LastKeyFrame`
(optimizer.cpp:7095/:6701) building `EdgePriorPoseImu` (g2otypes.h:740)
through `Optimizer::Marginalize` (optimizer.cpp:4581), and (c)
`iSAM2Optimizer` (iSAM2Optimizer.h:79-131, not built upstream).

TPU design (SURVEY §7.3 "incremental smoothing without GTSAM"): a true
Bayes-tree iSAM2 is pointer-graph-shaped; the honest TPU equivalent is a
fixed-lag batch Gauss-Newton with warm starts + an exact dense marginal
prior, which is precisely the pattern the reference itself uses per
frame (EdgePriorPoseImu + Marginalize). The whole window is one jitted
GN program over (W, 15) states [pose(6) | vel(3) | bg(3) | ba(3)];
sliding the window Schur-eliminates the oldest state's 15-block onto its
successor. Relinearization is implicit — every iteration relinearizes
(cheap at W <= 16), which strictly dominates threshold-triggered
relinearization in accuracy.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.cameras import dispatch as camlib
from vi_slam_tpu.imu import preintegration as pre
from vi_slam_tpu.lie import se3, so3
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.optim.vi_ba import _body_from_cam, _inertial_residual_tangent
from vi_slam_tpu.utils.precision import precise

D = 15  # state width


class SmootherWindow(NamedTuple):
    """Fixed-capacity sliding window (W slots, slot 0 = oldest)."""

    T_R: jnp.ndarray  # (W, 3, 3) Tcw
    T_t: jnp.ndarray  # (W, 3)
    vel: jnp.ndarray  # (W, 3)
    bg: jnp.ndarray  # (W, 3)
    ba: jnp.ndarray  # (W, 3)
    valid: jnp.ndarray  # (W,)
    preint: pre.Preintegrated  # (W-1, ...) between consecutive slots
    inertial_valid: jnp.ndarray  # (W-1,)
    # visual anchors: per-slot fixed landmarks + pixel obs (motion-only
    # visual factors, PoseInertialOptimization* style)
    vis_xw: jnp.ndarray  # (W, V, 3)
    vis_uv: jnp.ndarray  # (W, V, 2)
    vis_sigma2: jnp.ndarray  # (W, V)
    vis_valid: jnp.ndarray  # (W, V)
    # marginal prior on slot 0 (EdgePriorPoseImu): information + lin point
    prior_H: jnp.ndarray  # (15, 15)
    prior_R: jnp.ndarray  # (3, 3) lin-point pose
    prior_t: jnp.ndarray  # (3,)
    prior_vel: jnp.ndarray  # (3,)
    prior_bg: jnp.ndarray  # (3,)
    prior_ba: jnp.ndarray  # (3,)


def allocate_window(w: int, v: int, dtype=jnp.float32) -> SmootherWindow:
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (w, 3, 3))
    p = pre.identity_preintegrated(dtype)
    preint = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (w - 1, *jnp.shape(x))), p
    )
    return SmootherWindow(
        T_R=eye,
        T_t=jnp.zeros((w, 3), dtype),
        vel=jnp.zeros((w, 3), dtype),
        bg=jnp.zeros((w, 3), dtype),
        ba=jnp.zeros((w, 3), dtype),
        valid=jnp.zeros((w,), bool),
        preint=preint,
        inertial_valid=jnp.zeros((w - 1,), bool),
        vis_xw=jnp.zeros((w, v, 3), dtype),
        vis_uv=jnp.zeros((w, v, 2), dtype),
        vis_sigma2=jnp.ones((w, v), dtype),
        vis_valid=jnp.zeros((w, v), bool),
        prior_H=jnp.zeros((D, D), dtype),
        prior_R=jnp.eye(3, dtype=dtype),
        prior_t=jnp.zeros((3,), dtype),
        prior_vel=jnp.zeros((3,), dtype),
        prior_bg=jnp.zeros((3,), dtype),
        prior_ba=jnp.zeros((3,), dtype),
    )


def _prior_residual_tangent(delta15, win: SmootherWindow):
    """Tangent of slot-0 state vs the prior linearization point
    (EdgePriorPoseImu residual, g2otypes.h:740)."""
    T0 = se3.retract_left(SE3(win.T_R[0], win.T_t[0]), delta15[0:6])
    # pose residual in SE3 tangent wrt prior pose
    dT = T0.compose(SE3(win.prior_R, win.prior_t).inverse())
    r_pose = se3.log(dT)
    r_vel = win.vel[0] + delta15[6:9] - win.prior_vel
    r_bg = win.bg[0] + delta15[9:12] - win.prior_bg
    r_ba = win.ba[0] + delta15[12:15] - win.prior_ba
    return jnp.concatenate([r_pose, r_vel, r_bg, r_ba])


def _build_system(
    cam: CameraParams,
    win: SmootherWindow,
    gravity: jnp.ndarray,
    walk_info_g: jnp.ndarray,
    walk_info_a: jnp.ndarray,
):
    """Assemble the dense (15W, 15W) GN system at the current estimate."""
    W = win.T_R.shape[0]
    dtype = win.T_t.dtype
    n = D * W
    H = jnp.zeros((n, n), dtype)
    b = jnp.zeros((n,), dtype)
    cost = jnp.zeros((), dtype)

    poses = SE3(win.T_R, win.T_t)

    # --- visual factors (per slot, pose block only)
    def vis_block(k):
        T = SE3(win.T_R[k], win.T_t[k])

        def res(xi):
            Tk = se3.retract_left(T, xi)
            pc = Tk.apply(win.vis_xw[k])
            pred = camlib.project(cam, pc)
            r = (pred - win.vis_uv[k]) * jnp.sqrt(
                win.vis_valid[k] / jnp.maximum(win.vis_sigma2[k], 1e-9)
            )[:, None]
            # cheirality: zero out behind-camera rows
            r = r * (pc[..., 2] > 0.1)[:, None]
            return r.reshape(-1)

        zero = jnp.zeros((6,), dtype)
        J = jax.jacfwd(res)(zero)  # (2V, 6)
        r = res(zero)
        return J.T @ J, -J.T @ r, jnp.sum(r * r)

    Hv, bv, cv = jax.vmap(vis_block)(jnp.arange(W))
    for k in range(W):
        s = D * k
        H = H.at[s : s + 6, s : s + 6].add(Hv[k])
        b = b.at[s : s + 6].add(bv[k])
    cost = cost + jnp.sum(cv)

    # --- inertial edges between consecutive slots
    def in_block(k):
        Ti = SE3(win.T_R[k], win.T_t[k])
        Tj = SE3(win.T_R[k + 1], win.T_t[k + 1])
        p9 = jax.tree.map(lambda x: x[k], win.preint)
        info = pre.information(p9)
        # sqrt-information weighting
        w_edge = win.inertial_valid[k].astype(dtype)
        L = jnp.linalg.cholesky(
            info + 1e-6 * jnp.eye(9, dtype=dtype)
        )

        def res(d24):
            I3 = jnp.eye(3, dtype=dtype)
            r = _inertial_residual_tangent(
                d24, Ti, Tj, win.vel[k], win.vel[k + 1], win.bg[k],
                win.ba[k], p9, gravity, I3, jnp.zeros((3,), dtype),
            )
            return (L.T @ r) * w_edge

        zero = jnp.zeros((24,), dtype)
        J = jax.jacfwd(res)(zero)  # (9, 24)
        r = res(zero)
        return J.T @ J, -J.T @ r, jnp.sum(r * r)

    Hi, bi, ci = jax.vmap(in_block)(jnp.arange(W - 1))
    # tangent layout of d24: [xi_i(6), dv_i(3), dbg_i(3), dba_i(3), xi_j(6), dv_j(3)]
    for k in range(W - 1):
        si = D * k
        sj = D * (k + 1)
        idx = jnp.concatenate(
            [
                jnp.arange(si, si + 15),
                jnp.arange(sj, sj + 6),
                jnp.arange(sj + 6, sj + 9),
            ]
        )
        H = H.at[idx[:, None], idx[None, :]].add(Hi[k])
        b = b.at[idx].add(bi[k])
    cost = cost + jnp.sum(ci)

    # --- bias random walk edges (EdgeGyroRW/EdgeAccRW)
    for k in range(W - 1):
        w_edge = win.inertial_valid[k].astype(dtype)
        si, sj = D * k, D * (k + 1)
        for off, info_w in ((9, walk_info_g), (12, walk_info_a)):
            r = (win.bg[k + 1] - win.bg[k]) if off == 9 else (
                win.ba[k + 1] - win.ba[k]
            )
            wgt = info_w * w_edge
            I3 = jnp.eye(3, dtype=dtype) * wgt
            ia = jnp.arange(si + off, si + off + 3)
            ja = jnp.arange(sj + off, sj + off + 3)
            H = H.at[ia[:, None], ia[None, :]].add(I3)
            H = H.at[ja[:, None], ja[None, :]].add(I3)
            H = H.at[ia[:, None], ja[None, :]].add(-I3)
            H = H.at[ja[:, None], ia[None, :]].add(-I3)
            b = b.at[ia].add(wgt * r)
            b = b.at[ja].add(-wgt * r)
            cost = cost + wgt * jnp.sum(r * r)

    # --- marginal prior on slot 0
    def prior_res(d15):
        return _prior_residual_tangent(d15, win)

    zero15 = jnp.zeros((D,), dtype)
    Jp = jax.jacfwd(prior_res)(zero15)
    rp = prior_res(zero15)
    H = H.at[:D, :D].add(Jp.T @ win.prior_H @ Jp)
    b = b.at[:D].add(-Jp.T @ (win.prior_H @ rp))
    cost = cost + rp @ win.prior_H @ rp

    return H, b, cost


@partial(jax.jit, static_argnames=("iters",))
@precise
def optimize_window(
    cam: CameraParams,
    win: SmootherWindow,
    gravity: jnp.ndarray,
    walk_info_g: jnp.ndarray,
    walk_info_a: jnp.ndarray,
    iters: int = 5,
) -> Tuple[SmootherWindow, jnp.ndarray]:
    """Batch GN over the window (warm-started = incremental smoothing)."""
    W = win.T_R.shape[0]
    dtype = win.T_t.dtype

    def apply_delta(win: SmootherWindow, dx):
        dx = dx.reshape(W, D)
        mask = win.valid.astype(dtype)[:, None]
        dx = dx * mask
        T = SE3(win.T_R, win.T_t)
        T_new = jax.vmap(se3.retract_left)(T, dx[:, 0:6])
        return win._replace(
            T_R=T_new.R,
            T_t=T_new.t,
            vel=win.vel + dx[:, 6:9],
            bg=win.bg + dx[:, 9:12],
            ba=win.ba + dx[:, 12:15],
        )

    def step(win, _):
        H, b, cost = _build_system(cam, win, gravity, walk_info_g, walk_info_a)
        # gauge: inactive slots get identity rows
        act = jnp.repeat(win.valid, D)
        H = H * (act[:, None] * act[None, :])
        H = H + jnp.diag(jnp.where(act, 1e-6, 1.0))
        b = b * act
        dx = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(H, lower=True), b
        )
        return apply_delta(win, dx), cost

    win, costs = jax.lax.scan(step, win, None, length=iters)
    return win, costs[-1]


@jax.jit
@precise
def marginalize_oldest(
    cam: CameraParams,
    win: SmootherWindow,
    gravity: jnp.ndarray,
    walk_info_g: jnp.ndarray,
    walk_info_a: jnp.ndarray,
) -> SmootherWindow:
    """Slide the window: Schur-eliminate slot 0 onto slot 1 and shift.

    Exactly `Optimizer::Marginalize` (optimizer.cpp:4581) on the joint
    (slot0, slot1) system of the factors that touch slot 0 — the
    resulting 15x15 information becomes slot 1's `EdgePriorPoseImu`.
    """
    W = win.T_R.shape[0]
    dtype = win.T_t.dtype
    H, b, _ = _build_system(cam, win, gravity, walk_info_g, walk_info_a)
    # joint system of slot0+slot1, keeping only factors touching slot 0:
    # visual(0), inertial(0,1), biasRW(0,1), prior(0). The full H contains
    # additional slot-1 factors; rebuild the touching-only system by
    # subtracting nothing — instead extract blocks from a dedicated build.
    # For exactness we rebuild with a mask: zero out slot1's own factors.
    # Cheap approach: the Schur complement of the FULL system onto
    # slot >= 1 would double-count; so we assemble the touching set
    # explicitly here.
    win0 = win._replace(
        vis_valid=win.vis_valid.at[1:].set(False),
        inertial_valid=win.inertial_valid.at[1:].set(False),
    )
    Ht, bt, _ = _build_system(cam, win0, gravity, walk_info_g, walk_info_a)
    H00 = Ht[:D, :D] + 1e-8 * jnp.eye(D, dtype=dtype)
    H01 = Ht[:D, D : 2 * D]
    H11 = Ht[D : 2 * D, D : 2 * D]
    H00_inv = jnp.linalg.inv(H00)
    prior_H_new = H11 - H01.T @ H00_inv @ H01
    # symmetrize + PSD clamp (Marginalize does the same eigen cleanup)
    prior_H_new = 0.5 * (prior_H_new + prior_H_new.T)
    evals, evecs = jnp.linalg.eigh(prior_H_new)
    evals = jnp.clip(evals, 0.0, 1e12)
    prior_H_new = (evecs * evals[None, :]) @ evecs.T

    def shift(x):
        return jnp.concatenate([x[1:], x[-1:]], axis=0)

    preint_shift = jax.tree.map(
        lambda x: jnp.concatenate([x[1:], x[-1:]], axis=0), win.preint
    )
    return win._replace(
        T_R=shift(win.T_R),
        T_t=shift(win.T_t),
        vel=shift(win.vel),
        bg=shift(win.bg),
        ba=shift(win.ba),
        valid=shift(win.valid).at[-1].set(False),
        preint=preint_shift,
        inertial_valid=shift(win.inertial_valid).at[-1].set(False),
        vis_xw=shift(win.vis_xw),
        vis_uv=shift(win.vis_uv),
        vis_sigma2=shift(win.vis_sigma2),
        vis_valid=shift(win.vis_valid).at[-1].set(False),
        prior_H=prior_H_new,
        prior_R=win.T_R[1],
        prior_t=win.T_t[1],
        prior_vel=win.vel[1],
        prior_bg=win.bg[1],
        prior_ba=win.ba[1],
    )


class FixedLagSmoother:
    """Host wrapper: push states, optimize, slide.

    Push order per keyframe/frame: `push(pose, vel, preint_from_prev,
    visual anchors)`. When the window is full the oldest state is
    marginalized into the prior (fixed-lag semantics; GTSAMOptimizer /
    iSAM2 capability)."""

    def __init__(
        self,
        cam: CameraParams,
        window: int = 10,
        max_vis: int = 128,
        gravity=(0.0, 0.0, -9.81),
        walk_info_g: float = 1e6,
        walk_info_a: float = 1e4,
        dtype=jnp.float32,
    ):
        self.cam = cam
        self.W = window
        self.V = max_vis
        self.win = allocate_window(window, max_vis, dtype)
        self.n = 0  # filled slots
        self.gravity = jnp.asarray(gravity, dtype)
        self.wg = jnp.asarray(walk_info_g, dtype)
        self.wa = jnp.asarray(walk_info_a, dtype)
        self.dtype = dtype

    def push(
        self,
        T_cw: SE3,
        vel,
        preint: Optional[pre.Preintegrated],
        vis_xw=None,
        vis_uv=None,
        vis_sigma2=None,
        prior_H0: Optional[jnp.ndarray] = None,
    ) -> None:
        if self.n == self.W:
            self.win = marginalize_oldest(
                self.cam, self.win, self.gravity, self.wg, self.wa
            )
            self.n -= 1
        k = self.n
        w = self.win
        V = self.V
        xw = jnp.zeros((V, 3), self.dtype)
        uv = jnp.zeros((V, 2), self.dtype)
        s2 = jnp.ones((V,), self.dtype)
        vv = jnp.zeros((V,), bool)
        if vis_xw is not None and len(vis_xw):
            c = min(len(vis_xw), V)
            xw = xw.at[:c].set(jnp.asarray(vis_xw[:c], self.dtype))
            uv = uv.at[:c].set(jnp.asarray(vis_uv[:c], self.dtype))
            if vis_sigma2 is not None:
                s2 = s2.at[:c].set(jnp.asarray(vis_sigma2[:c], self.dtype))
            vv = vv.at[:c].set(True)
        w = w._replace(
            T_R=w.T_R.at[k].set(T_cw.R),
            T_t=w.T_t.at[k].set(T_cw.t),
            vel=w.vel.at[k].set(jnp.asarray(vel, self.dtype)),
            bg=w.bg.at[k].set(w.bg[max(k - 1, 0)]),
            ba=w.ba.at[k].set(w.ba[max(k - 1, 0)]),
            valid=w.valid.at[k].set(True),
            vis_xw=w.vis_xw.at[k].set(xw),
            vis_uv=w.vis_uv.at[k].set(uv),
            vis_sigma2=w.vis_sigma2.at[k].set(s2),
            vis_valid=w.vis_valid.at[k].set(vv),
        )
        if k > 0 and preint is not None:
            w = w._replace(
                preint=jax.tree.map(
                    lambda dst, src: dst.at[k - 1].set(src), w.preint, preint
                ),
                inertial_valid=w.inertial_valid.at[k - 1].set(True),
            )
        if k == 0:
            if prior_H0 is None:
                # weak pose/vel gauge prior (visual anchors carry the real
                # information); stronger bias priors (priorG/priorA
                # weighting, InertialOptimization optimizer.cpp:4697)
                prior_H0 = jnp.diag(
                    jnp.asarray(
                        [1e2] * 6 + [1e1] * 3 + [1e4] * 3 + [1e3] * 3,
                        self.dtype,
                    )
                )
            w = w._replace(
                prior_H=prior_H0,
                prior_R=T_cw.R,
                prior_t=T_cw.t,
                prior_vel=jnp.asarray(vel, self.dtype),
                prior_bg=w.bg[0],
                prior_ba=w.ba[0],
            )
        self.win = w
        self.n += 1

    def optimize(self, iters: int = 5):
        self.win, cost = optimize_window(
            self.cam, self.win, self.gravity, self.wg, self.wa, iters=iters
        )
        return float(cost)

    def latest(self) -> Tuple[SE3, np.ndarray, np.ndarray, np.ndarray]:
        k = self.n - 1
        w = self.win
        return (
            SE3(w.T_R[k], w.T_t[k]),
            np.asarray(w.vel[k]),
            np.asarray(w.bg[k]),
            np.asarray(w.ba[k]),
        )
