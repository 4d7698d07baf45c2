"""Visual-inertial sliding-window bundle adjustment.

Semantic reference: `Optimizer::LocalInertialBA`
(`/root/reference/src/optimization/optimizer.cpp:3974` — temporal window of
Nd keyframes chained by `mPrevKF`, per-KF pose/velocity/gyro-bias/acc-bias
vertices, `EdgeInertial` between consecutive KFs (g2otypes.h:484),
`EdgeGyroRW`/`EdgeAccRW` bias random-walk edges (:624/:660), visual
reprojection edges, fixed anchor KF) and `FullInertialBA` (optimizer.cpp:385).

TPU design: the per-keyframe state is a 15-wide block
[pose(6) | vel(3) | bg(3) | ba(3)]. Landmarks are Schur-eliminated exactly
as in visual BA (`_visual_reduced_system`), their reduced 6x6 camera
coupling embedded into the 15-wide system. Inertial residual Jacobians
come from `jax.jacfwd` of the preintegration residual at zero tangent —
exact, and free of hand-derivation errors — vmapped over the window's
edges. The dense (K*15)^2 system is tiny (K <= 25) and solves in one
Cholesky.

Body frame == camera frame (Tbc = identity) in this revision; the Tbc
composition hook is `_body_from_cam`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.imu import preintegration as pre
from vi_slam_tpu.lie import se3, so3
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.utils.precision import precise
from vi_slam_tpu.optim.local_ba import (
    BAProblem,
    _robust_cost_and_weights,
    _residuals,
    _visual_reduced_system,
    back_substitute_points,
)

D = 15  # per-KF state width: [pose 6 | vel 3 | bg 3 | ba 3]


class VIBAProblem(NamedTuple):
    """Visual part (poses are Tcw) + inertial chain between consecutive
    window slots (k, k+1)."""

    visual: BAProblem
    vel: jnp.ndarray  # (K, 3) world-frame body velocity
    bg: jnp.ndarray  # (K, 3)
    ba: jnp.ndarray  # (K, 3)
    preint: pre.Preintegrated  # stacked (K-1, ...) between consecutive KFs
    inertial_valid: jnp.ndarray  # (K-1,) bool
    gravity: jnp.ndarray  # (3,) world gravity vector (e.g. [0, 0, -9.81])
    # bias random-walk information per edge (scalar precisions)
    walk_info_g: jnp.ndarray  # (K-1,)
    walk_info_a: jnp.ndarray  # (K-1,)
    # IMU-camera extrinsics: T_bc maps camera-frame points to the body
    # frame (ImuCamPose mTbc, g2otypes.h:63; kalibr T_imu_cam)
    R_bc: jnp.ndarray  # (3,3)
    t_bc: jnp.ndarray  # (3,)


class VIBAResult(NamedTuple):
    poses: SE3
    points: jnp.ndarray
    vel: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    cost: jnp.ndarray


def _body_from_cam(
    T_cw: SE3, R_bc: jnp.ndarray, t_bc: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-frame body rotation/position from Tcw with IMU-camera
    extrinsics T_bc (camera->body): T_bw = T_bc ∘ T_cw, (Rwb, pwb) =
    inverse(T_bw)."""
    R_bw = jnp.einsum("ij,...jk->...ik", R_bc, T_cw.R)
    t_bw = jnp.einsum("ij,...j->...i", R_bc, T_cw.t) + t_bc
    Rwb = jnp.swapaxes(R_bw, -1, -2)
    pwb = -jnp.einsum("...ij,...j->...i", Rwb, t_bw)
    return Rwb, pwb


def _inertial_residual_tangent(
    delta: jnp.ndarray,  # (24,) [xi_i(6), dv_i(3), dbg_i(3), dba_i(3), xi_j(6), dv_j(3)]
    T_i: SE3, T_j: SE3,
    v_i, v_j, bg_i, ba_i,
    p9: pre.Preintegrated,
    gravity, R_bc, t_bc,
):
    """Residual as a function of tangent increments (for jacfwd at 0)."""
    Ti = se3.retract_left(T_i, delta[0:6])
    vi = v_i + delta[6:9]
    bgi = bg_i + delta[9:12]
    bai = ba_i + delta[12:15]
    Tj = se3.retract_left(T_j, delta[15:21])
    vj = v_j + delta[21:24]
    R1, p1 = _body_from_cam(Ti, R_bc, t_bc)
    R2, p2 = _body_from_cam(Tj, R_bc, t_bc)
    return pre.inertial_residual(
        p9, R1, vi, p1, R2, vj, p2, bgi, bai, gravity
    )


def _inertial_system(prob: VIBAProblem, poses: SE3):
    """Accumulate inertial + bias-RW contributions into the (K,K,15,15)
    Hessian and (K,15) gradient; returns (H, g, cost)."""
    K = poses.t.shape[0]
    dtype = poses.t.dtype
    Km1 = K - 1

    T_i = SE3(poses.R[:-1], poses.t[:-1])
    T_j = SE3(poses.R[1:], poses.t[1:])
    v_i, v_j = prob.vel[:-1], prob.vel[1:]
    bg_i, ba_i = prob.bg[:-1], prob.ba[:-1]

    def edge(p9, Ti_R, Ti_t, Tj_R, Tj_t, vi, vj, bgi, bai):
        Ti = SE3(Ti_R, Ti_t)
        Tj = SE3(Tj_R, Tj_t)
        f = lambda d: _inertial_residual_tangent(
            d, Ti, Tj, vi, vj, bgi, bai, p9, prob.gravity,
            prob.R_bc, prob.t_bc,
        )
        r = f(jnp.zeros((24,), dtype))
        J = jax.jacfwd(f)(jnp.zeros((24,), dtype))  # (9, 24)
        info = pre.information(p9)
        return r, J, info

    r, J, info = jax.vmap(edge)(
        prob.preint, T_i.R, T_i.t, T_j.R, T_j.t, v_i, v_j, bg_i, ba_i
    )  # r (Km1,9), J (Km1,9,24), info (Km1,9,9)

    w = prob.inertial_valid.astype(dtype)
    JtI = jnp.einsum("eri,ers->eis", J, info)  # (Km1,24,9)
    H_e = jnp.einsum("eis,esj,e->eij", JtI, J, w)  # (Km1,24,24)
    g_e = jnp.einsum("eis,es,e->ei", JtI, r, w)  # (Km1,24)
    cost = jnp.sum(jnp.einsum("es,est,et->e", r, info, r) * w)

    # scatter 24-wide edge blocks into the (K,K,15,15) system.
    # edge var order: [i-state(15) | xi_j(6), dv_j(3)]
    H = jnp.zeros((K, K, D, D), dtype)
    g = jnp.zeros((K, D), dtype)
    e_idx = jnp.arange(Km1)

    Hii = H_e[:, 0:15, 0:15]
    Hij_p = H_e[:, 0:15, 15:24]  # j-part covers [pose(6)+vel(3)] = first 9
    Hjj_p = H_e[:, 15:24, 15:24]

    H = H.at[e_idx, e_idx, :, :].add(Hii)
    H = H.at[e_idx, e_idx + 1, :, 0:9].add(Hij_p)
    H = H.at[e_idx + 1, e_idx, 0:9, :].add(jnp.swapaxes(Hij_p, -1, -2))
    H = H.at[e_idx + 1, e_idx + 1, 0:9, 0:9].add(Hjj_p)
    g = g.at[e_idx].add(g_e[:, 0:15])
    g = g.at[e_idx + 1, 0:9].add(g_e[:, 15:24])

    # bias random-walk edges: r = b_{k+1} - b_k, J trivial
    wg = prob.walk_info_g * w
    wa = prob.walk_info_a * w
    rbg = prob.bg[1:] - prob.bg[:-1]
    rba = prob.ba[1:] - prob.ba[:-1]
    I3 = jnp.eye(3, dtype=dtype)
    for (rB, wB, off) in ((rbg, wg, 9), (rba, wa, 12)):
        sl = slice(off, off + 3)
        H = H.at[e_idx, e_idx, sl, sl].add(wB[:, None, None] * I3)
        H = H.at[e_idx + 1, e_idx + 1, sl, sl].add(wB[:, None, None] * I3)
        H = H.at[e_idx, e_idx + 1, sl, sl].add(-wB[:, None, None] * I3)
        H = H.at[e_idx + 1, e_idx, sl, sl].add(-wB[:, None, None] * I3)
        g = g.at[e_idx, sl].add(-wB[:, None] * rB)
        g = g.at[e_idx + 1, sl].add(wB[:, None] * rB)
        cost = cost + jnp.sum(wB * jnp.sum(rB * rB, axis=-1))

    return H, g, cost


def _vi_cost(cam, prob: VIBAProblem, poses, points, use_huber):
    r, _, _, row_mask = _residuals(cam, poses, points, prob.visual)
    _, _, c_vis = _robust_cost_and_weights(r, row_mask, prob.visual, use_huber)
    _, _, c_in = _inertial_system(prob, poses)  # cost only; cheap at this K
    return c_vis + c_in


def _vi_build_and_solve(cam, prob: VIBAProblem, poses, points, lam, use_huber):
    K = poses.t.shape[0]
    dtype = poses.t.dtype
    S6, b6, U, Hpp_inv, bp = _visual_reduced_system(
        cam, poses, points, prob.visual, lam, use_huber
    )
    H_in, g_in, _ = _inertial_system(prob, poses)

    H = H_in.at[:, :, 0:6, 0:6].add(S6)
    g = g_in.at[:, 0:6].add(b6)

    # damping
    kk = jnp.arange(K)
    H = H.at[kk, kk].add(lam[..., None, None] * jnp.eye(D, dtype=dtype))
    # fixed states
    free = (~prob.visual.fixed).astype(dtype)
    H = H * free[:, None, None, None] * free[None, :, None, None]
    H = H.at[kk, kk].add((1.0 - free)[:, None, None] * jnp.eye(D, dtype=dtype))
    g = g * free[:, None]

    Hd = H.transpose(0, 2, 1, 3).reshape(K * D, K * D)
    gd = g.reshape(K * D)
    dx = -jnp.linalg.solve(Hd, gd).reshape(K, D)
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)

    dxc = dx[:, 0:6]
    dxp = back_substitute_points(U, Hpp_inv, bp, dxc)
    return dx, dxp


@partial(jax.jit, static_argnames=("iters", "use_huber"))
@precise
def vi_bundle_adjust(
    cam: CameraParams,
    prob: VIBAProblem,
    iters: int = 8,
    use_huber: bool = True,
    lam0: float = 1e-4,
) -> VIBAResult:
    """LM visual-inertial window BA."""

    def lm_step(carry, _):
        poses, points, vel, bg, ba, lam, cost = carry
        p = prob._replace(vel=vel, bg=bg, ba=ba)
        dx, dxp = _vi_build_and_solve(cam, p, poses, points, lam, use_huber)
        cand_poses = se3.retract_left(poses, dx[:, 0:6])
        cand_points = points + dxp
        cand_vel = vel + dx[:, 6:9]
        cand_bg = bg + dx[:, 9:12]
        cand_ba = ba + dx[:, 12:15]
        cand_p = prob._replace(vel=cand_vel, bg=cand_bg, ba=cand_ba)
        cand_cost = _vi_cost(cam, cand_p, cand_poses, cand_points, use_huber)
        accept = cand_cost < cost
        sel = lambda a, b: jnp.where(accept, a, b)
        new = (
            SE3(sel(cand_poses.R, poses.R), sel(cand_poses.t, poses.t)),
            sel(cand_points, points),
            sel(cand_vel, vel),
            sel(cand_bg, bg),
            sel(cand_ba, ba),
            jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e4),
            jnp.where(accept, cand_cost, cost),
        )
        return new, new[-1]

    poses0 = prob.visual.poses
    points0 = prob.visual.points
    cost0 = _vi_cost(cam, prob, poses0, points0, use_huber)
    lam = jnp.asarray(lam0, points0.dtype)
    (poses, points, vel, bg, ba, _, _), costs = jax.lax.scan(
        lm_step,
        (poses0, points0, prob.vel, prob.bg, prob.ba, lam, cost0),
        None,
        length=iters,
    )
    return VIBAResult(
        poses=poses.normalize(), points=points, vel=vel, bg=bg, ba=ba,
        cost=jnp.concatenate([cost0[None], costs]),
    )
