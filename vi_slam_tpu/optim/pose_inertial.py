"""Per-frame visual-inertial pose optimization — the VIO hot loop.

Semantic reference: `Optimizer::PoseInertialOptimizationLastFrame` /
`...LastKeyFrame` (`/root/reference/src/optimization/optimizer.cpp:7095 /
:6701`): a single frame's pose+velocity vertex set, monocular/stereo
reprojection edges, one `EdgeInertial` (g2otypes.h:484) to the previous
frame's state, chi2 outlier re-classification between rounds. The
reference also carries bias vertices with random-walk edges; here biases
are held at their keyframe-rate estimates (VI-BA / inertial init own
them) and only [pose(6), velocity(3)] move per frame — the bias random
walk over one frame interval is negligible and this keeps the per-frame
solve a 9x9.

TPU design: one jitted program. The visual block reuses the batched
residual/Jacobian machinery of pose_opt; the inertial 9-residual block is
linearized with `jax.jacfwd` on the 9-dim tangent retraction (one forward
pass per tangent dim — trivial next to the visual batch).
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
from vi_slam_tpu.optim import robust
from vi_slam_tpu.optim.pose_opt import PoseObs, _residual_jac, _chi2
from vi_slam_tpu.utils.precision import precise


def body_from_cam(T_cw: SE3, R_bc: jnp.ndarray, t_bc: jnp.ndarray):
    """World-frame body (IMU) rotation/position from a camera pose.

    T_bc maps camera-frame points to the body frame (kalibr T_imu_cam);
    T_bw = T_bc ∘ T_cw, and (Rwb, pwb) = inverse(T_bw)."""
    R_bw = R_bc @ T_cw.R
    t_bw = jnp.einsum("ij,j->i", R_bc, T_cw.t) + t_bc
    Rwb = R_bw.T
    pwb = -Rwb @ t_bw
    return Rwb, pwb


class PoseInertialState(NamedTuple):
    T_cw: SE3
    vel: jnp.ndarray  # (3,) world-frame body velocity


@partial(jax.jit, static_argnames=("rounds", "iters"))
@precise
def pose_inertial_optimize(
    cam: CameraParams,
    T_init: SE3,
    v_init: jnp.ndarray,
    obs: PoseObs,
    preint: pre.Preintegrated,  # from the previous frame
    R1: jnp.ndarray,  # previous frame body rotation (world)
    v1: jnp.ndarray,
    p1: jnp.ndarray,
    bg: jnp.ndarray,
    ba: jnp.ndarray,
    gravity_w: jnp.ndarray,  # (3,) e.g. [0, 0, -9.81] in gravity-aligned world
    R_bc: jnp.ndarray,
    t_bc: jnp.ndarray,
    rounds: int = 3,
    iters: int = 6,
) -> Tuple[SE3, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (T_opt, v_opt, inlier_mask, n_inliers)."""
    info9 = pre.information(preint)
    chi2_th = jnp.where(obs.stereo, robust.CHI2_STEREO, robust.CHI2_MONO)

    def inertial_res(delta9, T: SE3, v):
        Tc = se3.retract_left(T, delta9[0:6])
        vc = v + delta9[6:9]
        R2, p2 = body_from_cam(Tc, R_bc, t_bc)
        return pre.inertial_residual(
            preint, R1, v1, p1, R2, vc, p2, bg, ba, gravity_w
        )

    def gn_round(carry, use_huber):
        T, v, inlier = carry

        def step(i, Tv):
            T, v = Tv
            r, J, row_mask = _residual_jac(cam, T, obs)
            row_mask = row_mask * inlier[:, None].astype(r.dtype)
            chi2 = _chi2(r, row_mask, obs.sigma2)
            w = 1.0 / obs.sigma2
            if use_huber:
                delta2 = jnp.where(
                    obs.stereo, robust.CHI2_STEREO, robust.CHI2_MONO
                )
                w = w * robust.huber_weight(chi2 / delta2, 1.0)
            Jm = J * row_mask[..., None]
            rm = r * row_mask
            H = jnp.zeros((9, 9), r.dtype)
            g = jnp.zeros((9,), r.dtype)
            H = H.at[0:6, 0:6].set(jnp.einsum("nki,nkj,n->ij", Jm, Jm, w))
            g = g.at[0:6].set(jnp.einsum("nki,nk,n->i", Jm, rm, w))

            z9 = jnp.zeros((9,), r.dtype)
            r_in = inertial_res(z9, T, v)
            J_in = jax.jacfwd(inertial_res)(z9, T, v)  # (9,9)
            H = H + J_in.T @ info9 @ J_in
            g = g + J_in.T @ info9 @ r_in

            damp = 1e-6 * jnp.trace(H) / 9.0 + 1e-9
            dx = -jnp.linalg.solve(H + damp * jnp.eye(9, dtype=H.dtype), g)
            dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
            return (se3.retract_left(T, dx[0:6]), v + dx[6:9])

        T, v = jax.lax.fori_loop(0, iters, step, (T, v))
        r, _, row_mask = _residual_jac(cam, T, obs)
        chi2 = _chi2(r, row_mask, obs.sigma2)
        new_inlier = obs.valid & (chi2 <= chi2_th) & (row_mask[:, 0] > 0)
        return (T, v, new_inlier)

    carry = (T_init, v_init, obs.valid)
    for rnd in range(rounds):
        carry = gn_round(carry, use_huber=rnd < 2)
    T, v, inlier = carry
    return T, v, inlier, jnp.sum(inlier)


class MarginalPrior(NamedTuple):
    """15-dim marginal prior on a frame state (EdgePriorPoseImu,
    g2otypes.h:740): information matrix + linearization point."""

    H: jnp.ndarray  # (15, 15)
    R: jnp.ndarray  # (3, 3) lin-point Tcw rotation
    t: jnp.ndarray  # (3,)
    vel: jnp.ndarray  # (3,)
    bg: jnp.ndarray  # (3,)
    ba: jnp.ndarray  # (3,)


def initial_prior(T: SE3, vel, bg, ba, dtype=jnp.float32) -> MarginalPrior:
    """Seed prior right after inertial initialization: the pose is pinned
    by the visual solve, velocity moderately, biases strongly (the init
    just estimated them)."""
    d = jnp.concatenate(
        [
            jnp.full((6,), 1e3, dtype),
            jnp.full((3,), 1e2, dtype),
            jnp.full((6,), 1e4, dtype),
        ]
    )
    return MarginalPrior(
        H=jnp.diag(d), R=T.R, t=T.t, vel=jnp.asarray(vel, dtype),
        bg=jnp.asarray(bg, dtype), ba=jnp.asarray(ba, dtype),
    )


@partial(jax.jit, static_argnames=("rounds", "iters"))
@precise
def pose_inertial_prior_optimize(
    cam: CameraParams,
    prior: MarginalPrior,
    T1_init: SE3,
    v1_init: jnp.ndarray,
    bg1_init: jnp.ndarray,
    ba1_init: jnp.ndarray,
    T2_init: SE3,
    v2_init: jnp.ndarray,
    obs: PoseObs,
    preint: pre.Preintegrated,
    gravity_w: jnp.ndarray,
    R_bc: jnp.ndarray,
    t_bc: jnp.ndarray,
    walk_info_g: jnp.ndarray,
    walk_info_a: jnp.ndarray,
    rounds: int = 2,
    iters: int = 5,
):
    """The full PoseInertialOptimizationLastFrame graph
    (optimizer.cpp:7095): BOTH frame states move — previous frame
    [pose, vel, bg, ba] under its marginal prior, current frame under the
    visual observations — connected by one EdgeInertial (biases taken
    from the previous state, as in g2otypes.h:484) and gyro/acc
    random-walk edges. After convergence the previous state is
    Schur-marginalized out of the final Hessian (Optimizer::Marginalize,
    optimizer.cpp:4581), producing the next frame's prior.

    State tangent (30,): [xi1(6) dv1(3) dbg1(3) dba1(3)
                          xi2(6) dv2(3) dbg2(3) dba2(3)].
    Returns (T2, v2, bg2, ba2, prior_next, inlier_mask, n_inliers)."""
    dtype = T2_init.t.dtype
    info9 = pre.information(preint)
    chi2_th = jnp.where(obs.stereo, robust.CHI2_STEREO, robust.CHI2_MONO)
    prior_T = SE3(prior.R, prior.t)

    def split(d):
        return (d[0:6], d[6:9], d[9:12], d[12:15], d[15:21], d[21:24],
                d[24:27], d[27:30])

    def inertial_res(d, st):
        T1, v1, bg1, ba1, T2, v2, bg2, ba2 = st
        x1, dv1, dbg1, dba1, x2, dv2, _, _ = split(d)
        T1c = se3.retract_left(T1, x1)
        T2c = se3.retract_left(T2, x2)
        Rb1, pb1 = body_from_cam(T1c, R_bc, t_bc)
        Rb2, pb2 = body_from_cam(T2c, R_bc, t_bc)
        return pre.inertial_residual(
            preint, Rb1, v1 + dv1, pb1, Rb2, v2 + dv2, pb2,
            bg1 + dbg1, ba1 + dba1, gravity_w,
        )

    def prior_res(d, st):
        T1, v1, bg1, ba1 = st[0], st[1], st[2], st[3]
        x1, dv1, dbg1, dba1 = split(d)[:4]
        T1c = se3.retract_left(T1, x1)
        r_pose = se3.log(T1c.compose(prior_T.inverse()))
        return jnp.concatenate([
            r_pose, v1 + dv1 - prior.vel, bg1 + dbg1 - prior.bg,
            ba1 + dba1 - prior.ba,
        ])

    def build_system(st, inlier, use_huber):
        T1, v1, bg1, ba1, T2, v2, bg2, ba2 = st
        H = jnp.zeros((30, 30), dtype)
        g = jnp.zeros((30,), dtype)
        # visual on state 2 pose
        r, J, row_mask = _residual_jac(cam, T2, obs)
        row_mask = row_mask * inlier[:, None].astype(r.dtype)
        chi2 = _chi2(r, row_mask, obs.sigma2)
        w = 1.0 / obs.sigma2
        if use_huber:
            delta2 = jnp.where(obs.stereo, robust.CHI2_STEREO, robust.CHI2_MONO)
            w = w * robust.huber_weight(chi2 / delta2, 1.0)
        Jm = J * row_mask[..., None]
        rm = r * row_mask
        H = H.at[15:21, 15:21].add(jnp.einsum("nki,nkj,n->ij", Jm, Jm, w))
        g = g.at[15:21].add(jnp.einsum("nki,nk,n->i", Jm, rm, w))
        # inertial edge
        z = jnp.zeros((30,), dtype)
        r_i = inertial_res(z, st)
        J_i = jax.jacfwd(inertial_res)(z, st)  # (9, 30)
        H = H + J_i.T @ info9 @ J_i
        g = g + J_i.T @ info9 @ r_i
        # bias random walks bg2-bg1, ba2-ba1
        for (a, b, wi) in ((slice(9, 12), slice(24, 27), walk_info_g),
                           (slice(12, 15), slice(27, 30), walk_info_a)):
            I3 = jnp.eye(3, dtype=dtype) * wi
            H = H.at[a, a].add(I3).at[b, b].add(I3)
            H = H.at[a, b].add(-I3).at[b, a].add(-I3)
        r_bg = bg2 - bg1
        r_ba = ba2 - ba1
        g = g.at[24:27].add(walk_info_g * r_bg).at[9:12].add(-walk_info_g * r_bg)
        g = g.at[27:30].add(walk_info_a * r_ba).at[12:15].add(-walk_info_a * r_ba)
        # marginal prior on state 1
        r_p = prior_res(z, st)
        J_p = jax.jacfwd(prior_res)(z, st)  # (15, 30)
        H = H + J_p.T @ prior.H @ J_p
        g = g + J_p.T @ prior.H @ r_p
        return H, g

    def retract(st, dx):
        T1, v1, bg1, ba1, T2, v2, bg2, ba2 = st
        x1, dv1, dbg1, dba1, x2, dv2, dbg2, dba2 = split(dx)
        return (
            se3.retract_left(T1, x1), v1 + dv1, bg1 + dbg1, ba1 + dba1,
            se3.retract_left(T2, x2), v2 + dv2, bg2 + dbg2, ba2 + dba2,
        )

    def gn_round(carry, use_huber):
        st, inlier = carry

        def step(i, st):
            H, g = build_system(st, inlier, use_huber)
            damp = 1e-6 * jnp.trace(H) / 30.0 + 1e-9
            dx = -jnp.linalg.solve(H + damp * jnp.eye(30, dtype=dtype), g)
            dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
            return retract(st, dx)

        st = jax.lax.fori_loop(0, iters, step, st)
        r, _, row_mask = _residual_jac(cam, st[4], obs)
        chi2 = _chi2(r, row_mask, obs.sigma2)
        new_inlier = obs.valid & (chi2 <= chi2_th) & (row_mask[:, 0] > 0)
        return st, new_inlier

    st = (T1_init, v1_init, bg1_init, ba1_init, T2_init, v2_init,
          bg1_init, ba1_init)
    inlier = obs.valid
    for rnd in range(rounds):
        st, inlier = gn_round((st, inlier), use_huber=rnd < 1)

    # marginalize state 1 out of the converged system -> next prior
    H, _ = build_system(st, inlier, False)
    H11 = H[0:15, 0:15] + 1e-6 * jnp.eye(15, dtype=dtype)
    H12 = H[0:15, 15:30]
    H22 = H[15:30, 15:30]
    H_marg = H22 - H12.T @ jnp.linalg.solve(H11, H12)
    H_marg = 0.5 * (H_marg + H_marg.T)
    T2, v2, bg2, ba2 = st[4], st[5], st[6], st[7]
    prior_next = MarginalPrior(
        H=H_marg, R=T2.R, t=T2.t, vel=v2, bg=bg2, ba=ba2
    )
    return T2, v2, bg2, ba2, prior_next, inlier, jnp.sum(inlier)


def predict_camera_pose(
    preint: pre.Preintegrated,
    T_last_cw: SE3,
    v1: jnp.ndarray,
    bg: jnp.ndarray,
    ba: jnp.ndarray,
    gravity_w: jnp.ndarray,
    R_bc: jnp.ndarray,
    t_bc: jnp.ndarray,
) -> Tuple[SE3, jnp.ndarray]:
    """IMU dead-reckoning pose prediction (Tracking::PredictStateIMU,
    tracking.cpp:1507): propagate the previous frame's body state through
    the preintegrated deltas, return the predicted camera Tcw and body
    velocity."""
    R1, p1 = body_from_cam(T_last_cw, R_bc, t_bc)
    dR, dV, dP = pre.delta_with_bias(preint, bg, ba)
    dt = preint.dt
    R2 = R1 @ dR
    v2 = v1 + gravity_w * dt + R1 @ dV
    p2 = p1 + v1 * dt + 0.5 * gravity_w * dt * dt + R1 @ dP
    # camera pose from body: T_cw = inv(T_bc) ∘ T_bw, T_bw = [R2, p2]^-1
    R_bw = R2.T
    t_bw = -R_bw @ p2
    R_cb = R_bc.T
    t_cb = -R_cb @ t_bc
    R_cw = R_cb @ R_bw
    t_cw = jnp.einsum("ij,j->i", R_cb, t_bw) + t_cb
    return SE3(so3.normalize(R_cw), t_cw), v2
