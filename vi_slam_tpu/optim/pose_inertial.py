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
