"""Fixed-lag VI smoother tests (GTSAM/iSAM2-capability equivalent).

A body flies a smooth analytic trajectory; exact IMU (specific force +
angular rate) and visual anchor measurements are generated. The smoother
must (a) pull perturbed states back to ground truth inside the window,
and (b) stay consistent as the window slides (marginal prior carries the
information — EdgePriorPoseImu + Marginalize semantics,
optimizer.cpp:4581/:7095).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.cameras import pinhole
from vi_slam_tpu.imu import preintegration as pre
from vi_slam_tpu.lie import se3, so3
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.optim.smoother import FixedLagSmoother

G = np.array([0.0, 0.0, -9.81])
CAM = CameraParams.make(400.0, 400.0, 320.0, 240.0)
DT_KF = 0.25
IMU_HZ = 200.0


def _traj(t):
    """Analytic body trajectory: position, velocity, acceleration, and a
    slowly yawing attitude R_wb(t)."""
    p = np.array([2.0 * np.sin(0.5 * t), 1.0 * t, 1.5 + 0.3 * np.cos(0.5 * t)])
    v = np.array([1.0 * np.cos(0.5 * t), 1.0, -0.15 * np.sin(0.5 * t)])
    a = np.array([-0.5 * np.sin(0.5 * t), 0.0, -0.075 * np.cos(0.5 * t)])
    yaw = 0.2 * t
    Rwb = np.asarray(so3.exp(jnp.asarray([0.0, 0.0, yaw])))
    w_body = np.array([0.0, 0.0, 0.2])
    return p, v, a, Rwb, w_body


def _imu_between(t0, t1):
    n = int(round((t1 - t0) * IMU_HZ))
    ts = t0 + (np.arange(n) + 0.5) / IMU_HZ
    acc, gyro = [], []
    for t in ts:
        p, v, a, Rwb, w_body = _traj(t)
        f = Rwb.T @ (a - G)  # specific force in body frame
        acc.append(f)
        gyro.append(w_body)
    dts = np.full((n,), 1.0 / IMU_HZ)
    return np.asarray(acc), np.asarray(gyro), dts


def _state_at(t):
    p, v, a, Rwb, _ = _traj(t)
    Rcw = Rwb.T
    tcw = -Rcw @ p
    return SE3(jnp.asarray(Rcw, jnp.float32), jnp.asarray(tcw, jnp.float32)), v


@pytest.fixture(scope="module")
def landmarks():
    rng = np.random.default_rng(0)
    return np.stack(
        [
            rng.uniform(-8, 8, 300),
            rng.uniform(-2, 25, 300),
            rng.uniform(-4, 7, 300),
        ],
        axis=1,
    )


def _vis_anchors(T_cw: SE3, pts, n=96):
    pc = np.asarray(T_cw.apply(jnp.asarray(pts, jnp.float32)))
    uv = np.asarray(pinhole.project(CAM, jnp.asarray(pc)))
    ok = (
        (pc[:, 2] > 0.5)
        & (uv[:, 0] > 0) & (uv[:, 0] < 640)
        & (uv[:, 1] > 0) & (uv[:, 1] < 480)
    )
    ids = np.flatnonzero(ok)[:n]
    return pts[ids], uv[ids]


def test_smoother_converges_and_slides(landmarks):
    calib = pre.ImuCalib.make(1e-4, 1e-3, 1e-6, 1e-5, IMU_HZ)
    sm = FixedLagSmoother(CAM, window=6, max_vis=96)
    rng = np.random.default_rng(1)

    n_states = 10  # > window -> forces marginalization
    errs = []
    for k in range(n_states):
        t = k * DT_KF
        T_gt, v_gt = _state_at(t)
        # perturbed initial state
        xi = rng.normal(size=6) * 0.03
        T0 = se3.retract_left(T_gt, jnp.asarray(xi, jnp.float32))
        v0 = v_gt + rng.normal(size=3) * 0.1
        preint = None
        if k > 0:
            acc, gyro, dts = _imu_between((k - 1) * DT_KF, t)
            preint = pre.integrate(
                calib,
                jnp.asarray(acc, jnp.float32),
                jnp.asarray(gyro, jnp.float32),
                jnp.asarray(dts, jnp.float32),
                jnp.zeros(3, jnp.float32),
                jnp.zeros(3, jnp.float32),
            )
        xw, uv = _vis_anchors(T_gt, landmarks)
        sm.push(T0, v0, preint, vis_xw=xw, vis_uv=uv)
        sm.optimize(iters=4)
        T_est, v_est, bg, ba = sm.latest()
        # pose error vs ground truth
        dT = np.asarray(
            se3.log(SE3(T_est.R, T_est.t).compose(T_gt.inverse()))
        )
        errs.append(np.linalg.norm(dT))
        # velocity recovered
        if k >= 2:
            assert np.linalg.norm(v_est - v_gt) < 0.15, (k, v_est, v_gt)

    errs = np.asarray(errs)
    # all post-warmup states pulled near ground truth, including after
    # the window slid (k >= 6)
    assert errs[2:].max() < 0.02, errs
    # biases stay near zero (exact IMU)
    assert np.linalg.norm(bg) < 0.01
    assert np.linalg.norm(ba) < 0.1


def test_marginal_prior_carries_information(landmarks):
    """After sliding, the oldest in-window state must remain anchored by
    the prior even with NO visual anchors on it."""
    calib = pre.ImuCalib.make(1e-4, 1e-3, 1e-6, 1e-5, IMU_HZ)
    sm = FixedLagSmoother(CAM, window=4, max_vis=96)
    rng = np.random.default_rng(2)
    for k in range(7):
        t = k * DT_KF
        T_gt, v_gt = _state_at(t)
        preint = None
        if k > 0:
            acc, gyro, dts = _imu_between((k - 1) * DT_KF, t)
            preint = pre.integrate(
                calib, jnp.asarray(acc, jnp.float32),
                jnp.asarray(gyro, jnp.float32), jnp.asarray(dts, jnp.float32),
                jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
            )
        # visual anchors only on even states; odd states rely on IMU+prior
        if k % 2 == 0:
            xw, uv = _vis_anchors(T_gt, landmarks)
        else:
            xw, uv = np.zeros((0, 3)), np.zeros((0, 2))
        xi = rng.normal(size=6) * 0.02
        T0 = se3.retract_left(T_gt, jnp.asarray(xi, jnp.float32))
        sm.push(T0, v_gt + rng.normal(size=3) * 0.05, preint,
                vis_xw=xw, vis_uv=uv)
        sm.optimize(iters=4)
    T_est, v_est, _, _ = sm.latest()
    T_gt, v_gt = _state_at(6 * DT_KF)
    dT = np.asarray(se3.log(SE3(T_est.R, T_est.t).compose(T_gt.inverse())))
    assert np.linalg.norm(dT) < 0.05, dT
