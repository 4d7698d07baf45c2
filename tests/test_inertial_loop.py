"""Inertial loop closure: the gravity-referenced 4DoF essential graph.

Covers the LoopClosing::CorrectLoop inertial branch
(/root/reference/src/core/loopclosing.cpp:992 ->
Optimizer::OptimizeEssentialGraph4DoF, optimizer.cpp:7521): once the IMU
is initialized the loop correction must (a) run the yaw+translation
graph about the ESTIMATED gravity axis so the correction cannot tilt the
gravity-aligned map, and (b) rotate keyframe velocities by the per-KF
pose correction (Rcor * Vw semantics).

The end-to-end drifted ring reuses test_loop_closing's world (the drift
is yaw-about-z + translation, exactly the subspace a 4DoF graph can
correct); gravity is set along z accordingly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_loop_closing import (  # noqa: F401  (fixture re-export)
    K_KF,
    _build_drifted_map,
    _centers,
    _gt_pose,
    loop_world,
)

from vi_slam_tpu.lie import so3
from vi_slam_tpu.lie.sim3 import Sim3
from vi_slam_tpu.lie import sim3 as sim3_m
from vi_slam_tpu.optim.pose_graph import optimize_pose_graph
from vi_slam_tpu.pipeline.loop_closing import LoopCloser
from vi_slam_tpu.pipeline.vio import StereoInertialVO
from vi_slam_tpu.retrieval import vocabulary as voc
from vi_slam_tpu.utils.config import (
    CameraConfig,
    IMUConfig,
    MapConfig,
    SystemConfig,
)


def test_4dof_projection_preserves_axis_rotation():
    """Unit: the yaw_axis-projected pose graph moves rotation ONLY about
    the given axis, for an axis that is NOT a coordinate axis."""
    rng = np.random.default_rng(0)
    K = 6
    axis = np.asarray([0.3, -0.9, 0.3])
    axis /= np.linalg.norm(axis)
    R = np.tile(np.eye(3), (K, 1, 1)).astype(np.float64)
    t = rng.normal(0, 1.0, (K, 3))
    poses = Sim3(jnp.asarray(R), jnp.asarray(t), jnp.ones((K,)))
    edges = np.asarray([[i, i + 1] for i in range(K - 1)] + [[K - 1, 0]],
                       np.int32)
    Si = Sim3(poses.R[edges[:, 0]], poses.t[edges[:, 0]],
              poses.s[edges[:, 0]])
    Sj = Sim3(poses.R[edges[:, 1]], poses.t[edges[:, 1]],
              poses.s[edges[:, 1]])
    meas = Sj.compose(Si.inverse())
    fixed = np.zeros((K,), bool)
    fixed[0] = True
    res = optimize_pose_graph(
        poses, jnp.asarray(edges), meas,
        jnp.ones((K,), bool), jnp.ones((K,)), jnp.asarray(fixed),
        iters=10, mode="4dof", yaw_axis=jnp.asarray(axis),
    )
    for k in range(K):
        Rk = np.asarray(res.poses.R[k])
        w = np.asarray(
            sim3_m.log(Sim3(jnp.asarray(Rk), jnp.zeros(3), jnp.ones(())))
        )[3:6]
        ortho = w - axis * (axis @ w)
        assert np.linalg.norm(ortho) < 1e-5, (k, w)


def test_inertial_loop_corrects_with_4dof(loop_world):
    """E2E on the drifted ring: with gravity_aligned set, the closer must
    select the 4DoF graph, restore the ring, and leave every keyframe's
    rotation correction a pure yaw about the gravity axis."""
    cam, pts, desc, T_gt, vis, uv_all = loop_world
    state, all_desc, seam_dup = _build_drifted_map(loop_world)
    vocab = voc.train_vocabulary(all_desc, k=6, levels=3, iters=4, seed=2)
    cfg = SystemConfig(map=MapConfig(max_keyframes=16, max_points=4096,
                                     max_obs_per_point=8,
                                     essential_weight_min=100))
    lc = LoopCloser(cfg, cam, vocab, fix_scale=True, min_gap_kfs=8,
                    run_gba=False)
    # inertial map: gravity along z (the ring's drift is yaw-about-z,
    # i.e. exactly the 4DoF-correctable subspace)
    lc.gravity_aligned = True
    lc.gravity_w = jnp.asarray([0.0, 0.0, -9.81])
    lc.consistency_th = 1  # single-query test drives process() once
    for k in range(K_KF):
        lc.add_keyframe(state, k)

    old_R = np.asarray(state.kf_R)[:K_KF]
    state2, closed = lc.process(state, K_KF - 1, K_KF)
    assert closed, "loop was not detected/verified"
    assert lc._last_old_poses is not None  # hook handshake for the owner

    gt_R = np.stack([T[:3, :3] for T in T_gt])
    gt_t = np.stack([T[:3, 3] for T in T_gt])
    c_gt = _centers(gt_R, gt_t)
    c1 = _centers(np.asarray(state2.kf_R), np.asarray(state2.kf_t))[:K_KF]
    err_after = np.linalg.norm(c1 - c_gt, axis=-1)
    assert err_after[-1] < 0.05  # seam closed
    assert err_after.max() < 0.25

    # every rotation correction is a pure yaw about gravity (z)
    new_R = np.asarray(state2.kf_R)[:K_KF]
    for k in range(K_KF):
        R_cor = new_R[k].T @ old_R[k]
        w = np.asarray(so3.log(jnp.asarray(R_cor)))
        assert np.linalg.norm(w[:2]) < 1e-4, (k, w)  # no tilt


def test_velocity_rotation_hook():
    """Unit: StereoInertialVO._after_loop_correction rotates keyframe
    velocities by each keyframe's pose correction (Rcor * Vw,
    tracking-side of CorrectLoop)."""
    cfg = SystemConfig(
        camera=CameraConfig(width=64, height=48, fx=50.0, fy=50.0,
                            cx=32.0, cy=24.0, bf=25.0),
        map=MapConfig(max_keyframes=8, max_points=256, max_obs_per_point=4),
        imu=IMUConfig(freq=100.0),
    )
    vo = StereoInertialVO(cfg)
    K = 8
    rng = np.random.default_rng(1)
    old_R = np.stack([
        np.asarray(so3.exp(jnp.asarray(rng.normal(0, 0.3, 3))))
        for _ in range(K)
    ])
    yaw = rng.normal(0, 0.2, K)
    R_cor_gt = np.stack([
        np.asarray(so3.exp(jnp.asarray([0.0, 0.0, y]))) for y in yaw
    ])
    # new pose: R_n = R_o @ R_cor^T  =>  R_n^T R_o = R_cor
    new_R = np.einsum("kij,klj->kil", old_R, R_cor_gt)
    vel = rng.normal(0, 1.5, (K, 3)).astype(np.float32)

    vo.imu_ready = True
    vo.ref_kf = 2
    vo.kf_vel_dev = jnp.asarray(vel)
    vo.vel_w_dev = jnp.asarray(vel[2])
    vo.map = vo.map._replace(
        kf_R=jnp.asarray(new_R, vo.map.kf_R.dtype),
        kf_valid=jnp.ones((K,), bool),
    )

    class _FakeLC:
        _last_old_poses = (jnp.asarray(old_R, vo.map.kf_R.dtype), None)
        loop_edges = []

    vo.loop_closer = _FakeLC()
    vo._after_loop_correction()

    got = np.asarray(jax.device_get(vo.kf_vel_dev))
    want = np.einsum("kij,kj->ki", R_cor_gt, vel)
    np.testing.assert_allclose(got, want, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(vo.vel_w_dev)), want[2], atol=1e-4
    )
    assert vo.loop_closer._last_old_poses is None  # consumed once
