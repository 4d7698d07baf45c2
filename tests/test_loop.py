"""Loop-closure geometry tests: Horn Sim3, Sim3 RANSAC/GN, pose graph.

Mirrors the reference's verification intent for Sim3Solver
(sim3solver.cpp), OptimizeSim3 (optimizer.cpp:3466) and
OptimizeEssentialGraph (optimizer.cpp:2122): recover known similarity
transforms under outliers, and remove accumulated drift on a loopy
trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.cameras import pinhole
from vi_slam_tpu.lie import se3, sim3, so3
from vi_slam_tpu.lie.sim3 import Sim3
from vi_slam_tpu.loop.sim3_solver import horn_sim3, sim3_ransac
from vi_slam_tpu.optim.pose_graph import (
    build_essential_edges,
    optimize_pose_graph,
)
from vi_slam_tpu.optim.sim3_opt import optimize_sim3


def rand_sim3(rng, scale=True):
    w = rng.normal(size=3) * 0.5
    R = np.asarray(so3.exp(jnp.asarray(w)))
    t = rng.normal(size=3)
    s = float(np.exp(rng.normal() * 0.2)) if scale else 1.0
    return Sim3(jnp.asarray(R), jnp.asarray(t), jnp.asarray(s))


def test_horn_exact():
    rng = np.random.default_rng(0)
    S = rand_sim3(rng)
    x2 = jnp.asarray(rng.normal(size=(50, 3)) * 2.0)
    x1 = S.apply(x2)
    w = jnp.ones((50,))
    S_est = horn_sim3(x1, x2, w)
    np.testing.assert_allclose(np.asarray(S_est.R), np.asarray(S.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(S_est.t), np.asarray(S.t), atol=1e-5)
    assert float(S_est.s) == pytest.approx(float(S.s), abs=1e-5)


def test_horn_fix_scale():
    rng = np.random.default_rng(1)
    S = rand_sim3(rng, scale=False)
    x2 = jnp.asarray(rng.normal(size=(30, 3)))
    x1 = S.apply(x2)
    S_est = horn_sim3(x1, x2, jnp.ones((30,)), fix_scale=True)
    assert float(S_est.s) == 1.0
    np.testing.assert_allclose(np.asarray(S_est.t), np.asarray(S.t), atol=1e-5)


def _make_two_view(rng, n=200, outlier_frac=0.3):
    """Two cameras seeing a common cloud; returns camera-frame points and
    pixel measurements with a fraction of corrupted correspondences."""
    cam = CameraParams.make(400.0, 400.0, 320.0, 240.0, bf=0.0)
    # ground-truth relative similarity S12 (cam2 -> cam1)
    S12 = rand_sim3(rng)
    x2 = jnp.asarray(rng.normal(size=(n, 3)) * np.array([2.0, 2.0, 1.0]) + np.array([0, 0, 8.0]))
    x1 = S12.apply(x2)
    uv1 = pinhole.project(cam, x1)
    uv2 = pinhole.project(cam, x2)
    # corrupt a fraction of x2 (wrong association)
    n_out = int(n * outlier_frac)
    idx = rng.choice(n, n_out, replace=False)
    x2_np = np.array(x2)
    x2_np[idx] += rng.normal(size=(n_out, 3)) * 3.0
    return cam, S12, x1, jnp.asarray(x2_np), uv1, uv2, idx


def test_sim3_ransac_under_outliers():
    rng = np.random.default_rng(2)
    cam, S12, x1, x2, uv1, uv2, out_idx = _make_two_view(rng)
    n = x1.shape[0]
    res = sim3_ransac(
        cam,
        cam,
        x1,
        x2,
        uv1,
        uv2,
        jnp.ones((n,), bool),
        jnp.ones((n,)),
        jnp.ones((n,)),
        jax.random.PRNGKey(0),
        n_hyp=256,
    )
    assert int(res.n_inliers) > 0.6 * n
    np.testing.assert_allclose(np.asarray(res.S12.R), np.asarray(S12.R), atol=1e-3)
    assert float(res.S12.s) == pytest.approx(float(S12.s), rel=1e-3)
    # outliers flagged
    inl = np.asarray(res.inliers)
    assert inl[out_idx].mean() < 0.2


def test_optimize_sim3_refines():
    rng = np.random.default_rng(3)
    cam, S12, x1, x2, uv1, uv2, out_idx = _make_two_view(rng, outlier_frac=0.1)
    n = x1.shape[0]
    # perturb the ground truth as initialization
    dS = sim3.exp(jnp.asarray(rng.normal(size=7) * 0.02))
    S_init = dS.compose(S12)
    res = optimize_sim3(
        cam,
        cam,
        S_init,
        x1,
        x2,
        uv1,
        uv2,
        jnp.ones((n,), bool),
        jnp.ones((n,)),
        jnp.ones((n,)),
    )
    np.testing.assert_allclose(np.asarray(res.S12.R), np.asarray(S12.R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.S12.t), np.asarray(S12.t), atol=1e-3)
    assert float(res.S12.s) == pytest.approx(float(S12.s), rel=1e-4)
    assert int(res.n_inliers) >= 0.85 * n


def _circle_poses(K, radius=10.0):
    """Ground-truth Sim3 poses S_iw on a circle (world->KF)."""
    Rs, ts = [], []
    for k in range(K):
        th = 2 * np.pi * k / K
        Rwc = np.array(
            [
                [np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0],
                [0, 0, 1],
            ]
        )
        c = np.array([radius * np.cos(th), radius * np.sin(th), 0.0])
        Rcw = Rwc.T
        tcw = -Rcw @ c
        Rs.append(Rcw)
        ts.append(tcw)
    return Sim3(
        jnp.asarray(np.stack(Rs), jnp.float64),
        jnp.asarray(np.stack(ts), jnp.float64),
        jnp.ones((K,), jnp.float64),
    )


def test_pose_graph_closes_loop():
    """Odometry chain with noise + drift; a loop edge between the last and
    first KFs restores global consistency (OptimizeEssentialGraph
    semantics)."""
    rng = np.random.default_rng(4)
    K = 24
    gt = _circle_poses(K)

    # exact relative measurements S_ji for consecutive pairs + loop edge
    def rel(i, j):
        Si = Sim3(gt.R[i], gt.t[i], gt.s[i])
        Sj = Sim3(gt.R[j], gt.t[j], gt.s[j])
        return Sj.compose(Si.inverse())

    edges, meas_R, meas_t, meas_s = [], [], [], []
    for i in range(K - 1):
        S_ji = rel(i, i + 1)
        edges.append((i, i + 1))
        meas_R.append(S_ji.R)
        meas_t.append(S_ji.t)
        meas_s.append(S_ji.s)
    S_loop = rel(K - 1, 0)
    edges.append((K - 1, 0))
    meas_R.append(S_loop.R)
    meas_t.append(S_loop.t)
    meas_s.append(S_loop.s)

    # drifted initialization: integrate odometry with injected noise
    Rs = [np.asarray(gt.R[0])]
    ts = [np.asarray(gt.t[0])]
    ss = [1.0]
    for i in range(K - 1):
        S_ji = rel(i, i + 1)
        noise = sim3.exp(jnp.asarray(rng.normal(size=7) * 0.02, jnp.float64))
        Si = Sim3(jnp.asarray(Rs[-1]), jnp.asarray(ts[-1]), jnp.asarray(ss[-1]))
        Sj = noise.compose(S_ji.compose(Si))
        Rs.append(np.asarray(Sj.R))
        ts.append(np.asarray(Sj.t))
        ss.append(float(Sj.s))
    init = Sim3(
        jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ts)), jnp.asarray(ss)
    )

    E = len(edges)
    meas = Sim3(
        jnp.stack([jnp.asarray(m) for m in meas_R]),
        jnp.stack([jnp.asarray(m) for m in meas_t]),
        jnp.stack([jnp.asarray(m) for m in meas_s]),
    )
    fixed = jnp.zeros((K,), bool).at[0].set(True)
    res = optimize_pose_graph(
        init,
        jnp.asarray(np.asarray(edges, np.int32)),
        meas,
        jnp.ones((E,), bool),
        jnp.ones((E,)),
        fixed,
        iters=15,
        mode="sim3",
    )
    # camera centers must match ground truth closely after closing
    def centers(S):
        R, t = np.asarray(S.R, np.float64), np.asarray(S.t, np.float64)
        s = np.asarray(S.s, np.float64)
        return np.einsum("kji,kj->ki", R, -t) / s[:, None]

    err = np.linalg.norm(centers(res.poses) - centers(gt), axis=-1)
    drift0 = np.linalg.norm(centers(init) - centers(gt), axis=-1)
    assert err.max() < 0.15
    assert err.max() < 0.3 * max(drift0.max(), 1e-9)


def test_pose_graph_se3_mode_keeps_scale():
    K = 6
    gt = _circle_poses(K)
    edges = jnp.asarray([[i, i + 1] for i in range(K - 1)], jnp.int32)

    def rel(i, j):
        Si = Sim3(gt.R[i], gt.t[i], gt.s[i])
        Sj = Sim3(gt.R[j], gt.t[j], gt.s[j])
        return Sj.compose(Si.inverse())

    meas = Sim3(
        jnp.stack([rel(i, i + 1).R for i in range(K - 1)]),
        jnp.stack([rel(i, i + 1).t for i in range(K - 1)]),
        jnp.stack([rel(i, i + 1).s for i in range(K - 1)]),
    )
    init = Sim3(gt.R, gt.t + 0.05, gt.s * 1.0)
    fixed = jnp.zeros((K,), bool).at[0].set(True)
    res = optimize_pose_graph(
        init,
        edges,
        meas,
        jnp.ones((K - 1,), bool),
        jnp.ones((K - 1,)),
        fixed,
        iters=8,
        mode="se3",
    )
    np.testing.assert_allclose(np.asarray(res.poses.s), 1.0, atol=1e-8)


def test_build_essential_edges():
    K = 5
    covis = np.zeros((K, K))
    covis[0, 1] = covis[1, 0] = 150  # strong covisibility
    covis[2, 3] = covis[3, 2] = 50  # below threshold
    parent = np.asarray([-1, 0, 1, 2, 3], np.int32)
    loop = np.asarray([[4, 0]], np.int32)
    edges, valid, w = build_essential_edges(
        jnp.asarray(covis), jnp.asarray(parent), jnp.asarray(loop),
        jnp.ones((K,), bool), min_weight=100, max_edges=16,
    )
    got = {tuple(e) for e, v in zip(np.asarray(edges), np.asarray(valid)) if v}
    assert (0, 1) in got  # covis + spanning tree
    assert (0, 4) in got  # loop edge
    assert (1, 2) in got and (2, 3) in got and (3, 4) in got  # tree
    assert len(got) == 5  # (2,3) covis alone must not appear twice
