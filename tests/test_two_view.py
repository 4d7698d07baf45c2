"""Monocular two-view reconstruction tests (MonoInitializer parity).

General-motion scenes must select F and recover (R, t) up to scale;
planar scenes must select H and still recover the correct motion;
outliers must be rejected.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.cameras import pinhole
from vi_slam_tpu.geometry.two_view import reconstruct_two_view
from vi_slam_tpu.lie import so3
from vi_slam_tpu.lie.se3 import SE3

CAM = CameraParams.make(500.0, 500.0, 320.0, 240.0, bf=0.0)


def _project_scene(pts_w, R, t, rng, n_outliers=0, noise=0.3):
    """Project into view1 (identity) and view2 (R, t); returns uv1, uv2,
    valid mask."""
    T2 = SE3(jnp.asarray(R), jnp.asarray(t))
    pc1 = jnp.asarray(pts_w)
    pc2 = T2.apply(pc1)
    uv1 = np.array(pinhole.project(CAM, pc1))
    uv2 = np.array(pinhole.project(CAM, pc2))
    uv1 += rng.normal(size=uv1.shape) * noise
    uv2 += rng.normal(size=uv2.shape) * noise
    valid = (np.asarray(pc1)[:, 2] > 0.5) & (np.asarray(pc2)[:, 2] > 0.5)
    if n_outliers:
        idx = rng.choice(len(uv1), n_outliers, replace=False)
        uv2[idx] += rng.uniform(30, 120, size=(n_outliers, 2)) * rng.choice(
            [-1, 1], size=(n_outliers, 2)
        )
    return jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid)


def _angle_between(R_est, R_true):
    dR = np.asarray(R_est) @ np.asarray(R_true).T
    return float(np.linalg.norm(np.asarray(so3.log(jnp.asarray(dR)))))


def _dir_error(t_est, t_true):
    a = np.asarray(t_est) / np.linalg.norm(t_est)
    b = np.asarray(t_true) / np.linalg.norm(t_true)
    return float(np.arccos(np.clip(abs(a @ b), -1, 1)))


def test_general_scene_selects_f():
    rng = np.random.default_rng(0)
    n = 300
    pts = np.stack(
        [
            rng.uniform(-4, 4, n),
            rng.uniform(-3, 3, n),
            rng.uniform(4, 12, n),
        ],
        axis=1,
    )
    R = np.asarray(so3.exp(jnp.asarray([0.02, -0.05, 0.01])))
    t = np.asarray([0.6, 0.05, 0.1])
    uv1, uv2, valid = _project_scene(pts, R, t, rng, n_outliers=30)
    res = reconstruct_two_view(
        CAM, uv1, uv2, valid, jnp.ones((n,)), jax.random.PRNGKey(1)
    )
    assert bool(res.ok)
    assert not bool(res.used_homography)
    assert _angle_between(res.T21.R, R) < 0.01
    assert _dir_error(res.T21.t, t) < 0.02
    # triangulated structure correct up to scale
    good = np.asarray(res.inliers)
    est = np.asarray(res.points)[good]
    true = pts[good]
    scale = np.median(np.linalg.norm(true, axis=1) / np.linalg.norm(est, axis=1))
    err = np.linalg.norm(est * scale - true, axis=1)
    assert np.median(err) < 0.1


def test_planar_scene_selects_h():
    rng = np.random.default_rng(1)
    n = 300
    # points on a plane z = 8 + 0.3x - 0.2y
    x = rng.uniform(-4, 4, n)
    y = rng.uniform(-3, 3, n)
    z = 8.0 + 0.3 * x - 0.2 * y
    pts = np.stack([x, y, z], axis=1)
    R = np.asarray(so3.exp(jnp.asarray([0.03, 0.06, -0.02])))
    t = np.asarray([0.5, -0.1, 0.15])
    uv1, uv2, valid = _project_scene(pts, R, t, rng, n_outliers=15)
    res = reconstruct_two_view(
        CAM, uv1, uv2, valid, jnp.ones((n,)), jax.random.PRNGKey(2)
    )
    assert bool(res.ok)
    assert bool(res.used_homography)
    assert _angle_between(res.T21.R, R) < 0.015
    # t direction from a noisy planar homography is the weakly-observed
    # quantity (t/d coupling with the plane normal); BA refines it later
    assert _dir_error(res.T21.t, t) < 0.12


def test_pure_rotation_rejected():
    """No parallax -> initialization must fail (CheckRT parallax gate)."""
    rng = np.random.default_rng(2)
    n = 200
    pts = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(5, 10, n)],
        axis=1,
    )
    R = np.asarray(so3.exp(jnp.asarray([0.0, 0.08, 0.0])))
    t = np.zeros(3)
    uv1, uv2, valid = _project_scene(pts, R, t, rng)
    res = reconstruct_two_view(
        CAM, uv1, uv2, valid, jnp.ones((n,)), jax.random.PRNGKey(3)
    )
    assert not bool(res.ok)
