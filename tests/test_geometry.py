"""Triangulation and epipolar geometry tests on synthetic configurations."""

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.cameras import CameraParams, pinhole
from vi_slam_tpu.geometry import epipolar, triangulate
from vi_slam_tpu.lie import se3
from vi_slam_tpu.lie.se3 import SE3

CAM = CameraParams.make(500.0, 500.0, 320.0, 240.0, bf=50.0)


def make_two_view(key, n=200):
    kp, kt = jax.random.split(key)
    pts = jnp.concatenate(
        [
            jax.random.uniform(kp, (n, 2), minval=-5.0, maxval=5.0),
            jax.random.uniform(kt, (n, 1), minval=8.0, maxval=30.0),
        ],
        axis=-1,
    )
    T1 = SE3.identity()
    T2 = se3.exp(jnp.asarray([0.5, 0.05, 0.02, 0.01, 0.08, 0.005]))
    return T1, T2, pts


class TestTriangulate:
    def test_dlt_exact(self):
        T1, T2, pts = make_two_view(jax.random.PRNGKey(0))
        b1 = T1.apply(pts)
        b1 = b1 / b1[:, 2:3]
        b2 = T2.apply(pts)
        b2 = b2 / b2[:, 2:3]
        xw = triangulate.triangulate_dlt(T1, T2, b1, b2)
        np.testing.assert_allclose(np.asarray(xw), np.asarray(pts), atol=1e-6)

    def test_dlt_noisy(self):
        T1, T2, pts = make_two_view(jax.random.PRNGKey(1))
        uv1 = pinhole.project(CAM, T1.apply(pts))
        uv2 = pinhole.project(CAM, T2.apply(pts))
        noise = 0.5
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        uv1 += noise * jax.random.normal(k1, uv1.shape)
        uv2 += noise * jax.random.normal(k2, uv2.shape)
        b1 = pinhole.unproject(CAM, uv1)
        b2 = pinhole.unproject(CAM, uv2)
        xw = triangulate.triangulate_dlt(T1, T2, b1, b2)
        err = np.linalg.norm(np.asarray(xw - pts), axis=-1)
        # expected error ~ z^2 * sigma_px / (f * baseline) ≈ 1.8m at z=30
        assert np.median(err) < 1.0

    def test_parallax_and_depth(self):
        T1, T2, pts = make_two_view(jax.random.PRNGKey(3))
        cosp = triangulate.parallax_cos(T1, T2, pts)
        assert np.all(np.asarray(cosp) < 1.0)
        z = triangulate.depths(T2, pts)
        assert np.all(np.asarray(z) > 0)


class TestEpipolar:
    def test_epiline_distance_zero_for_true_matches(self):
        T1, T2, pts = make_two_view(jax.random.PRNGKey(4))
        uv1 = pinhole.project(CAM, T1.apply(pts))
        uv2 = pinhole.project(CAM, T2.apply(pts))
        F12 = epipolar.fundamental_from_poses(T1, T2, CAM.K, CAM.K)
        d2 = epipolar.epiline_distance_sq(F12, uv1, uv2)
        assert float(jnp.max(d2)) < 1e-4

    def test_epiline_distance_nonzero_for_mismatches(self):
        T1, T2, pts = make_two_view(jax.random.PRNGKey(5))
        uv1 = pinhole.project(CAM, T1.apply(pts))
        uv2 = pinhole.project(CAM, T2.apply(pts))
        F12 = epipolar.fundamental_from_poses(T1, T2, CAM.K, CAM.K)
        d2 = epipolar.epiline_distance_sq(F12, uv1, jnp.roll(uv2, 1, axis=0))
        assert float(jnp.median(d2)) > 1.0

    def test_sampson_symmetric_zero(self):
        T1, T2, pts = make_two_view(jax.random.PRNGKey(6))
        uv1 = pinhole.project(CAM, T1.apply(pts))
        uv2 = pinhole.project(CAM, T2.apply(pts))
        F12 = epipolar.fundamental_from_poses(T1, T2, CAM.K, CAM.K)
        d2 = epipolar.sampson_distance_sq(F12, uv1, uv2)
        assert float(jnp.max(d2)) < 1e-4
