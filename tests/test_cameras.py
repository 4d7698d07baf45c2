"""Camera model tests: projection/unprojection roundtrips and Jacobians."""

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.cameras import CameraParams, kb8, pinhole

KITTI = CameraParams.make(718.856, 718.856, 607.1928, 185.2157, bf=386.1448)


def random_points(key, n, zmin=1.0, zmax=50.0):
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, (n,), minval=zmin, maxval=zmax)
    xy = jax.random.uniform(k2, (n, 2), minval=-0.6, maxval=0.6) * z[:, None]
    return jnp.concatenate([xy, z[:, None]], axis=-1)


class TestPinhole:
    def test_project_unproject(self):
        pts = random_points(jax.random.PRNGKey(0), 256)
        uv = pinhole.project(KITTI, pts)
        bearing = pinhole.unproject(KITTI, uv)
        scaled = bearing * pts[:, 2:3]
        np.testing.assert_allclose(np.asarray(scaled), np.asarray(pts), rtol=1e-6)

    def test_project_jacobian_vs_autodiff(self):
        pts = random_points(jax.random.PRNGKey(1), 32)
        J_analytic = pinhole.project_jac(KITTI, pts)
        J_auto = jax.vmap(jax.jacfwd(lambda p: pinhole.project(KITTI, p)))(pts)
        np.testing.assert_allclose(
            np.asarray(J_analytic), np.asarray(J_auto), rtol=1e-5, atol=1e-8
        )

    def test_stereo_jacobian_vs_autodiff(self):
        pts = random_points(jax.random.PRNGKey(2), 32)
        J_analytic = pinhole.stereo_project_jac(KITTI, pts)
        J_auto = jax.vmap(jax.jacfwd(lambda p: pinhole.stereo_project(KITTI, p)))(pts)
        np.testing.assert_allclose(
            np.asarray(J_analytic), np.asarray(J_auto), rtol=1e-5, atol=1e-8
        )

    def test_undistort_roundtrip(self):
        cam = CameraParams.make(
            458.654, 457.296, 367.215, 248.375,
            dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0),
        )
        pts = random_points(jax.random.PRNGKey(3), 128, zmin=2.0)
        uv_ideal = pinhole.project(cam, pts)
        uv_dist = pinhole.project_distorted(cam, pts)
        uv_undist = pinhole.undistort_points(cam, uv_dist, iters=10)
        np.testing.assert_allclose(
            np.asarray(uv_undist), np.asarray(uv_ideal), atol=1e-3
        )

    def test_stereo_disparity_positive(self):
        pts = random_points(jax.random.PRNGKey(4), 64)
        uvr = pinhole.stereo_project(KITTI, pts)
        disparity = uvr[:, 0] - uvr[:, 2]
        assert np.all(np.asarray(disparity) > 0)


class TestKB8:
    CAM = CameraParams.make(
        190.978, 190.973, 254.932, 256.897,
        dist=(0.00348238, 0.000715035, -0.0020532, 0.000202937, 0.0),
    )

    def test_project_unproject(self):
        key = jax.random.PRNGKey(5)
        # wide FOV points, z > 0
        dirs = jax.random.normal(key, (256, 3))
        dirs = dirs.at[:, 2].set(jnp.abs(dirs[:, 2]) + 0.3)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        uv = kb8.project(self.CAM, dirs)
        bearing = kb8.unproject(self.CAM, uv)
        bearing = bearing / jnp.linalg.norm(bearing, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(bearing), np.asarray(dirs), atol=1e-5)

    def test_project_jacobian_vs_autodiff(self):
        key = jax.random.PRNGKey(6)
        pts = random_points(key, 32, zmin=0.5, zmax=10.0)
        J_analytic = kb8.project_jac(self.CAM, pts)
        J_auto = jax.vmap(jax.jacfwd(lambda p: kb8.project(self.CAM, p)))(pts)
        np.testing.assert_allclose(
            np.asarray(J_analytic), np.asarray(J_auto), rtol=1e-4, atol=1e-6
        )

    def test_on_axis(self):
        uv = kb8.project(self.CAM, jnp.asarray([[0.0, 0.0, 5.0]]))
        np.testing.assert_allclose(
            np.asarray(uv[0]), [float(self.CAM.cx), float(self.CAM.cy)], atol=1e-4
        )
