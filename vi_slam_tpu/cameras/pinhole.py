"""Pinhole camera with radial-tangential distortion.

Semantic reference: `/root/reference/src/geometry/cameramodels/pinhole.cpp`
(project/unproject/projectJac) and `Frame::UndistortKeyPoints`
(`/root/reference/src/datastructures/frame.cpp:758`, which uses
cv::undistortPoints). All functions are batched over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from vi_slam_tpu.cameras.base import CameraParams


def project(cam: CameraParams, xyz: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points (..., 3) to pixels (..., 2).

    No distortion is applied: the pipeline works on pre-undistorted
    keypoints, mirroring the reference (Frame undistorts keypoints once,
    then all geometry uses the linear model — frame.cpp:758).
    """
    z = xyz[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * xyz[..., 0] * inv_z + cam.cx
    v = cam.fy * xyz[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_jac(cam: CameraParams, xyz: jnp.ndarray) -> jnp.ndarray:
    """d(uv)/d(xyz) (..., 2, 3) — analytic, the hot BA Jacobian
    (reference: pinhole.cpp projectJac)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * inv_z, zeros, -cam.fx * x * inv_z2], axis=-1)
    row_v = jnp.stack([zeros, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def unproject(cam: CameraParams, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., 2) -> unit-depth bearing (..., 3) (linear model)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def distort_normalized(cam: CameraParams, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply radtan distortion to normalized coords (..., 2)."""
    k1, k2, p1, p2, k3 = (cam.dist[i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: CameraParams, uv: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Undistort pixel keypoints (..., 2) -> ideal pixel coords (..., 2).

    Fixed-point iteration identical in spirit to cv::undistortPoints
    (the reference's UndistortKeyPoints path, frame.cpp:758). `iters` is a
    static unrolled count — jit-friendly, converges fast for moderate
    distortion.
    """
    xd = (uv[..., 0] - cam.cx) / cam.fx
    yd = (uv[..., 1] - cam.cy) / cam.fy
    d = jnp.stack([xd, yd], axis=-1)
    xy = d
    for _ in range(iters):
        delta = distort_normalized(cam, xy) - xy
        xy = d - delta
    u = cam.fx * xy[..., 0] + cam.cx
    v = cam.fy * xy[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_distorted(cam: CameraParams, xyz: jnp.ndarray) -> jnp.ndarray:
    """Full projection including distortion — used when synthesizing raw
    images / simulating sensors, not in the BA hot path."""
    z = xyz[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xy = xyz[..., :2] * inv_z[..., None]
    xyd = distort_normalized(cam, xy)
    u = cam.fx * xyd[..., 0] + cam.cx
    v = cam.fy * xyd[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def stereo_project(cam: CameraParams, xyz: jnp.ndarray) -> jnp.ndarray:
    """Project to (u_L, v_L, u_R) as used by stereo BA edges
    (reference: g2otypes EdgeStereo, frame mvuRight)."""
    uv = project(cam, xyz)
    z = xyz[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    ur = uv[..., 0] - cam.bf * inv_z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def stereo_project_jac(cam: CameraParams, xyz: jnp.ndarray) -> jnp.ndarray:
    """d(u_L, v_L, u_R)/d(xyz) (..., 3, 3)."""
    J2 = project_jac(cam, xyz)
    x, z = xyz[..., 0], xyz[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(x)
    # u_R = u_L - bf/z -> d u_R = d u_L + bf/z^2 dz
    row_ur = J2[..., 0, :] + jnp.stack([zeros, zeros, cam.bf * inv_z2], axis=-1)
    return jnp.concatenate([J2, row_ur[..., None, :]], axis=-2)
