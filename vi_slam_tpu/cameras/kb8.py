"""Kannala-Brandt equidistant fisheye model ("KB8").

Semantic reference:
`/root/reference/src/geometry/cameramodels/kannalabrandt8.cpp` — 8-parameter
model (fx fy cx cy k1..k4), Newton iteration unprojection to precision 1e-6,
and `TriangulateMatches` for stereo-fisheye rigs
(`include/.../kannalabrandt8.h:27-105`).

theta = angle from optical axis; r(theta) = theta + k1 th^3 + k2 th^5 +
k3 th^7 + k4 th^9 projected at radius r from the principal point.
"""

from __future__ import annotations

import jax.numpy as jnp

from vi_slam_tpu.cameras.base import CameraParams


def _r_of_theta(cam: CameraParams, theta: jnp.ndarray) -> jnp.ndarray:
    k1, k2, k3, k4 = (cam.dist[i] for i in range(4))
    th2 = theta * theta
    return theta * (1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))


def _dr_dtheta(cam: CameraParams, theta: jnp.ndarray) -> jnp.ndarray:
    k1, k2, k3, k4 = (cam.dist[i] for i in range(4))
    th2 = theta * theta
    return 1.0 + th2 * (3 * k1 + th2 * (5 * k2 + th2 * (7 * k3 + th2 * 9 * k4)))


def project(cam: CameraParams, xyz: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> pixels (..., 2)
    (kannalabrandt8.cpp project semantics)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    rho = jnp.sqrt(x * x + y * y)
    rho_safe = jnp.where(rho < 1e-12, 1e-12, rho)
    theta = jnp.arctan2(rho, z)
    r = _r_of_theta(cam, theta)
    scale = r / rho_safe
    u = cam.fx * x * scale + cam.cx
    v = cam.fy * y * scale + cam.cy
    # on-axis limit: project to principal point
    on_axis = rho < 1e-12
    u = jnp.where(on_axis, cam.cx + 0 * u, u)
    v = jnp.where(on_axis, cam.cy + 0 * v, v)
    return jnp.stack([u, v], axis=-1)


def project_jac(cam: CameraParams, xyz: jnp.ndarray) -> jnp.ndarray:
    """Analytic d(uv)/d(xyz) (..., 2, 3) (kannalabrandt8.cpp projectJac)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(jnp.maximum(r2, 1e-18))
    R2 = r2 + z * z
    theta = jnp.arctan2(r, z)
    f = _r_of_theta(cam, theta)  # r(theta)
    fd = _dr_dtheta(cam, theta)

    # d theta / d(x,y,z)
    dthe_dx = x * z / (R2 * r)
    dthe_dy = y * z / (R2 * r)
    dthe_dz = -r / R2

    inv_r = 1.0 / r
    inv_r3 = inv_r / jnp.maximum(r2, 1e-18)
    # u = fx * x * f/r + cx
    du_dx = cam.fx * (fd * dthe_dx * x * inv_r + f * (y * y) * inv_r3)
    du_dy = cam.fx * (fd * dthe_dy * x * inv_r - f * x * y * inv_r3)
    du_dz = cam.fx * fd * dthe_dz * x * inv_r
    dv_dx = cam.fy * (fd * dthe_dx * y * inv_r - f * x * y * inv_r3)
    dv_dy = cam.fy * (fd * dthe_dy * y * inv_r + f * (x * x) * inv_r3)
    dv_dz = cam.fy * fd * dthe_dz * y * inv_r
    return jnp.stack(
        [
            jnp.stack([du_dx, du_dy, du_dz], axis=-1),
            jnp.stack([dv_dx, dv_dy, dv_dz], axis=-1),
        ],
        axis=-2,
    )


def unproject(cam: CameraParams, uv: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Pixels -> unit-depth bearing via Newton on r(theta) = r_obs
    (kannalabrandt8.cpp unproject: precision 1e-6, here a static iteration
    count which exceeds that precision for |theta| < pi/2 + margin)."""
    mx = (uv[..., 0] - cam.cx) / cam.fx
    my = (uv[..., 1] - cam.cy) / cam.fy
    r_obs = jnp.sqrt(mx * mx + my * my)
    r_clip = jnp.minimum(r_obs, jnp.pi)  # match reference clamp of theta
    theta = r_clip  # initial guess: undistorted
    for _ in range(iters):
        f = _r_of_theta(cam, theta) - r_clip
        fd = _dr_dtheta(cam, theta)
        theta = theta - f / jnp.where(jnp.abs(fd) < 1e-9, 1e-9, fd)
    scale = jnp.where(r_obs < 1e-12, 1.0, jnp.tan(theta) / jnp.maximum(r_obs, 1e-12))
    # bearing with z = 1
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)
