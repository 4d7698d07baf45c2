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


def stereo_project(cam: CameraParams, xyz: jnp.ndarray) -> jnp.ndarray:
    """(u_L, v_L, u_R) with the pseudo-disparity convention
    u_R = u_L - bf / z: fisheye-stereo depth enters the pipeline through
    `triangulate_matches` (the reference's KannalaBrandt8::TriangulateMatches
    path, kannalabrandt8.h:87), after which the synthetic right coordinate
    makes the stereo BA edge and KF creation identical to the rectified
    pipeline (the same trick the RGBD path uses, frame.cpp RGBD ctor)."""
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
    row_ur = J2[..., 0, :] + jnp.stack(
        [zeros, zeros, cam.bf * inv_z2], axis=-1
    )
    return jnp.concatenate([J2, row_ur[..., None, :]], axis=-2)


def triangulate_matches(
    cam: CameraParams,
    uv_left: jnp.ndarray,
    uv_right: jnp.ndarray,
    baseline: jnp.ndarray,
    min_parallax_cos: float = 0.9998,
) -> jnp.ndarray:
    """Fisheye-stereo two-ray triangulation (TriangulateMatches,
    kannalabrandt8.cpp / kannalabrandt8.h:87): unproject both pixels to
    bearings, intersect the rays of a laterally displaced rig (right
    camera at +baseline along x, identity rotation — the lapping-area rig
    after rectification-free calibration), and return the left-camera
    depth z (-1 where the rays are near-parallel or behind the rig).

    uv_left/uv_right: (..., 2). Returns (...,) float32 depth.
    """
    bL = unproject(cam, uv_left)
    bR = unproject(cam, uv_right)
    bL = bL / jnp.linalg.norm(bL, axis=-1, keepdims=True)
    bR = bR / jnp.linalg.norm(bR, axis=-1, keepdims=True)
    # parallax gate (reference: cosParallaxRays check)
    cosp = jnp.sum(bL * bR, axis=-1)
    # midpoint method: p = s*bL ; p - t = r*bR with t = (baseline, 0, 0)
    t = jnp.stack(
        [baseline, jnp.zeros_like(baseline), jnp.zeros_like(baseline)],
        axis=-1,
    )
    b11 = jnp.sum(bL * bL, axis=-1)
    b12 = -jnp.sum(bL * bR, axis=-1)
    b22 = jnp.sum(bR * bR, axis=-1)
    c1 = jnp.sum(t * bL, axis=-1)
    c2 = -jnp.sum(t * bR, axis=-1)
    det = b11 * b22 - b12 * b12
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    s = (c1 * b22 - c2 * b12) / det
    r = (b11 * c2 - b12 * c1) / det
    mid = 0.5 * (s[..., None] * bL + (t + r[..., None] * bR))
    z = mid[..., 2]
    ok = (s > 0) & (r > 0) & (z > 0) & (cosp < min_parallax_cos)
    return jnp.where(ok, z, -1.0)
