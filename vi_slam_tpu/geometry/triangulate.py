"""Batched two-view triangulation and validity checks.

Semantic reference: `MotionEstimator::Triangulate`
(`/root/reference/src/geometry/motion_estimation.cpp`, DLT with SVD) and
`LocalMapping::CreateNewMapPoints` checks
(`/root/reference/src/core/localmapping.cpp:363`: parallax, positive depth,
reprojection chi2, scale consistency).

TPU design: instead of per-point 4x4 SVDs, the DLT system is solved as an
inhomogeneous 3x3 least-squares (fix w=1): A[:, :3] X = -A[:, 3], normal
equations inverted in closed form. This is exact for finite points and
maps to fused batched 3x3 ops — no LAPACK calls inside the hot loop.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from vi_slam_tpu.lie.se3 import SE3


def _solve3x3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 solve via adjugate (closed form)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    x = (c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2]) * inv_det
    y = (c10 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2]) * inv_det
    z = (c20 * b[..., 0] + c21 * b[..., 1] + c22 * b[..., 2]) * inv_det
    return jnp.stack([x, y, z], axis=-1)


def triangulate_dlt(
    T1: SE3, T2: SE3, bearing1: jnp.ndarray, bearing2: jnp.ndarray
) -> jnp.ndarray:
    """Triangulate world points from two camera poses and unit-depth
    bearings (normalized camera coords with z=1).

    T1, T2: world->camera SE3 (batched or scalar).
    bearing1/2: (..., 3) with z == 1.
    Returns world points (..., 3).
    """
    # DLT rows: x * P[2] - P[0], y * P[2] - P[1] for each view, P = [R | t]
    def rows(T: SE3, bearing):
        R, t = T.R, T.t
        x = bearing[..., 0:1]
        y = bearing[..., 1:2]
        r0 = x * R[..., 2, :] - R[..., 0, :]
        r1 = y * R[..., 2, :] - R[..., 1, :]
        b0 = -(x[..., 0] * t[..., 2] - t[..., 0])
        b1 = -(y[..., 0] * t[..., 2] - t[..., 1])
        return r0, r1, b0, b1

    a0, a1, c0, c1 = rows(T1, bearing1)
    a2, a3, c2, c3 = rows(T2, bearing2)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)  # (..., 4, 3)
    b = jnp.stack([c0, c1, c2, c3], axis=-1)  # (..., 4)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    Atb = jnp.einsum("...ki,...k->...i", A, b)
    return _solve3x3(AtA, Atb)


def parallax_cos(
    T1: SE3, T2: SE3, xw: jnp.ndarray
) -> jnp.ndarray:
    """Cosine of the ray parallax angle at the triangulated point
    (CreateNewMapPoints: cosParallaxRays)."""
    c1 = T1.inverse().t
    c2 = T2.inverse().t
    r1 = xw - c1
    r2 = xw - c2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)


def depths(T: SE3, xw: jnp.ndarray) -> jnp.ndarray:
    """z-depth of world points in camera frame."""
    return T.apply(xw)[..., 2]
