"""Epipolar geometry: fundamental/essential matrices, epipolar distances.

Semantic reference: `/root/reference/src/geometry/epipolar_geometry.cpp`
(E/F estimation wrappers, triangulation error checks) and the F12 epipolar
constraint check in `FMatcher::SearchForTriangulation`
(`/root/reference/src/geometry/fmatcher.cpp:1242` — point-to-epiline
distance threshold scaled by pyramid sigma).
"""

from __future__ import annotations

import jax.numpy as jnp

from vi_slam_tpu.lie import so3
from vi_slam_tpu.lie.se3 import SE3


def essential_from_relative(T12: SE3) -> jnp.ndarray:
    """E = [t]_x R for the relative transform taking frame-2 coords to
    frame-1 coords (x1 ~ R x2 + t)."""
    return so3.hat(T12.t) @ T12.R


def fundamental_from_poses(
    T1w: SE3, T2w: SE3, K1: jnp.ndarray, K2: jnp.ndarray
) -> jnp.ndarray:
    """F12 such that x1^T F12 x2 = 0 for pixel correspondences
    (the ComputeF12 helper in the reference's LocalMapping)."""
    T12 = T1w.compose(T2w.inverse())
    E = essential_from_relative(T12)
    K1inv = jnp.linalg.inv(K1)
    K2inv = jnp.linalg.inv(K2)
    return K1inv.T @ E @ K2inv


def epiline_distance_sq(
    F12: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray
) -> jnp.ndarray:
    """Squared distance from x1 to the epipolar line of x2 (broadcasted
    pairwise if uv1 is (N,1,2) and uv2 is (1,M,2)).

    Mirrors CheckDistEpipolarLine (fmatcher.cpp) which tests
    dist^2 < 3.84 * sigma2(level of kp1)."""
    ones1 = jnp.ones_like(uv1[..., :1])
    ones2 = jnp.ones_like(uv2[..., :1])
    x1 = jnp.concatenate([uv1, ones1], axis=-1)
    x2 = jnp.concatenate([uv2, ones2], axis=-1)
    line = jnp.einsum("ij,...j->...i", F12, x2)  # epiline of x2 in image 1
    num = jnp.sum(x1 * line, axis=-1) ** 2
    den = line[..., 0] ** 2 + line[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def sampson_distance_sq(
    F: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray
) -> jnp.ndarray:
    """First-order geometric (Sampson) error for F scoring."""
    ones1 = jnp.ones_like(uv1[..., :1])
    ones2 = jnp.ones_like(uv2[..., :1])
    x1 = jnp.concatenate([uv1, ones1], axis=-1)
    x2 = jnp.concatenate([uv2, ones2], axis=-1)
    Fx2 = jnp.einsum("ij,...j->...i", F, x2)
    Ftx1 = jnp.einsum("ji,...j->...i", F, x1)
    num = jnp.sum(x1 * Fx2, axis=-1) ** 2
    den = Fx2[..., 0] ** 2 + Fx2[..., 1] ** 2 + Ftx1[..., 0] ** 2 + Ftx1[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)
