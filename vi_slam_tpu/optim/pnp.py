"""Batched PnP RANSAC for relocalization.

Semantic reference: `MLPnPsolver` / `PnPsolver`
(`/root/reference/src/optimization/mlpnpsolver.cpp` — ML bearing-vector
PnP + RANSAC `iterate` mlpnpsolver.h:28, used by
`Tracking::Relocalization` tracking.cpp:3477; EPnP variant
`pnpsolver.cpp`).

TPU redesign: all RANSAC hypotheses are solved in one vmapped program.
The minimal solver is a 6-point DLT pose (P6P): one 12x12 SVD per
hypothesis — batched on device, no sequential iteration. Inliers are a
(H, N) reprojection matrix; the winner is refit by a short Gauss-Newton
on its inlier set (the reference follows RANSAC with `PoseOptimization`;
callers here do the same with optim/pose_opt.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.cameras import dispatch as camlib
from vi_slam_tpu.lie import so3
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.utils.precision import precise


class PnPResult(NamedTuple):
    T_cw: SE3
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray  # () bool


def _dlt_pose(xw: jnp.ndarray, xn: jnp.ndarray) -> SE3:
    """Pose from >=6 2D-3D correspondences via DLT on P = [R|t].

    xw: (S, 3) world points; xn: (S, 2) normalized image coords.
    Orthonormalizes the rotation block by SVD (projection to SO(3)).
    """
    S = xw.shape[0]
    ones = jnp.ones((S, 1), xw.dtype)
    zeros = jnp.zeros((S, 4), xw.dtype)
    Xh = jnp.concatenate([xw, ones], axis=-1)  # (S, 4)
    r1 = jnp.concatenate([Xh, zeros, -xn[:, 0:1] * Xh], axis=-1)
    r2 = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2S, 12)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    P = Vt[-1].reshape(3, 4)
    Rraw = P[:, :3]
    # fix sign so points land in front (majority depth positive)
    depths = Xh @ P[2]
    sign = jnp.where(jnp.sum(jnp.sign(depths)) >= 0, 1.0, -1.0)
    P = P * sign
    Rraw = P[:, :3]
    U, s, Vt2 = jnp.linalg.svd(Rraw)
    det = jnp.linalg.det(U @ Vt2)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], P.dtype)).at[2, 2].set(det)
    R = U @ D @ Vt2
    scale = jnp.sum(s) / 3.0
    t = P[:, 3] / jnp.maximum(scale, 1e-12)
    return SE3(R, t)


@partial(jax.jit, static_argnames=("n_hyp", "sample_size"))
@precise
def pnp_ransac(
    cam: CameraParams,
    xw: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    sigma2: jnp.ndarray,
    key: jax.Array,
    n_hyp: int = 256,
    sample_size: int = 6,
    chi2_th: float = 5.991,
    min_inliers: int = 12,
) -> PnPResult:
    """Batched P6P RANSAC.

    xw (N,3) world points, uv (N,2) pixel measurements, sigma2 per-point
    pyramid variance (MLPnP RANSAC chi2 gating semantics).
    """
    N = xw.shape[0]
    dtype = xw.dtype
    w = valid.astype(dtype)
    probs = w / jnp.maximum(jnp.sum(w), 1.0)
    idx = jax.random.choice(
        key, N, shape=(n_hyp, sample_size), replace=True, p=probs
    )
    xn = (uv - jnp.asarray([cam.cx, cam.cy], dtype)) / jnp.asarray(
        [cam.fx, cam.fy], dtype
    )

    def solve_one(sample):
        return _dlt_pose(xw[sample], xn[sample])

    T = jax.vmap(solve_one)(idx)

    def count(Th: SE3):
        pc = Th.apply(xw)
        pred = camlib.project(cam, pc)
        e2 = jnp.sum((pred - uv) ** 2, axis=-1) / jnp.maximum(sigma2, 1e-9)
        inl = valid & (pc[..., 2] > 0.05) & (e2 < chi2_th)
        return inl

    inl = jax.vmap(count)(T)
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    T_best = SE3(T.R[best], T.t[best])
    best_inl = inl[best]
    # refit on inliers (weighted DLT over the full inlier set)
    wi = best_inl.astype(dtype)
    # weighted refit: zero-weight rows nullified by scaling the equations
    S = xw.shape[0]
    ones = jnp.ones((S, 1), dtype)
    Xh = jnp.concatenate([xw, ones], axis=-1)
    zeros = jnp.zeros((S, 4), dtype)
    r1 = jnp.concatenate([Xh, zeros, -xn[:, 0:1] * Xh], axis=-1) * wi[:, None]
    r2 = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], axis=-1) * wi[:, None]
    A = jnp.concatenate([r1, r2], axis=0)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    P = Vt[-1].reshape(3, 4)
    depths = Xh @ P[2]
    sign = jnp.where(jnp.sum(jnp.sign(depths) * wi) >= 0, 1.0, -1.0)
    P = P * sign
    U, s, Vt2 = jnp.linalg.svd(P[:, :3])
    det = jnp.linalg.det(U @ Vt2)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], dtype)).at[2, 2].set(det)
    R = U @ D @ Vt2
    t = P[:, 3] / jnp.maximum(jnp.sum(s) / 3.0, 1e-12)
    T_ref = SE3(R, t)
    inl_ref = count(T_ref)
    better = jnp.sum(inl_ref) >= jnp.sum(best_inl)
    T_out = SE3(
        jnp.where(better, T_ref.R, T_best.R),
        jnp.where(better, T_ref.t, T_best.t),
    )
    inl_out = jnp.where(better, inl_ref, best_inl)
    n = jnp.sum(inl_out)
    return PnPResult(
        T_cw=T_out, inliers=inl_out, n_inliers=n, ok=n >= min_inliers
    )
