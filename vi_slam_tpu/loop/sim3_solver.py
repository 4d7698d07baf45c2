"""Sim3/SE3 estimation between matched 3D point sets: Horn closed form +
batched RANSAC.

Semantic reference: `Sim3Solver`
(`/root/reference/src/optimization/sim3solver.cpp` — `ComputeSim3`
sim3solver.h:51: Horn 1987 closed-form absolute orientation via the 4x4
quaternion eigenproblem; `CheckInliers`: reprojection gating in both
cameras; RANSAC loop `iterate`).

TPU redesign: all RANSAC hypotheses are solved in one batched program —
`vmap` over (H, 3) sampled triples, closed-form Horn per hypothesis
(3x3 SVD instead of the quaternion eigenproblem — same optimum), then a
(H, N) inlier matrix from two batched reprojections. argmax inliers, one
refit on the winner's inliers. No sequential hypothesis loop.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.cameras import dispatch as camlib
from vi_slam_tpu.lie.sim3 import Sim3


class Sim3RansacResult(NamedTuple):
    S12: Sim3  # maps frame-2 camera coords to frame-1 camera coords
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # () int32


def horn_sim3(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    w: jnp.ndarray,
    fix_scale: bool = False,
) -> Sim3:
    """Weighted closed-form similarity S12 minimizing ||x1 - S12(x2)||^2.

    x1, x2: (N, 3); w: (N,) non-negative weights (0 = ignore).
    Horn's method with SVD rotation (sim3solver.cpp ComputeSim3 semantics;
    scale via the symmetric form s = sqrt(var1/var2), fixed to 1 for
    stereo/RGBD — sim3solver.h mbFixScale).
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c1 = jnp.sum(w[:, None] * x1, axis=0) / wsum
    c2 = jnp.sum(w[:, None] * x2, axis=0) / wsum
    d1 = x1 - c1
    d2 = x2 - c2
    # cross-covariance (3,3): sum w * d1 d2^T
    M = jnp.einsum("n,ni,nj->ij", w, d1, d2)
    U, _s, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], M.dtype)).at[2, 2].set(det)
    R = U @ D @ Vt
    var1 = jnp.sum(w[:, None] * d1 * d1) / wsum
    var2 = jnp.sum(w[:, None] * d2 * d2) / wsum
    s = jnp.sqrt(jnp.maximum(var1, 1e-12) / jnp.maximum(var2, 1e-12))
    s = jnp.where(fix_scale, jnp.ones_like(s), s)
    t = c1 - s * (R @ c2)
    return Sim3(R=R, t=t, s=s)


def _reproj_sq_err(
    cam: CameraParams, x_cam: jnp.ndarray, uv: jnp.ndarray
) -> jnp.ndarray:
    """Squared pixel error of camera-frame points vs measurements (N,2)."""
    pred = camlib.project(cam, x_cam)
    behind = x_cam[..., 2] <= 0.1
    err = jnp.sum((pred - uv) ** 2, axis=-1)
    return jnp.where(behind, 1e12, err)


@partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def sim3_ransac(
    cam1: CameraParams,
    cam2: CameraParams,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    valid: jnp.ndarray,
    sigma2_1: jnp.ndarray,
    sigma2_2: jnp.ndarray,
    key: jax.Array,
    n_hyp: int = 128,
    fix_scale: bool = False,
) -> Sim3RansacResult:
    """Batched Sim3 RANSAC between matched point sets.

    x1/x2: (N,3) matched points in the two KFs' *camera* frames;
    uv1/uv2: (N,2) their pixel measurements; sigma2_*: per-point pyramid
    variance (CheckInliers thresholds 9.210 * sigma2, sim3solver.cpp).
    Returns the best hypothesis refit on its inliers.
    """
    N = x1.shape[0]
    w_valid = valid.astype(x1.dtype)

    # sample (H, 3) triples; collisions are harmless (degenerate hypotheses
    # produce few inliers and lose the argmax)
    probs = w_valid / jnp.maximum(jnp.sum(w_valid), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hyp, 3), replace=True, p=probs)

    def solve_one(tri):
        w = jnp.zeros((N,), x1.dtype).at[tri].set(1.0) * w_valid
        return horn_sim3(x1, x2, w, fix_scale=fix_scale)

    S = jax.vmap(solve_one)(idx)  # batched Sim3 (H,...)

    def count_inliers(Sh: Sim3):
        x2_in_1 = Sh.apply(x2)
        S_inv = Sh.inverse()
        x1_in_2 = S_inv.apply(x1)
        e1 = _reproj_sq_err(cam1, x2_in_1, uv1)
        e2 = _reproj_sq_err(cam2, x1_in_2, uv2)
        inl = valid & (e1 < 9.210 * sigma2_1) & (e2 < 9.210 * sigma2_2)
        return inl

    inl = jax.vmap(count_inliers)(S)  # (H, N)
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    Sb = Sim3(R=S.R[best], t=S.t[best], s=S.s[best])
    best_inl = inl[best]
    # refit on inliers
    S_ref = horn_sim3(x1, x2, best_inl.astype(x1.dtype), fix_scale=fix_scale)
    inl_ref = count_inliers(S_ref)
    better = jnp.sum(inl_ref) >= jnp.sum(best_inl)
    S_out = Sim3(
        R=jnp.where(better, S_ref.R, Sb.R),
        t=jnp.where(better, S_ref.t, Sb.t),
        s=jnp.where(better, S_ref.s, Sb.s),
    )
    inl_out = jnp.where(better, inl_ref, best_inl)
    return Sim3RansacResult(S12=S_out, inliers=inl_out, n_inliers=jnp.sum(inl_out))
