"""Relative Sim3 refinement between two keyframes from matched points.

Semantic reference: `Optimizer::OptimizeSim3`
(`/root/reference/src/optimization/optimizer.cpp:3466` — g2o over one
`VertexSim3Expmap` with paired `EdgeSim3ProjectXYZ` /
`EdgeInverseSim3ProjectXYZ` edges (optimizetypes.h:160/:181), Huber
delta^2 = 10, inlier pruning after 5 iterations, then 10 more).

TPU design: one jitted GN program. Both edge directions for all matches
are evaluated batched; the 7x7 (or 6x7 masked for fixed scale) normal
system is built by reduction. Outlier pruning = chi2 mask refresh between
two GN phases, matching the reference's two-stage schedule.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.cameras import dispatch as camlib
from vi_slam_tpu.lie import sim3 as sim3_m
from vi_slam_tpu.lie.sim3 import Sim3
from vi_slam_tpu.utils.precision import precise


class Sim3OptResult(NamedTuple):
    S12: Sim3
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray


def _residuals(
    cam1: CameraParams,
    cam2: CameraParams,
    S12: Sim3,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward and inverse reprojection residuals, each (N, 2)."""
    r1 = camlib.project(cam1, S12.apply(x2)) - uv1
    r2 = camlib.project(cam2, S12.inverse().apply(x1)) - uv2
    return r1, r2


@partial(jax.jit, static_argnames=("iters1", "iters2", "fix_scale"))
@precise
def optimize_sim3(
    cam1: CameraParams,
    cam2: CameraParams,
    S12_init: Sim3,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    valid: jnp.ndarray,
    sigma2_1: jnp.ndarray,
    sigma2_2: jnp.ndarray,
    iters1: int = 5,
    iters2: int = 10,
    fix_scale: bool = False,
) -> Sim3OptResult:
    """GN refinement of S12 (frame2-cam -> frame1-cam).

    x1/x2: (N,3) matched map points in each KF's camera frame; uv1/uv2
    their pixel observations; chi2 gate 9.815... reference uses th2 = 10
    (Huber delta^2) and chi2 > 10 for pruning (optimizer.cpp:3620).
    """
    th2 = 10.0
    dtype = x1.dtype
    N = x1.shape[0]

    def tangent_apply(xi, S: Sim3) -> Sim3:
        dS = sim3_m.exp(xi)
        return dS.compose(S)

    def _cheirality(S: Sim3) -> jnp.ndarray:
        """Points must be in front of both cameras (EdgeSim3ProjectXYZ
        implicitly relies on positive depth)."""
        z1 = S.apply(x2)[..., 2]
        z2 = S.inverse().apply(x1)[..., 2]
        return (z1 > 0.1) & (z2 > 0.1)

    def gn_step(S: Sim3, mask: jnp.ndarray) -> Sim3:
        zero = jnp.zeros((7,), dtype)
        # robust (Huber, delta^2 = th2) + cheirality weights at linearization
        r1_0, r2_0 = _residuals(cam1, cam2, S, x1, x2, uv1, uv2)
        chei = _cheirality(S).astype(dtype)
        c1 = jnp.sum(r1_0 * r1_0, axis=-1) / jnp.maximum(sigma2_1, 1e-9)
        c2 = jnp.sum(r2_0 * r2_0, axis=-1) / jnp.maximum(sigma2_2, 1e-9)
        h1 = jnp.minimum(1.0, jnp.sqrt(th2 / jnp.maximum(c1, 1e-12)))
        h2 = jnp.minimum(1.0, jnp.sqrt(th2 / jnp.maximum(c2, 1e-12)))
        w1 = mask * chei * h1 / jnp.maximum(sigma2_1, 1e-9)
        w2 = mask * chei * h2 / jnp.maximum(sigma2_2, 1e-9)

        def flat_res(xi):
            Sc = tangent_apply(xi, S)
            r1, r2 = _residuals(cam1, cam2, Sc, x1, x2, uv1, uv2)
            rw = jnp.concatenate(
                [r1 * jnp.sqrt(w1)[:, None], r2 * jnp.sqrt(w2)[:, None]], axis=0
            )
            return rw.reshape(-1)

        J = jax.jacfwd(flat_res)(zero)  # (4N, 7)
        r = flat_res(zero)
        H = J.T @ J
        b = -J.T @ r
        if fix_scale:
            # zero out the scale dof (last tangent coordinate)
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            b = b.at[6].set(0.0)
        H = H + 1e-6 * jnp.eye(7, dtype=dtype)
        xi = jnp.linalg.solve(H, b)
        return tangent_apply(xi, S)

    def chi2_mask(S: Sim3) -> jnp.ndarray:
        r1, r2 = _residuals(cam1, cam2, S, x1, x2, uv1, uv2)
        c1 = jnp.sum(r1 * r1, axis=-1) / jnp.maximum(sigma2_1, 1e-9)
        c2 = jnp.sum(r2 * r2, axis=-1) / jnp.maximum(sigma2_2, 1e-9)
        return valid & (c1 < th2) & (c2 < th2)

    S = S12_init
    mask = valid.astype(dtype)
    for _ in range(iters1):
        S = gn_step(S, mask)
    inl = chi2_mask(S)
    mask = inl.astype(dtype)
    for _ in range(iters2):
        S = gn_step(S, mask)
    inl = chi2_mask(S)
    return Sim3OptResult(S12=S, inliers=inl, n_inliers=jnp.sum(inl))
