"""Motion-only pose optimization — the per-frame hot loop.

Semantic reference: `Optimizer::PoseOptimization`
(`/root/reference/src/optimization/optimizer.cpp:819`): g2o GN over a
single SE3 vertex with mono/stereo reprojection edges, 4 rounds x 10
iterations, Huber kernel on the first rounds, chi2 outlier
re-classification between rounds (5.991 mono / 7.815 stereo), outliers
excluded from subsequent rounds but re-tested every round.

TPU design: one jitted program; the graph is a fixed-capacity batch of
observations with masks. Each GN step is a batched Jacobian build + a
6x6 solve — no graph allocation, no per-edge virtual calls.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.cameras import dispatch as camlib
from vi_slam_tpu.lie import se3, so3
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.optim import robust
from vi_slam_tpu.utils.precision import precise


class PoseObs(NamedTuple):
    """Fixed-capacity reprojection observation set for one frame.

    xw:     (N, 3) world points
    uvr:    (N, 3) measured (u, v, u_right); u_right ignored where not stereo
    stereo: (N,)  bool — third residual row active
    sigma2: (N,)  per-obs variance (1.2^(2*level))
    valid:  (N,)  bool
    """

    xw: jnp.ndarray
    uvr: jnp.ndarray
    stereo: jnp.ndarray
    sigma2: jnp.ndarray
    valid: jnp.ndarray


def _residual_jac(cam: CameraParams, T: SE3, obs: PoseObs):
    """Residuals (N,3), Jacobians wrt left-perturbation tangent (N,3,6),
    and per-row masks (N,3)."""
    pc = T.apply(obs.xw)
    pred = camlib.stereo_project(cam, pc)
    r = pred - obs.uvr
    Jpc = camlib.stereo_project_jac(cam, pc)  # (N,3,3)
    # d pc / d xi = [I | -hat(pc)] for T' = exp(xi) T
    I = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (*pc.shape[:-1], 3, 3))
    Jxi = jnp.concatenate([I, -so3.hat(pc)], axis=-1)  # (N,3,6)
    J = Jpc @ Jxi  # (N,3,6)
    row_mask = jnp.stack(
        [obs.valid, obs.valid, obs.valid & obs.stereo], axis=-1
    ).astype(r.dtype)
    behind = pc[..., 2] < 0.05  # points behind/near the camera are invalid
    row_mask = row_mask * (~behind[..., None]).astype(r.dtype)
    return r, J, row_mask


def _chi2(r: jnp.ndarray, row_mask: jnp.ndarray, sigma2: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(r * r * row_mask, axis=-1) / sigma2


@partial(jax.jit, static_argnames=("rounds", "iters", "use_huber_rounds"))
@precise
def pose_optimize(
    cam: CameraParams,
    T_init: SE3,
    obs: PoseObs,
    rounds: int = 4,
    iters: int = 10,
    use_huber_rounds: int = 2,
) -> Tuple[SE3, jnp.ndarray, jnp.ndarray]:
    """Optimize a single camera pose against fixed world points.

    Returns (T_opt, inlier_mask, n_inliers). Mirrors PoseOptimization's
    round structure; inliers are re-classified after every round with the
    per-dof chi2 thresholds.
    """
    chi2_th = jnp.where(obs.stereo, robust.CHI2_STEREO, robust.CHI2_MONO)

    def gn_round(T: SE3, inlier: jnp.ndarray, use_huber: bool):
        def step(i, T: SE3):
            r, J, row_mask = _residual_jac(cam, T, obs)
            row_mask = row_mask * inlier[:, None].astype(r.dtype)
            chi2 = _chi2(r, row_mask, obs.sigma2)
            w = 1.0 / obs.sigma2
            if use_huber:
                delta2 = jnp.where(obs.stereo, robust.CHI2_STEREO, robust.CHI2_MONO)
                w = (1.0 / obs.sigma2) * robust.huber_weight(chi2 / delta2, 1.0)
            Jm = J * row_mask[..., None]
            rm = r * row_mask
            H = jnp.einsum("nki,nkj,n->ij", Jm, Jm, w)
            g = jnp.einsum("nki,nk,n->i", Jm, rm, w)
            damp = 1e-6 * jnp.trace(H) / 6.0 + 1e-9
            dx = -jnp.linalg.solve(H + damp * jnp.eye(6, dtype=H.dtype), g)
            # guard: reject non-finite updates (e.g. no inliers at all)
            dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
            return se3.retract_left(T, dx)

        T = jax.lax.fori_loop(0, iters, step, T)
        # re-classify
        r, J, row_mask = _residual_jac(cam, T, obs)
        chi2 = _chi2(r, row_mask, obs.sigma2)
        new_inlier = obs.valid & (chi2 <= chi2_th) & (row_mask[:, 0] > 0)
        return T, new_inlier

    T = T_init
    inlier = obs.valid
    for rnd in range(rounds):
        T, inlier = gn_round(T, inlier, use_huber=rnd < use_huber_rounds)
    return T, inlier, jnp.sum(inlier)
