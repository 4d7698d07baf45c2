"""Bundle adjustment with explicit Schur complement over landmark blocks.

Semantic reference: `Optimizer::LocalBundleAdjustment`
(`/root/reference/src/optimization/optimizer.cpp:1641` — covisible-window
BA with fixed boundary KFs, Huber, chi2 pruning) and `BundleAdjustment`
(:42, global). g2o's sparse block solver + Schur trick is replaced by an
explicit dense reduced camera system, which is exact for the same problem.

TPU design (this is also the unit that shards for distributed GBA,
SURVEY §2.4.3):

  * Observations are grouped per landmark: (M, P) slots with masks.
  * Per-landmark 3x3 blocks H_pp are inverted in closed form.
  * Camera-camera coupling goes through a dense per-landmark scatter
    U[m, k] = sum_p 1[cam(m,p)=k] * W_mp  (einsum over a one-hot), so the
    reduced system S = H_cc - sum_m U H_pp^-1 U^T is a big batched einsum
    that rides the MXU. For the distributed version, the sum over m is a
    `psum` over landmark shards.
  * Fixed cameras are handled by zeroing their rows/cols and pinning the
    diagonal (equality constraint dx = 0).
  * LM iterations run under `lax.scan` with accept/reject on the true
    robust cost.

Capacities (K cameras, M landmarks, P obs/landmark) are static; real
problems are padded into them.
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


class BAProblem(NamedTuple):
    """Static-shape BA problem.

    poses:      SE3 with batch (K,) — world->camera
    fixed:      (K,) bool — cameras held constant
    points:     (M, 3) world points
    point_valid:(M,) bool
    obs_cam:    (M, P) int32 — camera index per observation slot
    obs_uvr:    (M, P, 3) — measured (u, v, u_right)
    obs_stereo: (M, P) bool
    obs_sigma2: (M, P)
    obs_mask:   (M, P) bool
    """

    poses: SE3
    fixed: jnp.ndarray
    points: jnp.ndarray
    point_valid: jnp.ndarray
    obs_cam: jnp.ndarray
    obs_uvr: jnp.ndarray
    obs_stereo: jnp.ndarray
    obs_sigma2: jnp.ndarray
    obs_mask: jnp.ndarray


class BAResult(NamedTuple):
    poses: SE3
    points: jnp.ndarray
    obs_inlier: jnp.ndarray  # (M, P) chi2 gate at the final state
    cost: jnp.ndarray  # robust cost history (iters+1,)


def _residuals(cam: CameraParams, poses: SE3, points: jnp.ndarray, prob: BAProblem):
    """r (M,P,3), J_cam (M,P,3,6), J_pt (M,P,3,3), row_mask (M,P,3)."""
    K = poses.t.shape[0]
    if K <= 64:
        # one-hot matmul instead of a (M,P) gather of 3x3 blocks: the
        # gather costs ~µs-per-offset on TPU and dominates the whole GN
        # iteration; for windowed K the onehot contraction rides the MXU
        oh = jax.nn.one_hot(prob.obs_cam, K, dtype=points.dtype)  # (M,P,K)
        Rk = jnp.einsum("mpk,kij->mpij", oh, poses.R)
        tk = jnp.einsum("mpk,ki->mpi", oh, poses.t)
    else:
        Rk = poses.R[prob.obs_cam]  # (M,P,3,3)
        tk = poses.t[prob.obs_cam]  # (M,P,3)
    pc = jnp.einsum("mpij,mj->mpi", Rk, points) + tk
    pred = camlib.stereo_project(cam, pc)
    r = pred - prob.obs_uvr
    Jpc = camlib.stereo_project_jac(cam, pc)  # (M,P,3,3)
    I = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (*pc.shape[:-1], 3, 3))
    Jxi = jnp.concatenate([I, -so3.hat(pc)], axis=-1)  # (M,P,3,6)
    J_cam = Jpc @ Jxi
    J_pt = Jpc @ Rk
    base = prob.obs_mask & prob.point_valid[:, None]
    behind = pc[..., 2] < 0.05
    base = base & ~behind
    row_mask = jnp.stack(
        [base, base, base & prob.obs_stereo], axis=-1
    ).astype(r.dtype)
    return r, J_cam, J_pt, row_mask


def _robust_cost_and_weights(r, row_mask, prob: BAProblem, use_huber: bool):
    chi2 = jnp.sum(r * r * row_mask, axis=-1) / prob.obs_sigma2
    delta2 = jnp.where(prob.obs_stereo, robust.CHI2_STEREO, robust.CHI2_MONO)
    if use_huber:
        w = robust.huber_weight(chi2 / delta2, 1.0) / prob.obs_sigma2
        cost = jnp.sum(robust.huber_rho(chi2 / delta2, 1.0) * delta2
                       * (row_mask[..., 0] > 0))
    else:
        w = 1.0 / prob.obs_sigma2
        cost = jnp.sum(chi2 * (row_mask[..., 0] > 0))
    return chi2, w, cost



def _visual_reduced_system(
    cam: CameraParams,
    poses: SE3,
    points: jnp.ndarray,
    prob: BAProblem,
    lam: jnp.ndarray,
    use_huber: bool,
):
    """Schur-reduce the landmark blocks of the visual problem.

    Returns (S (K,K,6,6) reduced camera system incl. H_cc diagonal,
    b (K,6) reduced gradient, U (M,K,6,3), Hpp_inv (M,3,3), bp (M,3)) —
    the pieces needed for the camera solve and landmark back-substitution.
    Shared by visual-only BA, sharded GBA, and visual-inertial BA (which
    embeds S into wider state blocks).
    """
    K = poses.t.shape[0]
    r, J_cam, J_pt, row_mask = _residuals(cam, poses, points, prob)
    chi2, w, _ = _robust_cost_and_weights(r, row_mask, prob, use_huber)

    Jc = J_cam * row_mask[..., None]
    Jp = J_pt * row_mask[..., None]
    rm = r * row_mask

    # landmark blocks
    Hpp = jnp.einsum("mpki,mpkj,mp->mij", Jp, Jp, w)  # (M,3,3)
    bp = jnp.einsum("mpki,mpk,mp->mi", Jp, rm, w)  # (M,3)
    # per-observation camera-point coupling W = Jc^T Jp (6,3)
    Wcp = jnp.einsum("mpki,mpkj,mp->mpij", Jc, Jp, w)  # (M,P,6,3)
    # camera blocks (diagonal of H_cc)
    Hcc_obs = jnp.einsum("mpki,mpkj,mp->mpij", Jc, Jc, w)  # (M,P,6,6)
    bc_obs = jnp.einsum("mpki,mpk,mp->mpi", Jc, rm, w)  # (M,P,6)

    onehot = jax.nn.one_hot(prob.obs_cam, K, dtype=r.dtype)  # (M,P,K)
    Hcc_diag = jnp.einsum("mpk,mpij->kij", onehot, Hcc_obs)  # (K,6,6)
    bc = jnp.einsum("mpk,mpi->ki", onehot, bc_obs)  # (K,6)
    U = jnp.einsum("mpk,mpij->mkij", onehot, Wcp)  # (M,K,6,3)

    # damp and invert landmark blocks
    lamI3 = lam[..., None, None] * jnp.eye(3, dtype=r.dtype)
    Hpp_d = Hpp + lamI3 + 1e-9 * jnp.eye(3, dtype=r.dtype)
    Hpp_inv = jnp.linalg.inv(Hpp_d)
    # guard landmarks with no observations
    has_obs = jnp.sum(row_mask[..., 0], axis=1) > 0
    Hpp_inv = jnp.where(has_obs[:, None, None], Hpp_inv, 0.0)

    Y = jnp.einsum("mkis,msj->mkij", U, Hpp_inv)  # (M,K,6,3)
    S_red = jnp.einsum("mkis,mljs->klij", Y, U)  # (K,K,6,6)
    b_red_corr = jnp.einsum("mkis,ms->ki", Y, bp)  # (K,6)

    S = -S_red
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc_diag)
    b = bc - b_red_corr
    return S, b, U, Hpp_inv, bp


def back_substitute_points(U, Hpp_inv, bp, dxc):
    """Landmark updates given camera updates: dxp = Hpp^-1 (-bp - U^T dxc)."""
    Ut_dxc = jnp.einsum("mkis,ki->ms", U, dxc)  # (M,3)
    dxp = jnp.einsum("mij,mj->mi", Hpp_inv, -bp - Ut_dxc)
    return jnp.where(jnp.isfinite(dxp), dxp, 0.0)


def _visual_reduced_system_scatter(
    cam: CameraParams,
    poses: SE3,
    points: jnp.ndarray,
    prob: BAProblem,
    lam: jnp.ndarray,
    use_huber: bool,
):
    """Schur reduction with scatter-add assembly, for LARGE problems.

    The dense path materializes U = (M, K, 6, 3), which is fine for a
    local window (K<=16) but explodes for full-map BA (K=256, M=65k would
    be >1 GB). Here the camera-camera coupling goes through per-observation
    -pair 6x6 blocks scattered into (K, K, 6, 6) — memory O(K^2 + M*P^2)
    regardless of K*M (GlobalBundleAdjustemnt capability at map scale,
    optimizer.cpp:34). Returns (S, b, Wcp, Hpp_inv, bp, cidx)."""
    K = poses.t.shape[0]
    M, P = prob.obs_cam.shape
    r, J_cam, J_pt, row_mask = _residuals(cam, poses, points, prob)
    _, w, _ = _robust_cost_and_weights(r, row_mask, prob, use_huber)

    Jc = J_cam * row_mask[..., None]
    Jp = J_pt * row_mask[..., None]
    rm = r * row_mask

    Hpp = jnp.einsum("mpki,mpkj,mp->mij", Jp, Jp, w)  # (M,3,3)
    bp = jnp.einsum("mpki,mpk,mp->mi", Jp, rm, w)  # (M,3)
    Wcp = jnp.einsum("mpki,mpkj,mp->mpij", Jc, Jp, w)  # (M,P,6,3)
    Hcc_obs = jnp.einsum("mpki,mpkj,mp->mpij", Jc, Jc, w)  # (M,P,6,6)
    bc_obs = jnp.einsum("mpki,mpk,mp->mpi", Jc, rm, w)  # (M,P,6)

    # masked observations carry all-zero blocks (row_mask pre-multiplied
    # into Jc/Jp), so clipped indices scatter harmlessly
    cidx = jnp.clip(prob.obs_cam, 0, K - 1)
    flat = cidx.reshape(-1)
    Hcc_diag = jnp.zeros((K, 6, 6), r.dtype).at[flat].add(
        Hcc_obs.reshape(-1, 6, 6)
    )
    bc = jnp.zeros((K, 6), r.dtype).at[flat].add(bc_obs.reshape(-1, 6))

    lamI3 = lam[..., None, None] * jnp.eye(3, dtype=r.dtype)
    Hpp_inv = jnp.linalg.inv(Hpp + lamI3 + 1e-9 * jnp.eye(3, dtype=r.dtype))
    has_obs = jnp.sum(row_mask[..., 0], axis=1) > 0
    Hpp_inv = jnp.where(has_obs[:, None, None], Hpp_inv, 0.0)

    Y = jnp.einsum("mpis,mst->mpit", Wcp, Hpp_inv)  # (M,P,6,3)
    S_red = jnp.zeros((K, K, 6, 6), r.dtype)
    for p in range(P):  # static P*P unrolled scatter-adds of (M,6,6) blocks
        for q in range(P):
            blk = jnp.einsum("mis,mjs->mij", Y[:, p], Wcp[:, q])
            S_red = S_red.at[cidx[:, p], cidx[:, q]].add(blk)
    b_corr = jnp.zeros((K, 6), r.dtype)
    for p in range(P):
        b_corr = b_corr.at[cidx[:, p]].add(
            jnp.einsum("mis,ms->mi", Y[:, p], bp)
        )

    S = -S_red
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc_diag)
    b = bc - b_corr
    return S, b, Wcp, Hpp_inv, bp, cidx


def back_substitute_points_scatter(Wcp, Hpp_inv, bp, dxc, cidx):
    """Landmark back-substitution without materializing U: gather each
    observation's camera update and contract per landmark."""
    dxc_g = dxc[cidx]  # (M,P,6)
    Ut_dxc = jnp.einsum("mpis,mpi->ms", Wcp, dxc_g)  # (M,3)
    dxp = jnp.einsum("mij,mj->mi", Hpp_inv, -bp - Ut_dxc)
    return jnp.where(jnp.isfinite(dxp), dxp, 0.0)


def _build_and_solve(
    cam: CameraParams,
    poses: SE3,
    points: jnp.ndarray,
    prob: BAProblem,
    lam: jnp.ndarray,
    use_huber: bool,
    axis_name=None,
    assembly: str = "dense",
):
    """One LM system build + Schur solve. Returns (dxc (K,6), dxp (M,3)).

    With `axis_name`, the landmark axis is sharded across a device mesh:
    each device reduces its own landmarks and the camera system is summed
    with `psum` over the interconnect (the distributed-GBA core,
    SURVEY §2.4.3). The reduced solve is replicated on every device.

    assembly="dense" materializes the (M,K,6,3) coupling (fast for local
    windows); "scatter" assembles via per-observation scatter-adds
    (required for full-map K).
    """
    K = poses.t.shape[0]
    if assembly == "scatter":
        S, b, Wcp, Hpp_inv, bp, cidx = _visual_reduced_system_scatter(
            cam, poses, points, prob, lam, use_huber
        )
    else:
        S, b, U, Hpp_inv, bp = _visual_reduced_system(
            cam, poses, points, prob, lam, use_huber
        )
    if axis_name is not None:
        S = jax.lax.psum(S, axis_name)
        b = jax.lax.psum(b, axis_name)
    r_dtype = S.dtype

    # damping on camera blocks
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        lam[..., None, None] * jnp.eye(6, dtype=r_dtype)
    )

    # fixed cameras: zero rows/cols, identity diagonal, zero rhs
    free = (~prob.fixed).astype(r_dtype)
    S = S * free[:, None, None, None] * free[None, :, None, None]
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        (1.0 - free)[:, None, None] * jnp.eye(6, dtype=r_dtype)
    )
    b = b * free[:, None]

    S_dense = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    b_dense = b.reshape(K * 6)
    dxc = -jnp.linalg.solve(S_dense, b_dense).reshape(K, 6)
    dxc = jnp.where(jnp.isfinite(dxc), dxc, 0.0)

    if assembly == "scatter":
        dxp = back_substitute_points_scatter(Wcp, Hpp_inv, bp, dxc, cidx)
    else:
        dxp = back_substitute_points(U, Hpp_inv, bp, dxc)
    return dxc, dxp


def _ba_core(
    cam: CameraParams,
    prob: BAProblem,
    iters: int,
    use_huber: bool,
    lam0: float,
    axis_name=None,
    assembly: str = "dense",
    strategy: str = "lm",
) -> BAResult:
    """Shared LM loop for single-chip and sharded BA."""

    def cost_at(poses, points):
        r, _, _, row_mask = _residuals(cam, poses, points, prob)
        _, _, c = _robust_cost_and_weights(r, row_mask, prob, use_huber)
        if axis_name is not None:
            c = jax.lax.psum(c, axis_name)
        return c

    def lm_step(carry, _):
        poses, points, lam, cost = carry
        dxc, dxp = _build_and_solve(
            cam, poses, points, prob, lam, use_huber, axis_name, assembly
        )
        cand_poses = se3.retract_left(poses, dxc)
        cand_points = points + dxp
        cand_cost = cost_at(cand_poses, cand_points)
        accept = cand_cost < cost
        new_poses = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), cand_poses, poses
        )
        new_points = jnp.where(accept, cand_points, points)
        new_lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        new_lam = jnp.clip(new_lam, 1e-9, 1e4)
        new_cost = jnp.where(accept, cand_cost, cost)
        return (SE3(new_poses.R, new_poses.t), new_points, new_lam, new_cost), new_cost

    def gn_step(carry, _):
        # damped GN without the accept/reject cost pass: half the
        # residual evaluations per iteration. Safe for the warm-started
        # windowed local BA (the per-frame tracking pose is already
        # near-optimal); global/loop BA keeps full LM.
        poses, points, lam, cost = carry
        dxc, dxp = _build_and_solve(
            cam, poses, points, prob, lam, use_huber, axis_name, assembly
        )
        poses = se3.retract_left(poses, dxc)
        points = points + dxp
        return (SE3(poses.R, poses.t), points, lam, cost), cost

    lam = jnp.asarray(lam0, dtype=prob.points.dtype)
    if strategy == "gn":
        init_cost = jnp.zeros((), prob.points.dtype)
        lam = jnp.asarray(max(lam0, 1e-3), dtype=prob.points.dtype)
        (poses, points, _, _), costs = jax.lax.scan(
            gn_step, (prob.poses, prob.points, lam, init_cost), None,
            length=iters,
        )
    else:
        init_cost = cost_at(prob.poses, prob.points)
        (poses, points, _, _), costs = jax.lax.scan(
            lm_step, (prob.poses, prob.points, lam, init_cost), None,
            length=iters,
        )
    poses = poses.normalize()

    # final chi2 gate (the reference prunes obs with chi2 > th after LBA)
    r, _, _, row_mask = _residuals(cam, poses, points, prob)
    chi2 = jnp.sum(r * r * row_mask, axis=-1) / prob.obs_sigma2
    th = jnp.where(prob.obs_stereo, robust.CHI2_STEREO, robust.CHI2_MONO)
    inlier = (chi2 <= th) & (row_mask[..., 0] > 0)
    return BAResult(
        poses=poses,
        points=points,
        obs_inlier=inlier,
        cost=jnp.concatenate([init_cost[None], costs]),
    )


@partial(jax.jit, static_argnames=("iters", "use_huber", "assembly"))
@precise
def bundle_adjust(
    cam: CameraParams,
    prob: BAProblem,
    iters: int = 10,
    use_huber: bool = True,
    lam0: float = 1e-4,
    assembly: str = "dense",
) -> BAResult:
    """LM bundle adjustment. Poses and points move; fixed/invalid masked.

    Use assembly="scatter" for full-map problems (large K)."""
    return _ba_core(
        cam, prob, iters, use_huber, lam0, axis_name=None, assembly=assembly
    )
