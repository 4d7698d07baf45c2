"""Essential-graph (pose-graph) optimization over Sim3 / SE3 / 4DoF.

Semantic reference: `Optimizer::OptimizeEssentialGraph`
(`/root/reference/src/optimization/optimizer.cpp:2122` — g2o LM over
`VertexSim3Expmap` per KF; edges = loop edges + spanning tree +
covisibility >= 100; 7DoF fixes mono scale drift), the 6DoF variant
:2433 (map merge) and `OptimizeEssentialGraph4DoF` :7521 (gravity-aligned
yaw+translation for inertial maps).

TPU design: one jitted GN program over batched edge residuals
r_e = log(S_meas_ji o S_iw o S_jw^-1) with autodiff Jacobians wrt
*right* perturbations S_iw <- S_iw o exp(xi) (world-frame updates, which
makes the 4DoF yaw lock a plain tangent-dof mask). The sparse normal
system is assembled by scatter-add of per-edge 14x14 blocks into a dense
(7K, 7K) matrix and solved by Cholesky — for the reference's scale
(hundreds of KFs) the dense solve is MXU-friendly and far below HBM
limits; the distributed GBA path covers larger problems.

DoF modes: "sim3" (7), "se3" (scale locked), "4dof" (yaw+translation).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vi_slam_tpu.lie import sim3 as sim3_m
from vi_slam_tpu.lie.sim3 import Sim3
from vi_slam_tpu.utils.precision import precise

_DOF_MASKS = {
    # tangent layout [rho(3), phi(3), sigma]
    "sim3": (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0),
    "se3": (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0),
    "4dof": (1.0, 1.0, 1.0, 0.0, 0.0, 1.0, 0.0),
}


class PoseGraphResult(NamedTuple):
    poses: Sim3  # optimized S_iw, batched (K,...)
    final_cost: jnp.ndarray


def _edge_residual(
    Si: Sim3, Sj: Sim3, Smeas: Sim3, xi_i: jnp.ndarray, xi_j: jnp.ndarray
) -> jnp.ndarray:
    """r = log(S_meas_ji o S_iw' o S_jw'^-1), right-perturbed vertices."""
    Si_p = Si.compose(sim3_m.exp(xi_i))
    Sj_p = Sj.compose(sim3_m.exp(xi_j))
    return sim3_m.log(Smeas.compose(Si_p.compose(Sj_p.inverse())))


@partial(jax.jit, static_argnames=("iters", "mode"))
@precise
def optimize_pose_graph(
    poses: Sim3,
    edges_ij: jnp.ndarray,
    meas: Sim3,
    edge_valid: jnp.ndarray,
    edge_weight: jnp.ndarray,
    fixed: jnp.ndarray,
    iters: int = 20,
    mode: str = "sim3",
    yaw_axis: jnp.ndarray = None,
) -> PoseGraphResult:
    """Optimize keyframe poses S_iw over relative-pose constraints.

    poses: batched Sim3 (K,...) world->KF.
    edges_ij: (E, 2) int32 vertex ids (i, j); meas: batched Sim3 (E,...)
        measurement S_ji (maps KF-i coords to KF-j coords composed with
        world: S_ji = S_jw o S_iw^-1 at the constraint's configuration).
    edge_valid: (E,) bool; edge_weight: (E,) float (reference uses 1.0).
    fixed: (K,) bool — anchored vertices (the loop KF / origin).
    yaw_axis: optional (3,) world-frame gravity direction for "4dof" —
        rotation updates are projected onto this axis (the reference's
        gravity-aligned graph assumes gravity == z; this engine keeps
        gravity a free world vector, so the yaw projection must follow
        it). Without it "4dof" locks rotation to the world z axis.
    """
    dof = jnp.asarray(_DOF_MASKS[mode], poses.t.dtype)
    K = poses.t.shape[0]
    E = edges_ij.shape[0]
    dtype = poses.t.dtype
    n = 7 * K

    ii = jnp.clip(edges_ij[:, 0], 0, K - 1)
    jj = jnp.clip(edges_ij[:, 1], 0, K - 1)

    def per_edge_jac(Si: Sim3, Sj: Sim3, Sm: Sim3):
        zero = jnp.zeros((7,), dtype)

        def f(xi_i, xi_j):
            return _edge_residual(Si, Sj, Sm, xi_i, xi_j)

        Jii = jax.jacfwd(f, argnums=0)(zero, zero)  # (7,7)
        Jjj = jax.jacfwd(f, argnums=1)(zero, zero)
        r = f(zero, zero)
        return r, Jii, Jjj

    # Per-vertex 7x7 tangent projection (replaces the plain diagonal
    # mask): for gravity-referenced "4dof" the phi block projects onto
    # the yaw axis (g g^T); diagonal modes are the special case of a
    # diagonal projection. Fixed vertices project to zero.
    P7 = jnp.diag(dof)
    if mode == "4dof" and yaw_axis is not None:
        g = yaw_axis.astype(dtype)
        g = g / jnp.maximum(jnp.linalg.norm(g), 1e-9)
        P7 = P7.at[3:6, 3:6].set(jnp.outer(g, g))
    Pk = jnp.where(fixed[:, None, None], 0.0, P7[None])  # (K,7,7)
    kidx = (
        jnp.arange(K, dtype=jnp.int32)[:, None] * 7
        + jnp.arange(7, dtype=jnp.int32)[None, :]
    )  # (K,7)

    def apply_P_vec(v):
        return jnp.einsum("kij,kj->ki", Pk, v.reshape(K, 7)).reshape(-1)

    def gn_iter(poses: Sim3, _):
        Si = Sim3(poses.R[ii], poses.t[ii], poses.s[ii])
        Sj = Sim3(poses.R[jj], poses.t[jj], poses.s[jj])
        r, Jii, Jjj = jax.vmap(per_edge_jac)(Si, Sj, meas)
        w = (edge_valid.astype(dtype) * edge_weight)[:, None]
        rw = r * w
        J = jnp.concatenate([Jii, Jjj], axis=-1)  # (E,7,14)
        Jw = J * w[..., None]
        Hblk = jnp.einsum("eri,erj->eij", Jw, J)  # (E,14,14)
        bblk = -jnp.einsum("eri,er->ei", Jw, r)  # (E,14)
        gidx = jnp.concatenate(
            [
                ii[:, None] * 7 + jnp.arange(7, dtype=ii.dtype)[None, :],
                jj[:, None] * 7 + jnp.arange(7, dtype=jj.dtype)[None, :],
            ],
            axis=-1,
        )  # (E,14)
        H = jnp.zeros((n, n), dtype).at[gidx[:, :, None], gidx[:, None, :]].add(
            Hblk
        )
        b = jnp.zeros((n,), dtype).at[gidx].add(bblk)
        # constrain to the projected tangent subspace: H <- P H P with
        # identity on the complementary (locked) subspace so Cholesky
        # stays PD and locked dofs solve to exactly zero
        H = jnp.einsum("kij,kjN->kiN", Pk, H.reshape(K, 7, n)).reshape(n, n)
        Ht = H.reshape(n, K, 7)
        H = jnp.einsum("Nkj,kij->Nki", Ht, Pk).reshape(n, n)
        eye7 = jnp.eye(7, dtype=dtype)
        H = H.at[kidx[:, :, None], kidx[:, None, :]].add(eye7[None] - Pk)
        H = H + 1e-6 * jnp.eye(n, dtype=dtype)
        b = apply_P_vec(b)
        dx = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(H, lower=True), b
        )
        xi = apply_P_vec(dx).reshape(K, 7).astype(dtype)
        dS = sim3_m.exp(xi)
        new = poses.compose(dS)  # right perturbation, batched
        cost = jnp.sum(rw * rw)
        return new, cost

    def body(carry, _):
        poses, _ = carry
        new, cost = gn_iter(poses, None)
        return (new, cost), None

    (poses_out, cost), _ = jax.lax.scan(
        body, (poses, jnp.zeros((), dtype)), None, length=iters
    )
    return PoseGraphResult(poses=poses_out, final_cost=cost)


def build_essential_edges(
    covis: jnp.ndarray,
    parent: jnp.ndarray,
    loop_edges: jnp.ndarray,
    kf_valid: jnp.ndarray,
    min_weight: int = 100,
    max_edges: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Select the essential-graph edge set (optimizer.cpp:2122 semantics):
    spanning-tree edges (parent links), loop edges, and covisibility edges
    with weight >= min_weight. Host-side helper returning fixed-capacity
    (max_edges, 2) int32 + valid mask + weights.

    covis: (K, K) shared-point counts; parent: (K,) spanning-tree parent
    (-1 = root); loop_edges: (L, 2) int32 (may be empty).
    """
    import numpy as np

    covis = np.asarray(covis)
    parent = np.asarray(parent)
    kf_valid = np.asarray(kf_valid)
    K = covis.shape[0]
    pairs = set()
    for k in range(K):
        if not kf_valid[k]:
            continue
        p = parent[k]
        if p >= 0 and kf_valid[p]:
            pairs.add((min(k, int(p)), max(k, int(p))))
    iu, ju = np.where(np.triu(covis, 1) >= min_weight)
    for a, b in zip(iu, ju):
        if kf_valid[a] and kf_valid[b]:
            pairs.add((int(a), int(b)))
    for a, b in np.asarray(loop_edges).reshape(-1, 2):
        pairs.add((min(int(a), int(b)), max(int(a), int(b))))
    pairs = sorted(pairs)[:max_edges]
    E = len(pairs)
    edges = np.zeros((max_edges, 2), np.int32)
    valid = np.zeros((max_edges,), bool)
    if E:
        edges[:E] = np.asarray(pairs, np.int32)
        valid[:E] = True
    weights = np.ones((max_edges,), np.float32)
    return jnp.asarray(edges), jnp.asarray(valid), jnp.asarray(weights)
