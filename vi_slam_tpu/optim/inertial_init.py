"""IMU initialization: solve gravity direction, scale, biases, velocities.

Semantic reference: `Optimizer::InertialOptimization` (4 overloads,
`/root/reference/src/optimization/optimizer.cpp:4697/:4881/:5041/:5201`) as
driven by `LocalMapping::InitializeIMU` (localmapping.cpp:1231): with the
visual poses held fixed, estimate gravity direction Rwg (2 DoF —
`VertexGDir` g2otypes.h:263), log-scale (mono — `VertexScale` :285), shared
gyro/acc biases with priors (priorG/priorA), and per-keyframe velocities,
from the preintegrated IMU chain. The caller then applies
`Map::ApplyScaledRotation` (map.h:152) to re-express the map in the
gravity-aligned frame.

TPU design: one GN problem over a flat parameter vector
[theta_g(2), log_s(1), bg(3), ba(3), vel(K*3)] — tiny — with the full
Jacobian from `jax.jacfwd` of the stacked residual. No graph machinery.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vi_slam_tpu.imu import preintegration as pre
from vi_slam_tpu.lie import so3
from vi_slam_tpu.utils.precision import precise


class InertialInit(NamedTuple):
    Rwg: jnp.ndarray  # (3,3) gravity-aligning rotation: g_world = Rwg @ g0
    scale: jnp.ndarray  # ()
    bg: jnp.ndarray  # (3,)
    ba: jnp.ndarray  # (3,)
    vel: jnp.ndarray  # (K,3)
    cost: jnp.ndarray  # (iters+1,)


@partial(jax.jit, static_argnames=("iters", "optimize_scale"))
@precise
def inertial_init(
    Rwb: jnp.ndarray,  # (K,3,3) body rotations from vision (fixed)
    pwb: jnp.ndarray,  # (K,3) body positions from vision (fixed, unscaled)
    preint: pre.Preintegrated,  # stacked (K-1,) chain
    valid: jnp.ndarray,  # (K-1,) bool
    prior_g: float = 1e2,
    prior_a: float = 1e6,
    iters: int = 20,
    optimize_scale: bool = True,
    gravity_mag: float = pre.GRAVITY,
    Rwg0: Optional[jnp.ndarray] = None,
) -> InertialInit:
    """Estimate (Rwg, s, bg, ba, velocities) against fixed visual poses.

    `Rwg0` seeds the gravity-aligning rotation (the reference seeds it from
    the accumulated velocity-delta direction, localmapping.cpp:1276); the
    2-DoF chart then only has to express a small correction."""
    K = Rwb.shape[0]
    dtype = pwb.dtype
    g0 = jnp.asarray([0.0, 0.0, -gravity_mag], dtype)
    if Rwg0 is None:
        Rwg0 = jnp.eye(3, dtype=dtype)

    # initial velocity guess from position differences
    dt = jnp.maximum(preint.dt, 1e-3)  # (K-1,)
    v_guess = (pwb[1:] - pwb[:-1]) / dt[:, None]
    v0 = jnp.concatenate([v_guess, v_guess[-1:]], axis=0)
    log_s0 = jnp.zeros((), dtype)
    w = valid.astype(dtype)

    if optimize_scale:
        # Closed-form LINEAR seed for (s, g, v): with rotations fixed the
        # preintegration constraints are linear in these unknowns
        # (the classical mono-inertial initialization; the reference's
        # LM solve assumes a scale seed near truth, but a mono map is
        # normalized to median depth 1 and the true factor can be 10-100x
        # — an s=1 seed strands the GN in a local basin):
        #   s (p2 - p1) - v1 dt - 0.5 g dt^2 = R1 dP
        #   v2 - v1 - g dt = R1 dV
        E = K - 1
        n_lin = 4 + 3 * K  # [s | g(3) | v(3K)]
        rows_A, rows_b, rows_w = [], [], []
        r1dP = jnp.einsum("kij,kj->ki", Rwb[:-1], preint.dP)
        r1dV = jnp.einsum("kij,kj->ki", Rwb[:-1], preint.dV)
        I3 = jnp.eye(3, dtype=dtype)
        for k in range(E):
            wk = w[k]
            dtk = dt[k]
            # position rows
            Ap = jnp.zeros((3, n_lin), dtype)
            Ap = Ap.at[:, 0].set(pwb[k + 1] - pwb[k])
            Ap = Ap.at[:, 1:4].set(-0.5 * dtk * dtk * I3)
            Ap = Ap.at[:, 4 + 3 * k : 7 + 3 * k].set(-dtk * I3)
            rows_A.append(Ap * wk)
            rows_b.append(r1dP[k] * wk)
            # velocity rows
            Av = jnp.zeros((3, n_lin), dtype)
            Av = Av.at[:, 1:4].set(-dtk * I3)
            Av = Av.at[:, 4 + 3 * k : 7 + 3 * k].set(-I3)
            Av = Av.at[:, 7 + 3 * k : 10 + 3 * k].set(I3)
            rows_A.append(Av * wk)
            rows_b.append(r1dV[k] * wk)
        A_lin = jnp.concatenate(rows_A, axis=0)
        b_lin = jnp.concatenate(rows_b, axis=0)
        x_lin = jnp.linalg.lstsq(A_lin, b_lin)[0]
        s_lin = x_lin[0]
        g_lin = x_lin[1:4]
        v_lin = x_lin[4:].reshape(K, 3)
        ok_lin = (
            jnp.isfinite(s_lin) & (s_lin > 1e-3) & (s_lin < 1e6)
            & jnp.all(jnp.isfinite(g_lin)) & jnp.all(jnp.isfinite(v_lin))
            & (jnp.linalg.norm(g_lin) > 1e-3)
        )
        log_s0 = jnp.where(ok_lin, jnp.log(jnp.clip(s_lin, 1e-3, 1e6)),
                           log_s0)
        v0 = jnp.where(ok_lin, v_lin, v0)
        # gravity-aligning rotation from the linear gravity direction
        ghat = g_lin / jnp.maximum(jnp.linalg.norm(g_lin), 1e-9)
        g0_hat = jnp.asarray([0.0, 0.0, -1.0], dtype)
        vaxis = jnp.cross(g0_hat, ghat)
        sn = jnp.linalg.norm(vaxis)
        cs = jnp.dot(g0_hat, ghat)
        ang = jnp.arctan2(sn, cs)
        axis = vaxis / jnp.maximum(sn, 1e-9)
        Rwg_lin = jnp.where(
            sn > 1e-6, so3.exp(axis * ang), jnp.eye(3, dtype=dtype)
        )
        Rwg0 = jnp.where(ok_lin, Rwg_lin, Rwg0)

    def unpack(params):
        theta = params[0:2]
        log_s = params[2]
        bg = params[3:6]
        ba = params[6:9]
        vel = params[9:].reshape(K, 3)
        Rwg = Rwg0 @ so3.exp(jnp.concatenate([theta, jnp.zeros((1,), dtype)]))
        s = jnp.exp(log_s) if optimize_scale else jnp.ones((), dtype)
        return Rwg, s, bg, ba, vel

    def residuals(params):
        Rwg, s, bg, ba, vel = unpack(params)
        g_w = Rwg @ g0

        def edge(p9, R1, p1, R2, p2, v1, v2):
            return pre.inertial_residual(
                p9, R1, v1, s * p1, R2, v2, s * p2, bg, ba, g_w
            )

        r = jax.vmap(edge)(
            preint, Rwb[:-1], pwb[:-1], Rwb[1:], pwb[1:], vel[:-1], vel[1:]
        )  # (K-1, 9)
        info = jax.vmap(pre.information)(preint)  # (K-1,9,9)
        # whiten: L^T r with info = L L^T (use cholesky)
        L = jnp.linalg.cholesky(info + 1e-10 * jnp.eye(9, dtype=dtype))
        rw = jnp.einsum("eij,ei->ej", L, r) * w[:, None]
        r_prior = jnp.concatenate([
            jnp.sqrt(jnp.asarray(prior_g, dtype)) * bg,
            jnp.sqrt(jnp.asarray(prior_a, dtype)) * ba,
        ])
        return jnp.concatenate([rw.reshape(-1), r_prior])

    n_params = 9 + 3 * K
    params = (
        jnp.zeros((n_params,), dtype)
        .at[2].set(log_s0)
        .at[9:].set(v0.reshape(-1))
    )

    def gn_step(carry, _):
        params, cost, lam = carry
        r = residuals(params)
        J = jax.jacfwd(residuals)(params)
        # damped least squares on the Jacobian itself (augmented rows)
        # rather than normal equations: the whitened system's conditioning
        # is brutal (information diagonals span 1e2..1e8) and f32 J^T J
        # stalls LM far from the optimum; lstsq works at cond(J) instead
        # of cond(J)^2. The problem is tiny (<=200 x 57), cost is nil.
        col = jnp.linalg.norm(J, axis=0)
        col = jnp.where(col > 1e-12, col, 1.0)
        Js = J / col
        damp = jnp.sqrt(lam) * jnp.eye(n_params, dtype=dtype)
        A = jnp.concatenate([Js, damp], axis=0)
        b = jnp.concatenate([r, jnp.zeros((n_params,), dtype)])
        dx = (-jnp.linalg.lstsq(A, b)[0] / col).astype(dtype)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        cand = params + dx
        cand_cost = jnp.sum(residuals(cand) ** 2)
        accept = cand_cost < cost
        params = jnp.where(accept, cand, params)
        cost = jnp.where(accept, cand_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-10, 1e3)
        return (params, cost, lam), cost

    cost0 = jnp.sum(residuals(params) ** 2)
    lam0 = jnp.asarray(1e-4, dtype)
    (params, _, _), costs = jax.lax.scan(
        gn_step, (params, cost0, lam0), None, length=iters
    )
    Rwg, s, bg, ba, vel = unpack(params)
    return InertialInit(
        Rwg=Rwg, scale=s, bg=bg, ba=ba, vel=vel,
        cost=jnp.concatenate([cost0[None], costs]),
    )


def apply_scaled_rotation(
    Rcw: jnp.ndarray,  # (K,3,3) camera-from-world rotations
    tcw: jnp.ndarray,  # (K,3)
    points: jnp.ndarray,  # (M,3)
    vel: jnp.ndarray,  # (K,3) world velocities
    Rwg: jnp.ndarray,
    scale: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Re-express the whole map in the gravity-aligned, metric frame
    (Map::ApplyScaledRotation semantics, map.h:152): world' = Ryw @ world
    with Ryw = Rwg^T, positions scaled by s.

    Poses transform as Tcw' = Tcw ∘ Tw w' = [Rcw Rwg | s * tcw]."""
    Rgw = jnp.swapaxes(Rwg, -1, -2)
    Rcw2 = jnp.einsum("kij,jl->kil", Rcw, jnp.swapaxes(Rgw, -1, -2))
    tcw2 = scale * tcw
    pts2 = scale * jnp.einsum("ij,mj->mi", Rgw, points)
    vel2 = scale * jnp.einsum("ij,kj->ki", Rgw, vel)
    return Rcw2, tcw2, pts2, vel2
