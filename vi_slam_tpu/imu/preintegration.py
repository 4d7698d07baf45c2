"""IMU preintegration on-manifold (Forster et al.), as a `lax.scan`.

Semantic reference: `IMU::Preintegrated`
(`/root/reference/src/datastructures/imu.cpp:347`
`IntegrateNewMeasurement` — delta R/V/P accumulation, 15x15 covariance
propagation with A/B matrices, bias Jacobians JRg/JVg/JVa/JPg/JPa;
`Reintegrate` :338; bias-corrected delta getters imu.h:217-236) and
`IMU::Calib` / `Bias` (imu.h:45-126).

TPU design: a whole inter-frame measurement batch integrates in one
`lax.scan` over static-length (padded) sample arrays; everything is
batched-friendly so N preintegrations (e.g. one per keyframe pair in an
inertial window) can vmap.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vi_slam_tpu.lie import so3

GRAVITY = 9.81


class ImuCalib(NamedTuple):
    """Noise/walk std densities already discretized per-sample:
    sigma^2 * freq for noise, sigma^2 / freq for walk (Calib imu.h:74-126)."""

    noise_gyro2: jnp.ndarray  # rad^2/s^2 per sample
    noise_acc2: jnp.ndarray
    walk_gyro2: jnp.ndarray
    walk_acc2: jnp.ndarray

    @staticmethod
    def make(noise_gyro, noise_acc, walk_gyro, walk_acc, freq) -> "ImuCalib":
        return ImuCalib(
            noise_gyro2=jnp.asarray(noise_gyro ** 2 * freq, jnp.float32),
            noise_acc2=jnp.asarray(noise_acc ** 2 * freq, jnp.float32),
            walk_gyro2=jnp.asarray(walk_gyro ** 2 / freq, jnp.float32),
            walk_acc2=jnp.asarray(walk_acc ** 2 / freq, jnp.float32),
        )


class Preintegrated(NamedTuple):
    """Accumulated deltas between two frames/keyframes."""

    dR: jnp.ndarray  # (3,3)
    dV: jnp.ndarray  # (3,)
    dP: jnp.ndarray  # (3,)
    C: jnp.ndarray  # (15,15) covariance [phi, v, p, bg, ba]
    JRg: jnp.ndarray  # (3,3) d dR / d bg
    JVg: jnp.ndarray
    JVa: jnp.ndarray
    JPg: jnp.ndarray
    JPa: jnp.ndarray
    dt: jnp.ndarray  # () total time
    bias_gyro: jnp.ndarray  # (3,) linearization bias
    bias_acc: jnp.ndarray  # (3,)


def identity_preintegrated(dtype=jnp.float32) -> Preintegrated:
    return Preintegrated(
        dR=jnp.eye(3, dtype=dtype),
        dV=jnp.zeros((3,), dtype),
        dP=jnp.zeros((3,), dtype),
        C=jnp.zeros((15, 15), dtype),
        JRg=jnp.zeros((3, 3), dtype),
        JVg=jnp.zeros((3, 3), dtype),
        JVa=jnp.zeros((3, 3), dtype),
        JPg=jnp.zeros((3, 3), dtype),
        JPa=jnp.zeros((3, 3), dtype),
        dt=jnp.zeros((), dtype),
        bias_gyro=jnp.zeros((3,), dtype),
        bias_acc=jnp.zeros((3,), dtype),
    )


@jax.jit
def integrate(
    calib: ImuCalib,
    acc: jnp.ndarray,  # (T, 3)
    gyro: jnp.ndarray,  # (T, 3)
    dts: jnp.ndarray,  # (T,) — zero-padded samples are skipped
    bias_gyro: jnp.ndarray,  # (3,)
    bias_acc: jnp.ndarray,  # (3,)
) -> Preintegrated:
    """Integrate a (padded) measurement batch into deltas + covariance +
    bias Jacobians (IntegrateNewMeasurement imu.cpp:347 semantics)."""
    dtype = acc.dtype
    init = identity_preintegrated(dtype)._replace(
        bias_gyro=bias_gyro.astype(dtype), bias_acc=bias_acc.astype(dtype)
    )
    gyro = gyro.astype(dtype)
    dts = dts.astype(dtype)

    def step(s: Preintegrated, x):
        a, w, dt = x
        active = dt > 0
        a_c = a - s.bias_acc
        w_c = w - s.bias_gyro
        dt2 = dt * dt

        # position/velocity use the *current* dR (pre-rotation update)
        dP = s.dP + s.dV * dt + 0.5 * (s.dR @ a_c) * dt2
        dV = s.dV + (s.dR @ a_c) * dt

        a_hat = so3.hat(a_c)
        # covariance propagation: state [phi, v, p], A (9,9), B (9,6)
        dRi = so3.exp(w_c * dt)
        Jr = so3.right_jacobian(w_c * dt)
        A = jnp.zeros((9, 9), dtype)
        A = A.at[0:3, 0:3].set(dRi.T)
        A = A.at[3:6, 0:3].set(-s.dR @ a_hat * dt)
        A = A.at[6:9, 0:3].set(-0.5 * s.dR @ a_hat * dt2)
        A = A.at[3:6, 3:6].set(jnp.eye(3, dtype=dtype))
        A = A.at[6:9, 3:6].set(jnp.eye(3, dtype=dtype) * dt)
        A = A.at[6:9, 6:9].set(jnp.eye(3, dtype=dtype))
        B = jnp.zeros((9, 6), dtype)
        B = B.at[0:3, 0:3].set(Jr * dt)
        B = B.at[3:6, 3:6].set(s.dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * s.dR * dt2)
        Nga = jnp.diag(
            jnp.concatenate(
                [
                    jnp.full((3,), calib.noise_gyro2, dtype),
                    jnp.full((3,), calib.noise_acc2, dtype),
                ]
            )
        )
        C9 = A @ s.C[:9, :9] @ A.T + B @ Nga @ B.T
        C = s.C.at[:9, :9].set(C9)
        Cw = s.C[9:15, 9:15] + jnp.diag(
            jnp.concatenate(
                [
                    jnp.full((3,), calib.walk_gyro2 * dt, dtype),
                    jnp.full((3,), calib.walk_acc2 * dt, dtype),
                ]
            )
        )
        C = C.at[9:15, 9:15].set(Cw)

        # bias Jacobians (update order matters: P before V before R)
        JPa = s.JPa + s.JVa * dt - 0.5 * s.dR * dt2
        JPg = s.JPg + s.JVg * dt - 0.5 * s.dR @ a_hat @ s.JRg * dt2
        JVa = s.JVa - s.dR * dt
        JVg = s.JVg - s.dR @ a_hat @ s.JRg * dt
        JRg = dRi.T @ s.JRg - Jr * dt

        dR = so3.normalize(s.dR @ dRi)

        new = Preintegrated(
            dR=dR, dV=dV, dP=dP, C=C,
            JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa,
            dt=s.dt + dt,
            bias_gyro=s.bias_gyro, bias_acc=s.bias_acc,
        )
        out = jax.tree.map(
            lambda n, o: jnp.where(active, n, o), new, s
        )
        return out, None

    final, _ = jax.lax.scan(step, init, (acc, gyro, dts))
    return final


@jax.jit
def compose(p1: Preintegrated, p2: Preintegrated) -> Preintegrated:
    """Chain two preintegrated segments (1 then 2) sharing a linearization
    bias into one, in O(1) — deltas, bias Jacobians, and covariance all
    compose in closed form. The reference instead re-integrates the raw
    sample buffer on keyframe deletion (`Preintegrated::MergePrevious`,
    imu.cpp:305); composition gives the same first-order object without
    keeping samples around.

    Derivation: with e = [phi, dv, dp] the right-perturbation error,
      dR~ = dR1 Exp(phi1) dR2 Exp(phi2) = dR Exp(dR2^T phi1 + phi2)
      dV~ = dV + dv1 - dR1 hat(dV2) phi1 + dR1 dv2
      dP~ = dP + dp1 + dv1 dt2 - dR1 hat(dP2) phi1 + dR1 dp2
    so C9 = A1 C9_1 A1^T + A2 C9_2 A2^T (segments are independent)."""
    dtype = p1.dP.dtype
    dt2 = p2.dt
    dR = so3.normalize(p1.dR @ p2.dR)
    dV = p1.dV + p1.dR @ p2.dV
    dP = p1.dP + p1.dV * dt2 + p1.dR @ p2.dP

    # bias Jacobians of the composition (first order, shared lin. point)
    JRg = p2.dR.T @ p1.JRg + p2.JRg
    JVg = p1.JVg + p1.dR @ p2.JVg - p1.dR @ so3.hat(p2.dV) @ p1.JRg
    JVa = p1.JVa + p1.dR @ p2.JVa
    JPg = (p1.JPg + p1.JVg * dt2 + p1.dR @ p2.JPg
           - p1.dR @ so3.hat(p2.dP) @ p1.JRg)
    JPa = p1.JPa + p1.JVa * dt2 + p1.dR @ p2.JPa

    I3 = jnp.eye(3, dtype=dtype)
    Z3 = jnp.zeros((3, 3), dtype)
    A1 = jnp.block([
        [p2.dR.T, Z3, Z3],
        [-p1.dR @ so3.hat(p2.dV), I3, Z3],
        [-p1.dR @ so3.hat(p2.dP), I3 * dt2, I3],
    ])
    A2 = jnp.block([
        [I3, Z3, Z3],
        [Z3, p1.dR, Z3],
        [Z3, Z3, p1.dR],
    ])
    C9 = A1 @ p1.C[:9, :9] @ A1.T + A2 @ p2.C[:9, :9] @ A2.T
    C = jnp.zeros((15, 15), dtype)
    C = C.at[:9, :9].set(C9)
    C = C.at[9:15, 9:15].set(p1.C[9:15, 9:15] + p2.C[9:15, 9:15])
    return Preintegrated(
        dR=dR, dV=dV, dP=dP, C=C,
        JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa,
        dt=p1.dt + dt2,
        bias_gyro=p1.bias_gyro, bias_acc=p1.bias_acc,
    )


def delta_with_bias(
    p: Preintegrated, bias_gyro: jnp.ndarray, bias_acc: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """First-order bias-corrected deltas (GetDeltaRotation/Velocity/Position,
    imu.h:217-236)."""
    dbg = bias_gyro - p.bias_gyro
    dba = bias_acc - p.bias_acc
    dR = p.dR @ so3.exp(p.JRg @ dbg)
    dV = p.dV + p.JVg @ dbg + p.JVa @ dba
    dP = p.dP + p.JPg @ dbg + p.JPa @ dba
    return dR, dV, dP


def predict_state(
    p: Preintegrated,
    R1: jnp.ndarray,
    v1: jnp.ndarray,
    p1: jnp.ndarray,
    bias_gyro: jnp.ndarray,
    bias_acc: jnp.ndarray,
    gravity: float = GRAVITY,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Propagate a world-frame body state (Rwb, v_w, p_w) through the
    preintegrated deltas (Tracking::PredictStateIMU semantics,
    tracking.cpp:1507). Gravity points along -z_world? No: +g down; we use
    g_w = (0, 0, -gravity) for z-up worlds and the caller supplies its own
    convention via `gravity_vec` if needed."""
    g_w = jnp.asarray([0.0, 0.0, -gravity], R1.dtype)
    dR, dV, dP = delta_with_bias(p, bias_gyro, bias_acc)
    dt = p.dt
    R2 = R1 @ dR
    v2 = v1 + g_w * dt + R1 @ dV
    p2 = p1 + v1 * dt + 0.5 * g_w * dt * dt + R1 @ dP
    return R2, v2, p2


def inertial_residual(
    p: Preintegrated,
    R1, v1, p1, R2, v2, p2,
    bias_gyro, bias_acc,
    gravity_vec,
) -> jnp.ndarray:
    """9-dim preintegration residual (EdgeInertial semantics,
    g2otypes.h:484): [e_R, e_v, e_p]."""
    dR, dV, dP = delta_with_bias(p, bias_gyro, bias_acc)
    dt = p.dt
    eR = so3.log(dR.T @ R1.T @ R2)
    ev = R1.T @ (v2 - v1 - gravity_vec * dt) - dV
    ep = R1.T @ (p2 - p1 - v1 * dt - 0.5 * gravity_vec * dt * dt) - dP
    return jnp.concatenate([eR, ev, ep])


def information(p: Preintegrated) -> jnp.ndarray:
    """9x9 information of the preintegration residual
    (GetInformationMatrix, imu.h:217)."""
    C = p.C[:9, :9]
    C = 0.5 * (C + C.T) + 1e-12 * jnp.eye(9, dtype=C.dtype)
    return jnp.linalg.inv(C)
