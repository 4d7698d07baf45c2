"""SO(3) operations: hat/vee, exp/log, left/right Jacobians.

Semantic reference: the reference engine's inline SO3 helpers
(`/root/reference/include/vi_slam/datastructures/imu.h:261-270` —
ExpSO3/LogSO3/RightJacobianSO3/InverseRightJacobianSO3) and Sophus usage in
`basics/eigen_funcs.h`. Implemented from the standard closed forms with
small-angle Taylor guards; fully batched and dtype-generic.

Conventions: rotation matrices `R` act on column vectors, tangent vectors
`w` are in the body frame for right-Jacobian formulas (matching the IMU
preintegration math in the reference).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of w (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sin_coeffs(theta2: jnp.ndarray):
    """Return (A, B, C) with A=sin(t)/t, B=(1-cos t)/t^2, C=(t-sin t)/t^3,
    Taylor-guarded near zero. theta2 = |w|^2."""
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta2 < _EPS
    # Guard the argument so sqrt/sin/cos gradients stay finite.
    t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    t = jnp.sqrt(t2)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(t) / t)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(t)) / t2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (t - jnp.sin(t)) / (t2 * t))
    return A, B, C


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: exp of tangent (..., 3) -> rotation matrix (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sin_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map (..., 3, 3) -> (..., 3). Stable up to theta < pi.

    Differentiable everywhere: arccos (infinite slope at +-1) is only
    evaluated on a clipped argument, and the theta->0 region uses a Taylor
    series in c = 1 - cos(theta) so jacfwd/jacrev stay finite at identity
    (required by the VI-BA autodiff Jacobians)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # small region must cover the arccos clip band
    small = cos_theta > 1.0 - 1e-4  # theta < ~1.4e-2
    cos_safe = jnp.clip(cos_theta, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_safe)
    w_vee = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    sin_theta = jnp.sin(theta)
    # near pi the clipped arccos saturates; recover theta from
    # cos(theta) = -1 + (pi - theta)^2 / 2 instead
    near_pi = cos_theta < -1.0 + 2e-6
    theta_pi = jnp.pi - jnp.sqrt(jnp.clip(2.0 * (1.0 + cos_theta), 0.0, None))
    theta = jnp.where(near_pi, theta_pi, theta)
    # generic: w = theta / (2 sin theta) * vee(R - R^T)
    safe_sin = jnp.where(small | near_pi, jnp.ones_like(sin_theta), sin_theta)
    # theta/sin(theta) as a series in c = 1 - cos(theta) (theta^2 = 2c + ...)
    c = 1.0 - cos_theta
    scale_small = 1.0 + c / 3.0 + 7.0 * c * c / 90.0
    scale = jnp.where(small, scale_small, theta / safe_sin)
    w_generic = w_vee * scale[..., None]
    # near pi: |axis| from the diagonal of the symmetric part
    # B = (R + R^T)/2 = cos(theta) I + (1 - cos theta) aa^T
    Bm = (R + jnp.swapaxes(R, -1, -2)) * 0.5
    diag = jnp.stack([Bm[..., 0, 0], Bm[..., 1, 1], Bm[..., 2, 2]], axis=-1)
    axis2 = jnp.clip(
        (diag - cos_theta[..., None]) / jnp.maximum(1.0 - cos_theta[..., None], 1e-12),
        0.0,
        1.0,
    )
    axis_abs = jnp.sqrt(axis2)
    # Relative signs from the off-diagonal products a_i a_j = B_ij/(1-cos t):
    # anchor on the largest axis component (its own sign fixed +), derive the
    # other two from the products with the anchor.
    s01, s02, s12 = Bm[..., 0, 1], Bm[..., 0, 2], Bm[..., 1, 2]
    one = jnp.ones_like(axis_abs[..., 0])

    def sgn(x):
        return jnp.where(x >= 0, one, -one)

    ax_x = jnp.stack([one, sgn(s01), sgn(s02)], axis=-1)  # anchor = x
    ax_y = jnp.stack([sgn(s01), one, sgn(s12)], axis=-1)  # anchor = y
    ax_z = jnp.stack([sgn(s02), sgn(s12), one], axis=-1)  # anchor = z
    anchor = jnp.argmax(axis_abs, axis=-1)
    signs = jnp.where(
        (anchor == 0)[..., None], ax_x, jnp.where((anchor == 1)[..., None], ax_y, ax_z)
    )
    axis = axis_abs * signs
    # Overall sign: near (but not at) pi the skew part w_vee = sin(t) * axis
    # still carries the global orientation; at exactly pi both signs agree.
    flip = jnp.sum(axis * w_vee, axis=-1) < 0
    axis = jnp.where(flip[..., None], -axis, axis)
    w_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l(w): exp(w + dw) ~ exp(J_l dw) exp(w)."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _sin_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + B[..., None, None] * W + C[..., None, None] * W2


def right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian J_r(w) = J_l(-w); matches RightJacobianSO3 in the
    reference IMU math (imu.h:267)."""
    return left_jacobian(-w)


def inverse_right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of the right Jacobian (imu.h:268 semantics)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta2 < _EPS
    t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    t = jnp.sqrt(t2)
    # coefficient k = 1/t^2 - (1 + cos t) / (2 t sin t)
    k = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / t2 - (1.0 + jnp.cos(t)) / (2.0 * t * jnp.sin(t)),
    )
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + 0.5 * W + k[..., None, None] * W2


def normalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation matrix back onto SO(3) via symmetric
    orthogonalization (SVD-free Newton step, adequate after GN updates)."""
    # One iteration of R <- R (3I - R^T R)/2 converges quadratically for
    # matrices already close to orthogonal.
    RtR = jnp.swapaxes(R, -1, -2) @ R
    I = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    return R @ (1.5 * I - 0.5 * RtR)
