"""SE(3) rigid transforms as struct-of-arrays (R, t) pairs.

Semantic reference: Sophus SE3 usage throughout the reference
(`/root/reference/src/basics/converter.cpp`, pose fields in
`datastructures/frame.h`, `keyframe.h`) and the g2o `VertexPose` retraction
(`/root/reference/src/optimization/g2otypes.cpp` ImuCamPose::Update —
left-multiplicative update with rotation/translation tangent).

Poses here are stored as explicit rotation matrices `R (...,3,3)` plus
translations `t (...,3)` — the layout BA kernels want — rather than 4x4
homogeneous matrices or quaternions. All ops are batched.

Convention: `T = (R, t)` maps points `x_world` by `R @ x + t`. For camera
poses we follow the reference's `Tcw` convention (world -> camera).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vi_slam_tpu.lie import so3


class SE3(NamedTuple):
    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        t = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return SE3(R, t)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """Transform points (..., 3)."""
        return jnp.einsum("...ij,...j->...i", self.R, x) + self.t

    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other: (R1 R2, R1 t2 + t1)."""
        return SE3(self.R @ other.R, self.apply(other.t))

    def __matmul__(self, other):
        if isinstance(other, SE3):
            return self.compose(other)
        return self.apply(other)

    def inverse(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))

    def as_matrix(self) -> jnp.ndarray:
        """(..., 4, 4) homogeneous matrix."""
        batch = self.t.shape[:-1]
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=self.t.dtype), (*batch, 1, 4)
        )
        top = jnp.concatenate([self.R, self.t[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    @staticmethod
    def from_matrix(T: jnp.ndarray) -> "SE3":
        return SE3(T[..., :3, :3], T[..., :3, 3])

    def normalize(self) -> "SE3":
        return SE3(so3.normalize(self.R), self.t)


def exp(xi: jnp.ndarray) -> SE3:
    """Exponential map. Tangent layout xi = [rho (trans), phi (rot)] (..., 6),
    matching the (translation-first) ordering used by our BA Jacobians."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3.exp(phi)
    V = so3.left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return SE3(R, t)


def log(T: SE3) -> jnp.ndarray:
    phi = so3.log(T.R)
    Vinv = _left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, T.t)
    return jnp.concatenate([rho, phi], axis=-1)


def _left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    return so3.inverse_right_jacobian(-phi)


def retract_left(T: SE3, xi: jnp.ndarray) -> SE3:
    """Left-multiplicative retraction exp(xi) ∘ T — the update used by pose
    optimization (reference: g2o SE3 expmap update semantics)."""
    dT = exp(xi)
    return SE3(so3.normalize(dT.R @ T.R), dT.apply(T.t))


def retract_right(T: SE3, xi: jnp.ndarray) -> SE3:
    """Right-multiplicative retraction T ∘ exp(xi)."""
    dT = exp(xi)
    return SE3(so3.normalize(T.R @ dT.R), T.apply(dT.t))


def relative(T_a: SE3, T_b: SE3) -> SE3:
    """T_a^{-1} ∘ T_b."""
    return T_a.inverse().compose(T_b)
