"""Sim(3) similarity transforms (R, t, s) for loop closure / scale drift.

Semantic reference: g2o `Sim3` usage in the reference's essential-graph
optimization (`/root/reference/src/optimization/optimizer.cpp:2122` family)
and `VertexSim3Expmap` (`optimizetypes.h:131`). Monocular SLAM accumulates
scale drift; loop corrections are therefore solved over Sim(3).

A Sim3 maps x -> s * R @ x + t. Tangent layout: [rho(3), phi(3), sigma(1)]
with sigma = log-scale.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vi_slam_tpu.lie import so3

_EPS = 1e-8


class Sim3(NamedTuple):
    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)
    s: jnp.ndarray  # (...,)

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Sim3":
        return Sim3(
            jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3)),
            jnp.zeros((*batch_shape, 3), dtype=dtype),
            jnp.ones(batch_shape, dtype=dtype),
        )

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.s[..., None] * jnp.einsum("...ij,...j->...i", self.R, x) + self.t

    def compose(self, other: "Sim3") -> "Sim3":
        return Sim3(self.R @ other.R, self.apply(other.t), self.s * other.s)

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        s_inv = 1.0 / self.s
        return Sim3(
            Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, self.t), s_inv
        )

    @staticmethod
    def from_se3(R: jnp.ndarray, t: jnp.ndarray, s=None) -> "Sim3":
        if s is None:
            s = jnp.ones(t.shape[:-1], dtype=t.dtype)
        return Sim3(R, t, s)


def exp(xi: jnp.ndarray) -> Sim3:
    """Sim(3) exponential. xi = [rho, phi, sigma] (..., 7)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3.exp(phi)
    W = _sim3_V(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return Sim3(R, t, s)


def log(S: Sim3) -> jnp.ndarray:
    phi = so3.log(S.R)
    sigma = jnp.log(S.s)
    W = _sim3_V(phi, sigma)
    Winv = jnp.linalg.inv(W)
    rho = jnp.einsum("...ij,...j->...i", Winv, S.t)
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def _sim3_V(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The W matrix coupling translation with rotation+scale in Sim3 exp
    (standard closed form; see Strasdat's thesis)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    s = jnp.exp(sigma)
    W_hat = so3.hat(phi)
    W2 = W_hat @ W_hat
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W_hat.shape)

    sigma_small = jnp.abs(sigma) < 1e-5
    theta_small = theta2 < _EPS

    sg = jnp.where(sigma_small, jnp.ones_like(sigma), sigma)
    th = jnp.where(theta_small, jnp.ones_like(theta), theta)

    # A = (s - 1)/sigma  (C in some refs)
    A = jnp.where(sigma_small, 1.0 + 0.5 * sigma, (s - 1.0) / sg)

    sin_t, cos_t = jnp.sin(th), jnp.cos(th)
    denom = sg * sg + th * th

    # a-coefficient for W_hat term, b for W2 term, in the general case
    a_gen = (s * sin_t * sg + (1.0 - s * cos_t) * th) / (th * denom)
    b_gen = (
        A - ((s * cos_t - 1.0) * sg + s * sin_t * th) / denom
    ) / jnp.where(theta_small, jnp.ones_like(theta2), theta2)

    # sigma -> 0 limits
    a_sig0 = jnp.where(theta_small, 0.5 - theta2 / 24.0, (1.0 - cos_t) / (th * th))
    b_sig0 = jnp.where(
        theta_small, 1.0 / 6.0 - theta2 / 120.0, (th - sin_t) / (th * th * th)
    )

    # theta -> 0 limits (sigma general)
    a_th0 = jnp.where(
        sigma_small,
        0.5 + sigma / 6.0,
        ((sg - 1.0) * s + 1.0) / jnp.where(sigma_small, jnp.ones_like(sg), sg * sg),
    )
    b_th0 = jnp.where(
        sigma_small,
        1.0 / 6.0 + sigma / 24.0,
        (s * (0.5 * sg * sg - sg + 1.0) - 1.0)
        / jnp.where(sigma_small, jnp.ones_like(sg), sg * sg * sg),
    )

    a = jnp.where(sigma_small, a_sig0, jnp.where(theta_small, a_th0, a_gen))
    b = jnp.where(sigma_small, b_sig0, jnp.where(theta_small, b_th0, b_gen))

    return (
        A[..., None, None] * I
        + a[..., None, None] * W_hat
        + b[..., None, None] * W2
    )
