"""Unit tests for SO3/SE3/Sim3 against numerical references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_slam_tpu.lie import se3, sim3, so3


def random_w(key, n, scale=2.0):
    return jax.random.normal(key, (n, 3)) * scale


class TestSO3:
    def test_exp_is_rotation(self):
        w = random_w(jax.random.PRNGKey(0), 64)
        R = so3.exp(w)
        I = jnp.eye(3)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(R, -1, -2) @ R), np.tile(I, (64, 1, 1)),
            atol=1e-8,
        )
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-8)

    def test_exp_log_roundtrip(self):
        # angles below pi for uniqueness
        key = jax.random.PRNGKey(1)
        w = random_w(key, 128, scale=1.0)
        norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
        w = w / norm * jnp.minimum(norm, 3.0)
        w2 = so3.log(so3.exp(w))
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-6)

    def test_small_angle(self):
        w = jnp.array([[1e-10, -2e-11, 3e-10], [0.0, 0.0, 0.0]])
        R = so3.exp(w)
        np.testing.assert_allclose(np.asarray(so3.log(R)), np.asarray(w), atol=1e-12)

    def test_near_pi(self):
        axis = np.array([0.3, -0.5, 0.81])
        axis /= np.linalg.norm(axis)
        for theta in [np.pi - 1e-3, np.pi - 1e-7, np.pi]:
            w = jnp.asarray(axis * theta)[None]
            R = so3.exp(w)
            w2 = so3.log(R)
            R2 = so3.exp(w2)
            np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)

    def test_right_jacobian_first_order(self):
        w = jnp.array([0.4, -0.2, 0.7])
        dw = jnp.array([1e-5, 2e-5, -1e-5])
        Jr = so3.right_jacobian(w)
        # exp(w + dw) ≈ exp(w) exp(Jr dw)
        lhs = so3.exp(w + dw)
        rhs = so3.exp(w) @ so3.exp(Jr @ dw)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)

    def test_inverse_right_jacobian(self):
        w = random_w(jax.random.PRNGKey(2), 32, scale=1.5)
        J = so3.right_jacobian(w)
        Jinv = so3.inverse_right_jacobian(w)
        np.testing.assert_allclose(
            np.asarray(J @ Jinv), np.tile(np.eye(3), (32, 1, 1)), atol=1e-8
        )

    def test_normalize(self):
        w = random_w(jax.random.PRNGKey(3), 8, scale=1.0)
        R = so3.exp(w)
        R_noisy = R + 1e-4 * jax.random.normal(jax.random.PRNGKey(4), R.shape)
        Rn = so3.normalize(so3.normalize(R_noisy))
        err = jnp.swapaxes(Rn, -1, -2) @ Rn - jnp.eye(3)
        assert float(jnp.abs(err).max()) < 1e-7


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(5)
        xi = jax.random.normal(key, (64, 6))
        xi = xi.at[:, 3:].multiply(0.5)
        T = se3.exp(xi)
        xi2 = se3.log(T)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-8)

    def test_compose_inverse(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(6))
        T1 = se3.exp(jax.random.normal(k1, (16, 6)))
        T2 = se3.exp(jax.random.normal(k2, (16, 6)))
        T = T1.compose(T2).compose(T2.inverse()).compose(T1.inverse())
        np.testing.assert_allclose(
            np.asarray(T.R), np.tile(np.eye(3), (16, 1, 1)), atol=1e-8
        )
        np.testing.assert_allclose(np.asarray(T.t), 0.0, atol=1e-8)

    def test_apply_matches_matrix(self):
        T = se3.exp(jax.random.normal(jax.random.PRNGKey(7), (6,)))
        x = jax.random.normal(jax.random.PRNGKey(8), (10, 3))
        xh = jnp.concatenate([x, jnp.ones((10, 1))], axis=-1)
        y1 = T.apply(x)
        y2 = (T.as_matrix() @ xh.T).T[:, :3]
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-10)

    def test_retraction_consistency(self):
        T = se3.exp(jax.random.normal(jax.random.PRNGKey(9), (6,)))
        xi = jnp.asarray([1e-4, -2e-4, 3e-4, 1e-4, 5e-5, -8e-5])
        Tl = se3.retract_left(T, xi)
        expected = se3.exp(xi).compose(T)
        np.testing.assert_allclose(np.asarray(Tl.R), np.asarray(expected.R), atol=1e-9)
        np.testing.assert_allclose(np.asarray(Tl.t), np.asarray(expected.t), atol=1e-9)


class TestSim3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(10)
        xi = jax.random.normal(key, (64, 7))
        xi = xi.at[:, 3:6].multiply(0.5)
        xi = xi.at[:, 6].multiply(0.3)
        S = sim3.exp(xi)
        xi2 = sim3.log(S)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-6)

    def test_compose_inverse(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(11))
        xi1 = jax.random.normal(k1, (8, 7)) * 0.5
        xi2 = jax.random.normal(k2, (8, 7)) * 0.5
        S1, S2 = sim3.exp(xi1), sim3.exp(xi2)
        S = S1.compose(S2).compose(S2.inverse()).compose(S1.inverse())
        np.testing.assert_allclose(
            np.asarray(S.R), np.tile(np.eye(3), (8, 1, 1)), atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(S.t), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(S.s), 1.0, atol=1e-6)

    def test_identity_scale(self):
        S = sim3.Sim3.identity((4,))
        x = jax.random.normal(jax.random.PRNGKey(12), (4, 3))
        np.testing.assert_allclose(np.asarray(S.apply(x)), np.asarray(x))

    def test_scale_only(self):
        xi = jnp.zeros((7,)).at[6].set(jnp.log(2.0))
        S = sim3.exp(xi)
        np.testing.assert_allclose(float(S.s), 2.0, rtol=1e-10)
        x = jnp.asarray([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(S.apply(x)), [2.0, 4.0, 6.0], atol=1e-6)
