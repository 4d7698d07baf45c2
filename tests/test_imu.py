"""IMU preintegration tests against analytic ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.imu import preintegration as pre
from vi_slam_tpu.lie import so3

G = 9.81
G_W = np.asarray([0.0, 0.0, -G])


def simulate(
    n=1000, dt=0.001, w_body=(0.1, -0.2, 0.3), a_world=(0.5, 0.2, -0.1),
    bias_g=(0.0, 0.0, 0.0), bias_a=(0.0, 0.0, 0.0), noise=0.0, seed=0,
):
    """Ground-truth motion: constant body angular rate + constant world
    acceleration. Measurements follow the ZOH model the preintegration
    assumes (sampled at interval start); dt is small so the scheme's O(dt)
    error stays below test tolerances. Returns imu samples + final state."""
    rng = np.random.default_rng(seed)
    w_body = np.asarray(w_body)
    a_world = np.asarray(a_world)
    R = np.eye(3)
    v = np.zeros(3)
    p = np.zeros(3)
    accs, gyros = [], []
    for i in range(n):
        f_b = R.T @ (a_world - G_W)
        accs.append(f_b + bias_a + rng.normal(0, noise, 3))
        gyros.append(w_body + bias_g + rng.normal(0, noise, 3))
        R = R @ np.asarray(so3.exp(jnp.asarray(w_body * dt)))
        p = p + v * dt + 0.5 * a_world * dt * dt
        v = v + a_world * dt
    return (
        np.asarray(accs, np.float32),
        np.asarray(gyros, np.float32),
        np.full((n,), dt, np.float32),
        (R, v, p),
    )


CALIB = pre.ImuCalib.make(1.7e-4, 2.0e-3, 1.9e-5, 3.0e-3, 200.0)


class TestPreintegration:
    def test_matches_analytic(self):
        acc, gyro, dts, (R_f, v_f, p_f) = simulate()
        p9 = pre.integrate(
            CALIB, jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts),
            jnp.zeros(3), jnp.zeros(3),
        )
        R2, v2, p2 = pre.predict_state(
            p9, jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
            jnp.zeros(3), jnp.zeros(3),
        )
        np.testing.assert_allclose(np.asarray(R2), R_f, atol=2e-4)
        np.testing.assert_allclose(np.asarray(v2), v_f, atol=2e-3)
        np.testing.assert_allclose(np.asarray(p2), p_f, atol=2e-3)

    def test_padding_ignored(self):
        acc, gyro, dts, _ = simulate(n=100)
        pad = lambda a: np.concatenate([a, np.zeros((50,) + a.shape[1:], a.dtype)])
        p1 = pre.integrate(
            CALIB, jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts),
            jnp.zeros(3), jnp.zeros(3),
        )
        p2 = pre.integrate(
            CALIB, jnp.asarray(pad(acc)), jnp.asarray(pad(gyro)),
            jnp.asarray(pad(dts)), jnp.zeros(3), jnp.zeros(3),
        )
        np.testing.assert_allclose(np.asarray(p1.dR), np.asarray(p2.dR), atol=1e-7)
        np.testing.assert_allclose(np.asarray(p1.dP), np.asarray(p2.dP), atol=1e-7)
        assert float(p1.dt) == float(p2.dt)

    def test_bias_jacobian_correction(self):
        bias_g = np.asarray([0.02, -0.01, 0.015])
        bias_a = np.asarray([0.1, -0.05, 0.08])
        acc, gyro, dts, _ = simulate(bias_g=bias_g, bias_a=bias_a)
        # integrate at zero linearization bias, correct to the true bias
        p0 = pre.integrate(
            CALIB, jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts),
            jnp.zeros(3), jnp.zeros(3),
        )
        dR_c, dV_c, dP_c = pre.delta_with_bias(
            p0, jnp.asarray(bias_g, jnp.float32), jnp.asarray(bias_a, jnp.float32)
        )
        # reference: integrate directly at the true bias
        p_ref = pre.integrate(
            CALIB, jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts),
            jnp.asarray(bias_g, jnp.float32), jnp.asarray(bias_a, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(dR_c), np.asarray(p_ref.dR), atol=5e-3)
        np.testing.assert_allclose(np.asarray(dV_c), np.asarray(p_ref.dV), atol=5e-3)
        np.testing.assert_allclose(np.asarray(dP_c), np.asarray(p_ref.dP), atol=5e-3)

    def test_covariance_psd_and_grows(self):
        acc, gyro, dts, _ = simulate(n=400)
        p_half = pre.integrate(
            CALIB, jnp.asarray(acc[:200]), jnp.asarray(gyro[:200]),
            jnp.asarray(dts[:200]), jnp.zeros(3), jnp.zeros(3),
        )
        p_full = pre.integrate(
            CALIB, jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts),
            jnp.zeros(3), jnp.zeros(3),
        )
        C_half = np.asarray(p_half.C)
        C_full = np.asarray(p_full.C)
        eig_h = np.linalg.eigvalsh(C_half[:9, :9])
        assert eig_h.min() > -1e-12
        assert np.trace(C_full[:9, :9]) > np.trace(C_half[:9, :9])

    def test_residual_zero_at_truth(self):
        acc, gyro, dts, (R_f, v_f, p_f) = simulate()
        p9 = pre.integrate(
            CALIB, jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts),
            jnp.zeros(3), jnp.zeros(3),
        )
        r = pre.inertial_residual(
            p9,
            jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(R_f, jnp.float32), jnp.asarray(v_f, jnp.float32),
            jnp.asarray(p_f, jnp.float32),
            jnp.zeros(3), jnp.zeros(3), jnp.asarray(G_W, jnp.float32),
        )
        assert float(jnp.abs(r).max()) < 5e-3, r

    def test_information_finite(self):
        acc, gyro, dts, _ = simulate()
        p9 = pre.integrate(
            CALIB, jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts),
            jnp.zeros(3), jnp.zeros(3),
        )
        info = np.asarray(pre.information(p9))
        assert np.isfinite(info).all()
        assert np.linalg.eigvalsh(info).min() > 0
