"""End-to-end stereo-inertial VIO on the synthetic inertial world.

Covers the inertial branches of the reference core loop: per-frame
preintegration (tracking.cpp:1384), IMU pose prediction (:1507), staged
IMU initialization (localmapping.cpp:1231), visual-inertial local BA
(optimizer.cpp:3974), and the IMU dead-reckoning bridge through
RECENTLY_LOST (tracking.cpp:1816-1835).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vi_slam_tpu.imu import preintegration as pre
from vi_slam_tpu.io import evaluation, synthetic
from vi_slam_tpu.pipeline.stereo_vo import StereoVO
from vi_slam_tpu.pipeline.vio import StereoInertialVO
from vi_slam_tpu.utils.config import (
    BAConfig,
    CameraConfig,
    ExtractorConfig,
    IMUConfig,
    MapConfig,
    SystemConfig,
    TrackerConfig,
)

pytestmark = pytest.mark.slow  # multi-minute image/e2e pipelines

WIDTH, HEIGHT = 640, 480
FX = FY = 500.0
CX, CY = 320.0, 240.0
BF = 250.0
N_FRAMES = 80


def make_cfg():
    return SystemConfig(
        camera=CameraConfig(
            width=WIDTH, height=HEIGHT, fx=FX, fy=FY, cx=CX, cy=CY,
            bf=BF, th_depth=40.0, fps=10.0,
        ),
        extractor=ExtractorConfig(n_features=1200),
        ba=BAConfig(max_local_kfs=8, max_local_points=2048,
                    local_ba_iters=6, inertial_window=8),
        map=MapConfig(max_keyframes=128, max_points=32768,
                      max_obs_per_point=8),
        imu=IMUConfig(freq=200.0),
        tracker=TrackerConfig(max_frames_between_kf=4),
    )


@pytest.fixture(scope="module")
def inertial_world():
    return synthetic.make_inertial_world(
        n_frames=N_FRAMES, fps=10.0, n_landmarks=5000, seed=3
    )


def run_vio(iw, drop_frames=(), inertial=True, cfg=None):
    cfg = cfg or make_cfg()
    vo = StereoInertialVO(cfg) if inertial else StereoVO(cfg)
    states = []
    for i in range(N_FRAMES):
        mf = 3 if i in drop_frames else 1000
        fr = synthetic.render_oracle_frame(
            iw.world, i, FX, FY, CX, CY, BF, WIDTH, HEIGHT,
            max_features=mf, px_noise=0.3,
        )
        if inertial:
            st = vo.process_oracle_inertial(
                fr.xy, fr.uright, fr.depth, fr.desc, fr.level,
                iw.imu_per_frame[i], iw.timestamps[i],
            )
        else:
            st = vo.process_oracle(
                fr.xy, fr.uright, fr.depth, fr.desc, fr.level,
                iw.timestamps[i],
            )
        states.append(st.state)
    traj = vo.trajectory_wc()
    ate = evaluation.ate_rmse(
        traj[:, :3, 3], iw.world.poses_wc[: len(traj), :3, 3]
    )
    return vo, states, ate


@pytest.fixture(scope="module")
def vio_run(inertial_world):
    return run_vio(inertial_world)


class TestStereoInertial:
    def test_initializes_and_tracks(self, vio_run):
        vo, states, ate = vio_run
        assert vo.imu_ready
        assert vo._init_stage >= 2  # staged refinement ran
        assert states.count("LOST") == 0
        assert states.count("OK") >= N_FRAMES - 2

    def test_bias_and_gravity_estimates(self, inertial_world, vio_run):
        vo, _, _ = vio_run
        iw = inertial_world
        got = jax.device_get({"bg": vo.bg_dev, "g": vo.g_w_dev})
        assert np.linalg.norm(got["bg"] - iw.bias_gyro) < 1.5e-3, got["bg"]
        # gravity direction within ~1 degree
        cosang = got["g"] @ iw.gravity_w / (
            np.linalg.norm(got["g"]) * np.linalg.norm(iw.gravity_w)
        )
        assert cosang > np.cos(np.radians(1.0)), got["g"]

    def test_ate_small(self, vio_run):
        _, _, ate = vio_run
        assert ate["rmse"] < 0.05, ate

    def test_velocity_estimate_tracks_truth(self, inertial_world, vio_run):
        vo, _, _ = vio_run
        iw = inertial_world
        v = jax.device_get(vo.vel_w_dev)
        assert np.linalg.norm(v - iw.vel_w[N_FRAMES - 1]) < 0.15, v


class TestDeadReckoningBridge:
    """A 1 s total feature dropout: IMU-on must bridge it by dead
    reckoning where visual-only drifts on the frozen pose."""

    def test_imu_bridges_dropout(self, inertial_world):
        drop = set(range(45, 55))
        _, states_v, ate_v = run_vio(inertial_world, drop, inertial=False)
        vo_i, states_i, ate_i = run_vio(inertial_world, drop, inertial=True)
        assert states_i.count("LOST") == 0
        assert "RECENTLY_LOST" in states_i  # the dropout was noticed
        assert ate_i["rmse"] < 0.05, ate_i
        # and beats visual-only by a wide margin
        assert ate_i["rmse"] < 0.5 * ate_v["rmse"], (ate_i, ate_v)


class TestPreintegrationCompose:
    def test_compose_matches_direct_integration(self):
        rng = np.random.default_rng(0)
        calib = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, 200.0)
        T = 40
        acc = jnp.asarray(rng.normal(0, 2, (T, 3)) + np.array([0, 0, 9.8]))
        gyro = jnp.asarray(rng.normal(0, 0.3, (T, 3)))
        dts = jnp.full((T,), 1 / 200.0)
        bg = jnp.asarray([0.01, -0.02, 0.005])
        ba = jnp.asarray([0.1, -0.05, 0.02])
        full = pre.integrate(calib, acc, gyro, dts, bg, ba)
        h1 = pre.integrate(calib, acc[:25], gyro[:25], dts[:25], bg, ba)
        h2 = pre.integrate(calib, acc[25:], gyro[25:], dts[25:], bg, ba)
        comp = pre.compose(h1, h2)
        np.testing.assert_allclose(comp.dR, full.dR, atol=1e-4)
        np.testing.assert_allclose(comp.dV, full.dV, atol=1e-4)
        np.testing.assert_allclose(comp.dP, full.dP, atol=1e-4)
        np.testing.assert_allclose(comp.dt, full.dt, atol=1e-6)
        # Jacobians/covariance agree to first order
        np.testing.assert_allclose(comp.JRg, full.JRg, atol=2e-3)
        np.testing.assert_allclose(comp.JPa, full.JPa, atol=2e-3)
        assert float(jnp.max(jnp.abs(comp.C - full.C))) < 5e-8


class TestVioBeatsVo:
    """Sustained 30% feature dropout after warm-up: the inertial pipeline
    must hold a tighter trajectory than pure visual odometry (the
    reference's motivation for the IMU branches, tracking.cpp:1816-1835;
    VERDICT done-criterion for the inertial story)."""

    def test_vio_beats_vo_under_dropout(self, inertial_world):
        drops = tuple(i for i in range(30, N_FRAMES) if i % 3 == 0)
        _, states_v, ate_v = run_vio(inertial_world, drop_frames=drops,
                                     inertial=False)
        _, states_i, ate_i = run_vio(inertial_world, drop_frames=drops,
                                     inertial=True)
        lost_v = sum(s != "OK" for s in states_v)
        lost_i = sum(s != "OK" for s in states_i)
        assert lost_i <= lost_v
        assert ate_i["rmse"] < ate_v["rmse"]


class TestPipelinedImagePath:
    """The fused _frame_vio program: billboard images rendered along the
    inertial-world trajectory, processed through process_stereo_inertial.
    After initialization the path must enter the pipelined regime and
    keep tracking."""

    def test_pipelined_vio_tracks(self):
        # Pin the production float regime: the conftest enables x64 for
        # solver-precision tests, but the shipping pipeline runs f32
        # (bench.py / apps). Under x64, numpy-double constants promote a
        # few mask computations (level_scales, subpixel SAD) to f64,
        # shifting marginal stereo matches; this 40-frame image run is
        # near a sensitivity boundary and must be asserted in the regime
        # users actually run (r4 diagnosis: frame-2 inliers 166 (f32) vs
        # 97 (f64) on identical matches).
        jax.config.update("jax_enable_x64", False)
        try:
            self._run_pipelined()
        finally:
            jax.config.update("jax_enable_x64", True)

    def _run_pipelined(self):
        n_frames = 40
        iw = synthetic.make_inertial_world(
            n_frames=n_frames, fps=10.0, n_landmarks=2000, seed=5
        )
        poses = iw.world.poses_wc
        rng = np.random.default_rng(7)
        n_boards = 2500
        centers = poses[rng.integers(0, n_frames, n_boards), :3, 3]
        offs = np.stack(
            [
                rng.uniform(-12.0, 12.0, n_boards),
                rng.uniform(-5.0, 3.0, n_boards),
                rng.uniform(2.0, 40.0, n_boards),
            ],
            axis=-1,
        )
        G = 5
        world = synthetic.BillboardWorld(
            centers=centers + offs,
            sizes=rng.uniform(0.15, 0.6, n_boards),
            intensities=rng.uniform(60.0, 255.0, n_boards),
            poses_wc=poses,
            textures=rng.uniform(30.0, 255.0, (n_boards, G, G)).astype(
                np.float32
            ),
        )
        vo = StereoInertialVO(make_cfg())
        for i in range(n_frames):
            imgL = synthetic.render_billboard_image(
                world, poses[i], FX, FY, CX, CY, WIDTH, HEIGHT, baseline=0.0
            )
            imgR = synthetic.render_billboard_image(
                world, poses[i], FX, FY, CX, CY, WIDTH, HEIGHT,
                baseline=BF / FX,
            )
            vo.process_stereo_inertial(
                imgL, imgR, iw.imu_per_frame[i], iw.timestamps[i]
            )
        vo.flush()
        assert vo.imu_ready
        assert getattr(vo, "_vio_pipelined", False)
        states = [r.state for r in vo.records]
        assert states[-1] == "OK"
        assert states.count("LOST") == 0
        traj = vo.trajectory_wc()
        ate = evaluation.ate_rmse(
            traj[:, :3, 3], poses[: len(traj), :3, 3]
        )
        assert ate["rmse"] < 0.5


class TestSmootherPath:
    """The per-frame fixed-lag smoother on the VIO tracking path
    (cfg.ba.use_smoother — the consumed ISAM2/GTSAM capability,
    gtsamoptimizer.h:107-262; optim/smoother.py)."""

    @pytest.fixture(scope="class")
    def smoother_cfg(self):
        import dataclasses

        cfg = make_cfg()
        return cfg.replace(
            ba=dataclasses.replace(cfg.ba, use_smoother=True)
        )

    def test_smoother_path_tracks(self, inertial_world, smoother_cfg):
        vo, states, ate = run_vio(inertial_world, cfg=smoother_cfg)
        assert vo.imu_ready
        assert states.count("LOST") == 0
        assert ate["rmse"] < 0.05

    def test_smoother_matches_gn_under_dropout(self, inertial_world,
                                               smoother_cfg):
        """Visual dropout (5 frames with 3 features): the windowed
        re-optimization must ride through at least as well as the
        2-state prior GN (and never lose tracking)."""
        drop = set(range(45, 50))
        _, s_s, ate_s = run_vio(inertial_world, drop_frames=drop,
                                cfg=smoother_cfg)
        _, s_p, ate_p = run_vio(inertial_world, drop_frames=drop)
        assert s_s.count("LOST") == 0
        assert ate_s["rmse"] < max(1.15 * ate_p["rmse"], 0.05)
