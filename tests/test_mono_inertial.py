"""Mono-inertial VIO: metric scale recovery + EuRoC trajectory export.

Semantic reference: the IMU_MONOCULAR mode (system.h:96-102) —
`InertialOptimization` with the scale vertex (optimizer.cpp:4697,
g2otypes.h:285 VertexScale), `Map::ApplyScaledRotation` (map.h:152) and
`LocalMapping::ScaleRefinement` (localmapping.cpp:1395): the monocular
map's arbitrary scale becomes metric once gravity/IMU constraints are
solved, and later refinement passes keep polishing it.
"""

import numpy as np
import jax
import pytest

from vi_slam_tpu.io import evaluation, synthetic, trajectory
from vi_slam_tpu.pipeline.vio import MonoInertialVO
from vi_slam_tpu.utils.config import (
    BAConfig, CameraConfig, ExtractorConfig, IMUConfig, MapConfig, Sensor,
    SystemConfig, TrackerConfig,
)

pytestmark = pytest.mark.slow  # multi-minute image/e2e pipelines

WIDTH, HEIGHT = 640, 480
FX = FY = 500.0
CX, CY = 320.0, 240.0
N_FRAMES = 60


def make_cfg():
    return SystemConfig(
        sensor=Sensor.IMU_MONOCULAR,
        camera=CameraConfig(width=WIDTH, height=HEIGHT, fx=FX, fy=FY,
                            cx=CX, cy=CY, bf=0.0, fps=10.0),
        extractor=ExtractorConfig(n_features=1200),
        ba=BAConfig(max_local_kfs=8, max_local_points=2048,
                    local_ba_iters=6, inertial_window=8),
        map=MapConfig(max_keyframes=128, max_points=32768,
                      max_obs_per_point=8),
        imu=IMUConfig(freq=200.0),
        tracker=TrackerConfig(max_frames_between_kf=4),
    )


@pytest.fixture(scope="module")
def mono_vio_run():
    # strong excitation: metric scale is unobservable on a constant-
    # velocity path (the classic mono-inertial degenerate case)
    iw = synthetic.make_inertial_world(
        n_frames=N_FRAMES, fps=10.0, n_landmarks=8000, seed=3,
        excitation=4.0,
    )
    vo = MonoInertialVO(make_cfg())
    for i in range(N_FRAMES):
        fr = synthetic.render_oracle_frame(
            iw.world, i, FX, FY, CX, CY, 250.0, WIDTH, HEIGHT,
            max_features=1000, px_noise=0.3,
        )
        vo.process_oracle_mono_inertial(
            fr.xy, fr.desc, fr.level, iw.imu_per_frame[i],
            iw.timestamps[i],
        )
    vo.flush()
    return vo, iw


class TestMonoInertial:
    def test_initializes(self, mono_vio_run):
        vo, _ = mono_vio_run
        assert vo.imu_ready
        states = [r.state for r in vo.records]
        # frame 0 is the mono bootstrap reference (recorded pre-init)
        assert states.count("LOST") - states[:2].count("LOST") == 0
        assert states[-1] == "OK"

    def test_metric_scale_recovered(self, mono_vio_run):
        """The VERDICT done-criterion: mono-IMU recovers metric scale
        within 2%. After ApplyScaledRotation the Horn-with-scale fit of
        the estimated trajectory against metric ground truth must find a
        residual scale within 2% of 1."""
        vo, iw = mono_vio_run
        est = vo.trajectory_wc()
        ok = [i for i, r in enumerate(vo.records) if r.state == "OK"]
        res = evaluation.ate_rmse(
            est[ok, :3, 3], iw.world.poses_wc[ok, :3, 3], with_scale=True
        )
        assert abs(res["scale"] - 1.0) < 0.02, res["scale"]

    def test_metric_ate(self, mono_vio_run):
        """Scale applied: the UNSCALED Horn alignment must already fit."""
        vo, iw = mono_vio_run
        est = vo.trajectory_wc()
        ok = [i for i, r in enumerate(vo.records) if r.state == "OK"]
        res = evaluation.ate_rmse(
            est[ok, :3, 3], iw.world.poses_wc[ok, :3, 3], with_scale=False
        )
        assert res["rmse"] < 0.25, res

    def test_gravity_direction(self, mono_vio_run):
        vo, iw = mono_vio_run
        g = np.asarray(jax.device_get(vo.g_w_dev))
        cos = g @ iw.gravity_w / (
            np.linalg.norm(g) * np.linalg.norm(iw.gravity_w)
        )
        assert cos > np.cos(np.radians(2.0)), g

    def test_euroc_export(self, mono_vio_run, tmp_path):
        """Full-frame and KF-only EuRoC writers run on the real pipeline
        output and round-trip (SaveTrajectoryEuRoC /
        SaveKeyFrameTrajectoryEuRoC, system.cpp:480/:620)."""
        vo, _ = mono_vio_run
        est = vo.trajectory_wc()
        ts = [r.timestamp for r in vo.records]
        p = tmp_path / "traj_euroc.csv"
        trajectory.save_euroc(str(p), ts, est)
        ts2, back = trajectory.load_euroc(str(p))
        assert len(back) == len(est)
        np.testing.assert_allclose(back[5], est[5], atol=1e-5)
        kf_ts, kf_poses = trajectory.keyframe_trajectory(vo)
        assert len(kf_poses) >= 3
        p2 = tmp_path / "kf_euroc.csv"
        trajectory.save_euroc(str(p2), kf_ts, kf_poses)
        assert p2.read_text().count("\n") == len(kf_poses) + 1
