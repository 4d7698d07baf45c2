"""End-to-end monocular VO on the oracle-feature synthetic world.

Monocular capability check (TrackMonocular path): two-view bootstrap,
triangulated landmark growth, and up-to-scale trajectory accuracy
(evaluate_ate_scale.py protocol — Horn alignment WITH scale).
"""

import numpy as np
import pytest

from vi_slam_tpu.io import evaluation, synthetic
from vi_slam_tpu.pipeline.mono_vo import MonoVO
from vi_slam_tpu.utils.config import (
    BAConfig,
    CameraConfig,
    ExtractorConfig,
    MapConfig,
    Sensor,
    SystemConfig,
    TrackerConfig,
)

WIDTH, HEIGHT = 640, 480
FX = FY = 500.0
CX, CY = 320.0, 240.0


def make_cfg():
    return SystemConfig(
        sensor=Sensor.MONOCULAR,
        camera=CameraConfig(
            width=WIDTH, height=HEIGHT, fx=FX, fy=FY, cx=CX, cy=CY, bf=0.0,
        ),
        extractor=ExtractorConfig(n_features=1200),
        tracker=TrackerConfig(max_frames_between_kf=5),
        ba=BAConfig(max_local_kfs=8, max_local_points=2048, local_ba_iters=6),
        map=MapConfig(max_keyframes=128, max_points=32768, max_obs_per_point=8),
    )


@pytest.fixture(scope="module")
def mono_run():
    n_frames = 30
    # extend the corridor past the run so late frames keep feature density
    # (forward-motion mono needs it; the stereo test tolerates sparsity)
    world = synthetic.make_landmark_world(
        n_frames=n_frames + 10, n_landmarks=8000, seed=3, speed=0.8,
    )
    vo = MonoVO(make_cfg())
    for i in range(n_frames):
        fr = synthetic.render_oracle_frame(
            world, i, FX, FY, CX, CY, 250.0, WIDTH, HEIGHT,
            max_features=1000, px_noise=0.3,
        )
        vo.process_oracle_mono(fr.xy, fr.desc, fr.level, i * 0.1)
    return vo, world


class TestMonoVO:
    def test_initializes_and_tracks(self, mono_run):
        vo, world = mono_run
        states = [r.state for r in vo.records]
        assert vo.state == "OK"
        # init needs parallax; must be done within the first ~10 frames
        first_ok = states.index("OK")
        assert first_ok < 10
        assert states[first_ok:].count("LOST") == 0
        assert vo.n_kf >= 3
        assert vo.n_mp > 300

    def test_ate_up_to_scale(self, mono_run):
        vo, world = mono_run
        est = vo.trajectory_wc()
        ok_idx = [i for i, r in enumerate(vo.records) if r.state == "OK"]
        est_pos = est[ok_idx, :3, 3]
        gt_pos = world.poses_wc[ok_idx, :3, 3]
        res = evaluation.ate_rmse(est_pos, gt_pos, with_scale=True)
        # the reference's mono KITTI runs are scored the same way; sub-1%
        # of trajectory length on clean synthetic data
        traj_len = np.linalg.norm(np.diff(gt_pos, axis=0), axis=1).sum()
        assert res["rmse"] < max(0.015 * traj_len, 0.05), res

    def test_scale_is_free(self, mono_run):
        """Mono scale is arbitrary: Horn scale should differ from 1 but the
        scaled fit must be tight (validates with_scale path)."""
        vo, world = mono_run
        est = vo.trajectory_wc()
        ok_idx = [i for i, r in enumerate(vo.records) if r.state == "OK"]
        res = evaluation.ate_rmse(
            est[ok_idx, :3, 3], world.poses_wc[ok_idx, :3, 3], with_scale=True
        )
        assert res["scale"] > 0
