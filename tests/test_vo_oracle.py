"""End-to-end stereo VO on the oracle-feature synthetic world."""

import numpy as np
import pytest

from vi_slam_tpu.io import evaluation, synthetic
from vi_slam_tpu.pipeline.stereo_vo import StereoVO
from vi_slam_tpu.utils.config import (
    BAConfig,
    CameraConfig,
    ExtractorConfig,
    MapConfig,
    SystemConfig,
)

WIDTH, HEIGHT = 640, 480
FX = FY = 500.0
CX, CY = 320.0, 240.0
BF = 250.0  # baseline 0.5m


def make_cfg():
    return SystemConfig(
        camera=CameraConfig(
            width=WIDTH, height=HEIGHT, fx=FX, fy=FY, cx=CX, cy=CY,
            bf=BF, th_depth=40.0,
        ),
        extractor=ExtractorConfig(n_features=1200),
        ba=BAConfig(max_local_kfs=8, max_local_points=2048, local_ba_iters=6),
        map=MapConfig(max_keyframes=128, max_points=32768, max_obs_per_point=8),
    )


def run_vo(n_frames=40, speed=0.8, px_noise=0.3, seed=0):
    world = synthetic.make_landmark_world(
        n_frames=n_frames, n_landmarks=4000, seed=seed, speed=speed,
    )
    vo = StereoVO(make_cfg())
    for i in range(n_frames):
        fr = synthetic.render_oracle_frame(
            world, i, FX, FY, CX, CY, BF, WIDTH, HEIGHT,
            max_features=1000, px_noise=px_noise,
        )
        vo.process_oracle(fr.xy, fr.uright, fr.depth, fr.desc, fr.level, i * 0.1)
    return vo, world


@pytest.fixture(scope="module")
def vo_run():
    return run_vo()


class TestOracleVO:
    def test_tracks_all_frames(self, vo_run):
        vo, world = vo_run
        states = [r.state for r in vo.records]
        assert states.count("LOST") == 0, states
        assert vo.n_kf >= 3
        assert vo.n_mp > 500

    def test_ate_small(self, vo_run):
        vo, world = vo_run
        est = vo.trajectory_wc()
        gt = world.poses_wc
        assert est.shape[0] == gt.shape[0]
        res = evaluation.ate_rmse(est[:, :3, 3], gt[:, :3, 3])
        # ~31m trajectory; oracle features with 0.3px noise should give
        # centimetre-level drift
        assert res["rmse"] < 0.30, res

    def test_inlier_counts_healthy(self, vo_run):
        vo, world = vo_run
        # every tracked (non-init) frame should have a healthy inlier count
        inl = [s.n_inliers for s in vo.stats[1:]]
        assert inl, "no tracked frames"
        assert min(inl) >= 30, inl
        assert np.median(inl) >= 100, inl
        # forward progress: the camera should have moved roughly n*speed
        est = vo.trajectory_wc()
        dist = np.linalg.norm(est[-1, :3, 3] - est[0, :3, 3])
        assert dist > 20.0, dist
