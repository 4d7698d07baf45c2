"""End-to-end KLT (track-then-redetect) stereo VO frontend.

Covers pipeline/klt_vo.py: the vilib feature-tracker capability
(feature_tracker_gpu.cpp track/respawn lifecycle) driving the full VO
stack — LK tracking between keyframes, ORB redetect + track respawn at
keyframes, descriptor rescue on consensus collapse.
"""

import numpy as np
import pytest

from vi_slam_tpu.io import evaluation, synthetic
from vi_slam_tpu.pipeline.klt_vo import KltStereoVO, make_stereo_vo
from vi_slam_tpu.pipeline.stereo_vo import StereoVO
from vi_slam_tpu.utils.config import (
    BAConfig,
    CameraConfig,
    ExtractorConfig,
    MapConfig,
    SystemConfig,
    TrackerConfig,
)

W, H = 512, 384
FX = FY = 450.0
CX, CY = W / 2, H / 2
BASE = 0.5
BF = FX * BASE
N_FRAMES = 18


def make_cfg(frontend="klt"):
    return SystemConfig(
        camera=CameraConfig(width=W, height=H, fx=FX, fy=FY, cx=CX, cy=CY,
                            bf=BF, th_depth=45.0),
        extractor=ExtractorConfig(n_features=1000),
        ba=BAConfig(max_local_kfs=8, max_local_points=2048,
                    local_ba_iters=6),
        map=MapConfig(max_keyframes=64, max_points=16384,
                      max_obs_per_point=8),
        tracker=TrackerConfig(frontend=frontend),
    )


@pytest.mark.slow
def test_klt_frontend_tracks_billboard_world():
    world = synthetic.make_billboard_world(
        n_frames=N_FRAMES, n_boards=2000, seed=3
    )
    vo = make_stereo_vo(make_cfg())
    assert isinstance(vo, KltStereoVO)
    for i in range(N_FRAMES):
        imgL = synthetic.render_billboard_image(
            world, world.poses_wc[i], FX, FY, CX, CY, W, H, baseline=0.0
        )
        imgR = synthetic.render_billboard_image(
            world, world.poses_wc[i], FX, FY, CX, CY, W, H, baseline=BASE
        )
        vo.process_stereo(imgL, imgR, i * 0.1)
    vo.flush()
    states = [r.state for r in vo.records]
    assert states.count("LOST") == 0
    traj = vo.trajectory_wc()
    ate = evaluation.ate_rmse(
        traj[:, :3, 3], world.poses_wc[: len(traj), :3, 3]
    )
    assert ate["rmse"] < 0.10, ate


def test_frontend_dispatch_default_orb():
    vo = make_stereo_vo(make_cfg(frontend="orb"))
    assert type(vo) is StereoVO
