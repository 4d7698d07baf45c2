"""Fisheye (KB8) end-to-end tests: stereo triangulation and full VO.

Semantic reference: `KannalaBrandt8::TriangulateMatches`
(`/root/reference/include/vi_slam/geometry/cameramodels/kannalabrandt8.h:87`)
and the abstract-camera dispatch of the tracking/BA stack
(`camera.h:38-111`): the same pipeline must track through either model.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vi_slam_tpu.cameras import kb8
from vi_slam_tpu.cameras.base import KB8Params
from vi_slam_tpu.io import evaluation, synthetic
from vi_slam_tpu.pipeline.stereo_vo import StereoVO
from vi_slam_tpu.utils.config import (
    BAConfig, CameraConfig, ExtractorConfig, MapConfig, SystemConfig,
)

W, H = 640, 480
FX = FY = 300.0
CX, CY = 320.0, 240.0
DIST = (0.05, 0.01, 0.002, 0.001)
BASELINE = 0.5
BF = BASELINE * FX


def make_cam():
    return KB8Params.make(FX, FY, CX, CY, dist=DIST, bf=BF)


def test_triangulate_matches_roundtrip():
    """Project random points into a lateral KB8 rig, triangulate back."""
    cam = make_cam()
    rng = np.random.default_rng(0)
    n = 200
    pts = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
         rng.uniform(2, 20, n)], axis=1,
    ).astype(np.float32)
    uvL = kb8.project(cam, jnp.asarray(pts))
    pts_r = pts - np.asarray([BASELINE, 0.0, 0.0], np.float32)
    uvR = kb8.project(cam, jnp.asarray(pts_r))
    z = kb8.triangulate_matches(cam, uvL, uvR, jnp.asarray(BASELINE))
    z = np.asarray(z)
    ok = z > 0
    assert ok.mean() > 0.95, ok.mean()
    np.testing.assert_allclose(z[ok], pts[ok, 2], rtol=5e-3)


def test_kb8_stereo_jac_vs_autodiff():
    import jax

    cam = make_cam()
    x = jnp.asarray([0.7, -0.4, 3.0])
    J = kb8.stereo_project_jac(cam, x)
    Jad = jax.jacobian(lambda p: kb8.stereo_project(cam, p))(x)
    np.testing.assert_allclose(np.asarray(J), np.asarray(Jad), atol=1e-4)


@pytest.fixture(scope="module")
def fisheye_run():
    n_frames = 20
    world = synthetic.make_landmark_world(
        n_frames=n_frames, n_landmarks=4000, seed=2, speed=0.8,
    )
    cfg = SystemConfig(
        camera=CameraConfig(
            model="kb8", width=W, height=H, fx=FX, fy=FY, cx=CX, cy=CY,
            dist=DIST, bf=BF, th_depth=40.0,
        ),
        extractor=ExtractorConfig(n_features=1200),
        ba=BAConfig(max_local_kfs=8, max_local_points=2048,
                    local_ba_iters=6),
        map=MapConfig(max_keyframes=128, max_points=32768,
                      max_obs_per_point=8),
    )
    vo = StereoVO(cfg)
    cam = vo.cam
    assert isinstance(cam, KB8Params)
    for i in range(n_frames):
        fr = synthetic.render_oracle_frame_fisheye(
            world, i, cam, BF, W, H, max_features=1000, px_noise=0.3,
        )
        vo.process_oracle(fr.xy, fr.uright, fr.depth, fr.desc, fr.level,
                          i * 0.1)
    return vo, world


def test_kb8_vo_tracks(fisheye_run):
    vo, world = fisheye_run
    assert vo.state == "OK"
    lost = sum(1 for r in vo.records if r.state != "OK")
    assert lost == 0, f"{lost} lost frames"


def test_kb8_vo_ate(fisheye_run):
    vo, world = fisheye_run
    est = vo.trajectory_wc()
    ate = evaluation.ate_rmse(est[:, :3, 3], world.poses_wc[:, :3, 3])
    assert ate["rmse"] < 0.3, ate
