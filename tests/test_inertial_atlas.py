"""Inertial Atlas: fork on loss, weld back with gravity-consistent states.

Semantic reference: the inertial merge path — `LoopClosing::MergeLocal2`
(loopclosing.cpp:1021 dispatch) + `Optimizer::MergeInertialBA`
(optimizer.cpp:6129) — and forced reset on divergent IMU
(`mbBadImu`, localmapping.cpp:120-128, tracking.cpp:1670-1675).

Scenario: a stereo-inertial run initializes its IMU (gravity, biases,
velocities), is kidnapped past the relocalization grace so the Atlas
forks a fresh map, then revisits known terrain; the merge must weld the
fresh map into the stored one and restore an inertial state whose
gravity matches the world's.
"""

import dataclasses

import numpy as np
import jax
import pytest

from vi_slam_tpu.io import evaluation, synthetic
from vi_slam_tpu.pipeline.vio import StereoInertialVO
from vi_slam_tpu.retrieval import vocabulary as voc
from vi_slam_tpu.utils.config import (
    BAConfig, CameraConfig, ExtractorConfig, IMUConfig, MapConfig,
    SystemConfig, TrackerConfig,
)

pytestmark = pytest.mark.slow  # multi-minute image/e2e pipelines

WIDTH, HEIGHT = 640, 480
FX = FY = 500.0
CX, CY = 320.0, 240.0
BF = 250.0


def make_cfg():
    return SystemConfig(
        camera=CameraConfig(width=WIDTH, height=HEIGHT, fx=FX, fy=FY,
                            cx=CX, cy=CY, bf=BF, th_depth=40.0, fps=10.0),
        extractor=ExtractorConfig(n_features=1200),
        ba=BAConfig(max_local_kfs=8, max_local_points=2048,
                    local_ba_iters=6, inertial_window=8),
        map=MapConfig(max_keyframes=128, max_points=32768,
                      max_obs_per_point=8),
        imu=IMUConfig(freq=200.0),
        tracker=TrackerConfig(
            max_frames_between_kf=3, recently_lost_sec=0.3,
            atlas_lost_sec=0.3,
        ),
    )


@pytest.fixture(scope="module")
def weld_run():
    n_a = 30  # phase A long enough for inertial init (>2 s span)
    n_kidnap = 8
    iw = synthetic.make_inertial_world(
        n_frames=n_a + n_kidnap + 16, fps=10.0, n_landmarks=5000, seed=3
    )
    world = iw.world
    vocab = voc.train_vocabulary(world.desc[:3000], k=6, levels=3, iters=3)
    vo = StereoInertialVO(make_cfg(), vocab=vocab)

    frames = [
        synthetic.render_oracle_frame(
            world, i, FX, FY, CX, CY, BF, WIDTH, HEIGHT,
            max_features=1000, px_noise=0.3,
        )
        for i in range(n_a)
    ]
    for i in range(n_a):
        fr = frames[i]
        vo.process_oracle_inertial(
            fr.xy, fr.uright, fr.depth, fr.desc, fr.level,
            iw.imu_per_frame[i], iw.timestamps[i],
        )
    imu_ready_a = vo.imu_ready
    g_a = np.asarray(jax.device_get(vo.g_w_dev))

    # kidnap: garbage features, real IMU, continuous time
    rng = np.random.default_rng(5)
    for g in range(n_kidnap):
        i = n_a + g
        xy = rng.uniform(0, 600, size=(400, 2))
        desc = rng.integers(0, 2**32, size=(400, 8), dtype=np.uint32)
        vo.process_oracle_inertial(
            xy, np.full((400,), -1.0), np.full((400,), -1.0), desc,
            np.zeros((400,), np.int32), iw.imu_per_frame[i],
            iw.timestamps[i],
        )
    forked = vo.active_map_id != 0

    # revisit: views of frames 6..15 at continuing timestamps
    for k in range(10):
        fr = frames[6 + k]
        i = n_a + n_kidnap + k
        vo.process_oracle_inertial(
            fr.xy, fr.uright, fr.depth, fr.desc, fr.level,
            iw.imu_per_frame[i], iw.timestamps[i],
        )
    vo.flush()
    return vo, iw, forked, imu_ready_a, g_a


class TestInertialWeld:
    def test_phase_a_initialized(self, weld_run):
        _, iw, _, imu_ready_a, g_a = weld_run
        assert imu_ready_a
        cos = g_a @ iw.gravity_w / (
            np.linalg.norm(g_a) * np.linalg.norm(iw.gravity_w)
        )
        assert cos > np.cos(np.radians(2.0))

    def test_forked_then_merged(self, weld_run):
        vo, _, forked, _, _ = weld_run
        assert forked, "kidnap never forked a new Atlas map"
        assert not vo.atlas_stored, "stored inertial map never welded back"
        assert vo.active_map_id == 0

    def test_gravity_consistent_after_weld(self, weld_run):
        """The welded system must carry a world-frame gravity that still
        matches the true gravity (MergeInertialBA done-criterion)."""
        vo, iw, _, _, _ = weld_run
        assert vo.imu_ready
        g = np.asarray(jax.device_get(vo.g_w_dev))
        cos = g @ iw.gravity_w / (
            np.linalg.norm(g) * np.linalg.norm(iw.gravity_w)
        )
        assert cos > np.cos(np.radians(3.0)), g

    def test_seam_masked_in_chain(self, weld_run):
        """The merge seam edge must be excluded from inertial BA windows
        (no physical preintegration across the time gap)."""
        vo, _, _, _, _ = weld_run
        assert len(vo._chain_breaks) >= 1
        win = np.asarray(vo.kf_chain[-8:], np.int32)
        pre_ok = vo._pre_ok(
            np.concatenate([win, -np.ones(max(0, 8 - len(win)), np.int32)]),
            8,
        )
        # if the window spans the seam, the seam edge is masked
        breaks_in = [s for s in win if int(s) in vo._chain_breaks]
        if breaks_in:
            assert not pre_ok.all()

    def test_phase_a_trajectory_survives_weld(self, weld_run):
        vo, iw, _, _, _ = weld_run
        est = vo.trajectory_wc()
        ate = evaluation.ate_rmse(
            est[:30, :3, 3], iw.world.poses_wc[:30, :3, 3]
        )
        assert ate["rmse"] < 0.25, ate


class TestBadImu:
    def test_bad_imu_forces_reset(self):
        """Feed visually consistent frames with garbage IMU: the staged
        initializer must repeatedly fail, flag bad_imu, and reset the
        active map instead of shipping a corrupt inertial state."""
        iw = synthetic.make_inertial_world(
            n_frames=60, fps=10.0, n_landmarks=5000, seed=3
        )
        vo = StereoInertialVO(make_cfg())
        rng = np.random.default_rng(11)
        resets = 0
        for i in range(60):
            fr = synthetic.render_oracle_frame(
                iw.world, i, FX, FY, CX, CY, BF, WIDTH, HEIGHT,
                max_features=1000, px_noise=0.3,
            )
            # garbage IMU: huge white noise, inconsistent with motion
            bogus = np.asarray(iw.imu_per_frame[i], np.float64).copy()
            if len(bogus):
                bogus[:, 1:4] = rng.normal(0, 40.0, bogus[:, 1:4].shape)
                bogus[:, 4:7] = rng.normal(0, 8.0, bogus[:, 4:7].shape)
            was_bad = vo.bad_imu
            vo.process_oracle_inertial(
                fr.xy, fr.uright, fr.depth, fr.desc, fr.level,
                bogus, iw.timestamps[i],
            )
            if was_bad and not vo.bad_imu:
                resets += 1
        assert resets >= 1 or vo.bad_imu, (
            "divergent IMU never triggered the bad-IMU reset"
        )
        # the pipeline must never have shipped an initialized state built
        # on the garbage stream without re-deriving it post-reset
        assert vo._init_stage <= 1
