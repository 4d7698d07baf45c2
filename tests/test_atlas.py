"""Atlas multi-map tests: map fork on persistent loss, cross-map
common-region detection, and MergeLocal welding.

Semantic reference: `Atlas` (`/root/reference/src/datastructures/atlas.cpp:45`),
`Tracking::CreateMapInAtlas` (tracking.cpp:3686) and
`LoopClosing::MergeLocal` (loopclosing.cpp:1021): kidnap the tracker past
the relocalization grace, verify a fresh map is created, revisit the old
map's region, and verify the maps weld into one consistent trajectory.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import tests.test_vo_oracle as tvo
from vi_slam_tpu.io import evaluation, synthetic
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.lie.sim3 import Sim3
from vi_slam_tpu.pipeline.stereo_vo import StereoVO
from vi_slam_tpu.retrieval import vocabulary as voc
from vi_slam_tpu.slam_map import atlas, state as map_state
from vi_slam_tpu.utils.config import TrackerConfig


def test_merge_into_offsets_and_transform():
    """merge_into relabels slots/ids by constant offsets and applies the
    Sim3 weld to poses and points."""
    A = map_state.allocate(8, 16, 64, 4)
    A = A._replace(
        kf_count=jnp.asarray([2], jnp.int32),
        mp_count=jnp.asarray([5], jnp.int32),
        kf_valid=A.kf_valid.at[:2].set(True),
        mp_valid=A.mp_valid.at[:5].set(True),
    )
    B = map_state.allocate(8, 16, 64, 4)
    B = B._replace(
        kf_count=jnp.asarray([1], jnp.int32),
        mp_count=jnp.asarray([3], jnp.int32),
        kf_valid=B.kf_valid.at[0].set(True),
        mp_valid=B.mp_valid.at[:3].set(True),
        kf_mp=B.kf_mp.at[0, 0].set(2),
        mp_obs_kf=B.mp_obs_kf.at[2, 0].set(0),
        mp_obs_idx=B.mp_obs_idx.at[2, 0].set(0),
        mp_n_obs=B.mp_n_obs.at[2].set(1),
        mp_pos=B.mp_pos.at[2].set(jnp.asarray([3.0, 2.0, 1.0])),
        mp_ref_kf=B.mp_ref_kf.at[2].set(0),
    )
    S = Sim3(jnp.eye(3), jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray(1.0))
    m = atlas.merge_into(A, B, S, jnp.int32(2), jnp.int32(5))
    assert int(m.kf_count[0]) == 3
    assert int(m.mp_count[0]) == 8
    assert bool(m.kf_valid[2])
    assert int(m.kf_mp[2, 0]) == 7  # mp id 2 + offset 5
    assert int(m.mp_obs_kf[7, 0]) == 2  # kf slot 0 + offset 2
    assert int(m.mp_ref_kf[7]) == 2
    np.testing.assert_allclose(
        np.asarray(m.mp_pos[7]), [4.0, 2.0, 1.0], atol=1e-6
    )
    # Tcw' = Tcw ∘ S^-1: identity pose in a world shifted +x has t = -x
    np.testing.assert_allclose(
        np.asarray(m.kf_t[2]), [-1.0, 0.0, 0.0], atol=1e-6
    )


def test_weld_transform_identity():
    """Same camera pose in both maps with identity camera Sim3 => the
    worlds already coincide."""
    T = SE3(jnp.eye(3), jnp.asarray([0.3, -0.2, 1.0]))
    S_cl = Sim3(jnp.eye(3), jnp.zeros(3), jnp.asarray(1.0))
    S = atlas.weld_transform(S_cl, T, T)
    np.testing.assert_allclose(np.asarray(S.R), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(S.t), np.zeros(3), atol=1e-6)
    np.testing.assert_allclose(float(S.s), 1.0, atol=1e-6)


@pytest.fixture(scope="module")
def atlas_run():
    """Map A (frames 0..15) -> long kidnap (past grace + atlas window)
    -> map B initialized on a revisit of frame 6's view -> merge."""
    n_frames = 16
    world = synthetic.make_landmark_world(
        n_frames=n_frames, n_landmarks=4000, seed=0, speed=0.8,
    )
    vocab = voc.train_vocabulary(world.desc[:3000], k=6, levels=3, iters=3)
    cfg = dataclasses.replace(
        tvo.make_cfg(),
        tracker=TrackerConfig(
            recently_lost_sec=0.3, atlas_lost_sec=0.3,
            max_frames_between_kf=3,
        ),
    )
    vo = StereoVO(cfg, vocab=vocab)
    frames = [
        synthetic.render_oracle_frame(
            world, i, tvo.FX, tvo.FY, tvo.CX, tvo.CY, tvo.BF,
            tvo.WIDTH, tvo.HEIGHT, max_features=1000, px_noise=0.3,
        )
        for i in range(n_frames)
    ]
    for i in range(n_frames):
        fr = frames[i]
        vo.process_oracle(fr.xy, fr.uright, fr.depth, fr.desc, fr.level,
                          i * 0.1)
    assert vo.state == "OK"
    # kidnap: garbage until well past grace + atlas window
    rng = np.random.default_rng(5)
    forked = False
    for g in range(10):
        xy = rng.uniform(0, 600, size=(500, 2))
        desc = rng.integers(0, 2**32, size=(500, 8), dtype=np.uint32)
        vo.process_oracle(
            xy, np.full((500,), -1.0), np.full((500,), -1.0), desc,
            np.zeros((500,), np.int32), (n_frames + g) * 0.1,
        )
        forked = forked or vo.active_map_id != 0
    # revisit frames 6..15: map B bootstraps, then welds into map A
    t0 = (n_frames + 10) * 0.1
    for k, i in enumerate(range(6, 16)):
        fr = frames[i]
        vo.process_oracle(fr.xy, fr.uright, fr.depth, fr.desc, fr.level,
                          t0 + k * 0.1)
    vo.flush()
    return vo, world, forked


def test_fork_creates_new_map(atlas_run):
    vo, world, forked = atlas_run
    assert forked, "tracker never forked a new Atlas map while lost"


def test_maps_merge_back(atlas_run):
    vo, world, forked = atlas_run
    assert not vo.atlas_stored, "stored map was never merged back"
    assert vo.active_map_id == 0, "active map should be the original"
    assert vo.state == "OK"


def test_merged_trajectory_consistent(atlas_run):
    """After the weld, the revisit frames land on the original map's
    estimates of the same views (single consistent world)."""
    vo, world, _ = atlas_run
    est = vo.trajectory_wc()
    # map A segment tracks ground truth
    ate_a = evaluation.ate_rmse(
        est[:16, :3, 3], world.poses_wc[:16, :3, 3]
    )
    assert ate_a["rmse"] < 0.3, ate_a
    # revisit segment (post-weld world) matches ground truth too
    rev = est[26:36, :3, 3]
    gt = world.poses_wc[6:16, :3, 3]
    err = np.linalg.norm(rev - gt, axis=1)
    assert float(np.median(err)) < 0.5, err
