"""Mapping-rate duplicate fusion (SearchInNeighbors / Fuse,
/root/reference/src/core/localmapping.cpp:722 + fmatcher.cpp:1918) and
the shared MapPoint::Replace merge kernel (mappoint.cpp).
"""

import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.pipeline import steps
from vi_slam_tpu.slam_map import state as map_state


def _mini_map():
    """Two keyframes looking at the same 3 physical points; KF1 owns
    duplicate entries for two of them (ids 3, 4 duplicate ids 0, 1)."""
    st = map_state.allocate(4, 16, 32, 8)
    rng = np.random.default_rng(0)
    pts = np.array([[0.0, 0.0, 5.0], [1.0, 0.5, 6.0], [-1.0, -0.5, 7.0]])
    desc = rng.integers(0, 2**32, size=(3, 8), dtype=np.uint32)

    kf_R = np.tile(np.eye(3, dtype=np.float32), (4, 1, 1))
    kf_t = np.zeros((4, 3), np.float32)
    kf_t[1, 0] = -0.5  # KF1 shifted
    kf_valid = np.array([True, True, False, False])

    cam = CameraParams.make(300.0, 300.0, 160.0, 120.0, bf=0.0)
    kf_xy = np.zeros((4, 16, 2), np.float32)
    kf_desc = np.zeros((4, 16, 8), np.uint32)
    kf_kp_valid = np.zeros((4, 16), bool)
    kf_mp = np.full((4, 16), -1, np.int32)

    mp_pos = np.zeros((32, 3), np.float32)
    mp_desc = np.zeros((32, 8), np.uint32)
    mp_valid = np.zeros((32,), bool)
    mp_obs_kf = np.full((32, 8), -1, np.int32)
    mp_obs_idx = np.full((32, 8), -1, np.int32)
    mp_n_obs = np.zeros((32,), np.int32)
    # scale range consistent with a level-0 observation at the true
    # distance (PredictScale must land on the keypoint's level)
    mp_max = np.full((32,), 1.0, np.float32)

    # KF0 observes points 0,1,2 at kp 0,1,2
    for i in range(3):
        pc = pts[i]
        kf_xy[0, i] = [300 * pc[0] / pc[2] + 160, 300 * pc[1] / pc[2] + 120]
        kf_desc[0, i] = desc[i]
        kf_kp_valid[0, i] = True
        kf_mp[0, i] = i
        mp_pos[i] = pts[i]
        mp_desc[i] = desc[i]
        mp_valid[i] = True
        mp_obs_kf[i, 0] = 0
        mp_obs_idx[i, 0] = i
        mp_n_obs[i] = 1
        mp_max[i] = np.linalg.norm(pts[i])

    # KF1 observes the same physical points at kp 0,1,2 but holds
    # duplicate map entries 3,4 for physical 0,1 — and the true id 2
    # for physical 2 (so KF1 observes BOTH sides for id 2's test case)
    for i, mid in enumerate([3, 4, 2]):
        pc = pts[i] + np.array([-0.5, 0.0, 0.0])  # Tcw: pc = p + t, t=[-0.5,0,0]
        kf_xy[1, i] = [300 * pc[0] / pc[2] + 160, 300 * pc[1] / pc[2] + 120]
        kf_desc[1, i] = desc[i]
        kf_kp_valid[1, i] = True
        kf_mp[1, i] = mid
        if mid >= 3:
            mp_pos[mid] = pts[i] + rng.normal(0, 0.01, 3)
            mp_desc[mid] = desc[i]
            mp_valid[mid] = True
            mp_max[mid] = np.linalg.norm(pts[i])
        mp_obs_kf[mid, mp_n_obs[mid]] = 1
        mp_obs_idx[mid, mp_n_obs[mid]] = i
        mp_n_obs[mid] += 1

    st = st._replace(
        kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
        kf_valid=jnp.asarray(kf_valid),
        kf_xy=jnp.asarray(kf_xy), kf_desc=jnp.asarray(kf_desc),
        kf_kp_valid=jnp.asarray(kf_kp_valid), kf_mp=jnp.asarray(kf_mp),
        mp_pos=jnp.asarray(mp_pos), mp_desc=jnp.asarray(mp_desc),
        mp_valid=jnp.asarray(mp_valid),
        mp_obs_kf=jnp.asarray(mp_obs_kf),
        mp_obs_idx=jnp.asarray(mp_obs_idx),
        mp_n_obs=jnp.asarray(mp_n_obs),
        mp_max_dist=jnp.asarray(mp_max),
        mp_ref_kf=jnp.asarray(
            np.where(mp_valid, 0, -1).astype(np.int32)
        ),
    )
    return cam, st


def test_fuse_points_merges_and_remaps():
    cam, st = _mini_map()
    # merge 3 -> 0 and 4 -> 1
    out = map_state.fuse_points(
        st,
        jnp.asarray([3, 4], jnp.int32),
        jnp.asarray([0, 1], jnp.int32),
        jnp.asarray([True, True]),
    )
    v = np.asarray(out.mp_valid)
    assert not v[3] and not v[4]
    assert v[0] and v[1]
    # KF1's keypoints now reference the winners
    row = np.asarray(out.kf_mp)[1]
    assert row[0] == 0 and row[1] == 1
    # winners gained KF1's observation
    n = np.asarray(out.mp_n_obs)
    assert n[0] == 2 and n[1] == 2
    okf = np.asarray(out.mp_obs_kf)
    assert set(okf[0][:2]) == {0, 1}


def test_fuse_points_erases_duplicate_observation():
    """A KF observing both loser and winner keeps only the winner's
    keypoint (MapPoint::Replace duplicate-obs erasure)."""
    cam, st = _mini_map()
    # make KF1 observe BOTH 2 (at kp 2) and a duplicate 5 of the same
    # physical point at kp 3
    kf_mp = np.array(st.kf_mp)
    kf_mp[1, 3] = 5
    kp_valid = np.array(st.kf_kp_valid)
    kp_valid[1, 3] = True
    mp_valid = np.array(st.mp_valid)
    mp_valid[5] = True
    mp_obs_kf = np.array(st.mp_obs_kf)
    mp_obs_idx = np.array(st.mp_obs_idx)
    mp_n = np.array(st.mp_n_obs)
    mp_obs_kf[5, 0] = 1
    mp_obs_idx[5, 0] = 3
    mp_n[5] = 1
    st = st._replace(
        kf_mp=jnp.asarray(kf_mp), kf_kp_valid=jnp.asarray(kp_valid),
        mp_valid=jnp.asarray(mp_valid), mp_obs_kf=jnp.asarray(mp_obs_kf),
        mp_obs_idx=jnp.asarray(mp_obs_idx), mp_n_obs=jnp.asarray(mp_n),
    )
    out = map_state.fuse_points(
        st, jnp.asarray([5], jnp.int32), jnp.asarray([2], jnp.int32),
        jnp.asarray([True]),
    )
    # loser dead; winner did NOT gain a second KF1 obs; kp 3 cleared
    assert not bool(out.mp_valid[5])
    n2 = int(out.mp_n_obs[2])
    okf2 = np.asarray(out.mp_obs_kf)[2][:n2]
    assert list(okf2).count(1) == 1
    assert int(np.asarray(out.kf_mp)[1, 3]) == -1
    assert int(np.asarray(out.kf_mp)[1, 2]) == 2


def test_fuse_pair_dir_merges_duplicates_and_adds_obs():
    cam, st = _mini_map()
    # project KF0's points (true ids 0,1,2) into KF1: kps 0,1 hold
    # duplicates 3,4 -> merge; for id 2 KF1 already holds it -> no-op
    out = steps.fuse_pair_dir(
        cam, st, jnp.int32(0), jnp.int32(1), jnp.asarray(True),
        320.0, 240.0, max_fuse=8, radius=6.0,
    )
    v = np.asarray(out.mp_valid)
    # duplicates died (winner = 0/1, equal obs count -> a-side wins)
    assert v[[0, 1, 2]].all()
    assert not v[3] and not v[4]
    row = np.asarray(out.kf_mp)[1]
    assert row[0] == 0 and row[1] == 1 and row[2] == 2
    n = np.asarray(out.mp_n_obs)
    assert n[0] == 2 and n[1] == 2 and n[2] == 2


def test_fuse_neighbors_eliminates_duplicates():
    """Both directions run; ties favor the projected point (fmatcher.cpp
    Fuse: pMPinKF is replaced when observation counts tie), so exactly
    one of each duplicate pair survives with the union of observations."""
    cam, st = _mini_map()
    out = steps.fuse_neighbors(
        cam, st, jnp.int32(1), 320.0, 240.0, n_window=3, max_fuse=8,
        radius=6.0,
    )
    v = np.asarray(out.mp_valid)
    n = np.asarray(out.mp_n_obs)
    for pair in ([0, 3], [1, 4]):
        alive = [m for m in pair if v[m]]
        assert len(alive) == 1
        assert n[alive[0]] == 2
    assert v[2] and n[2] == 2
    # keyframe rows reference only live points
    row0 = np.asarray(out.kf_mp)[0]
    row1 = np.asarray(out.kf_mp)[1]
    for row in (row0, row1):
        held = row[row >= 0]
        assert v[held].all()
