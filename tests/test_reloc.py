"""PnP RANSAC + relocalization tests.

PnP: recover a known pose from 2D-3D matches under outliers
(MLPnPsolver::iterate capability). Relocalization: a kidnapped tracker
recovers its pose from the keyframe database (Tracking::Relocalization
recovery ladder, tracking.cpp:3456).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.test_vo_oracle as tvo
from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.cameras import pinhole
from vi_slam_tpu.io import synthetic
from vi_slam_tpu.lie import so3
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.optim.pnp import pnp_ransac
from vi_slam_tpu.pipeline.stereo_vo import StereoVO
from vi_slam_tpu.retrieval import vocabulary as voc


def test_pnp_ransac_recovers_pose():
    rng = np.random.default_rng(0)
    cam = CameraParams.make(500.0, 500.0, 320.0, 240.0)
    n = 200
    xw = np.stack(
        [rng.uniform(-5, 5, n), rng.uniform(-4, 4, n), rng.uniform(4, 20, n)],
        axis=1,
    )
    R = np.asarray(so3.exp(jnp.asarray([0.1, -0.2, 0.05])))
    t = np.asarray([0.4, -0.3, 1.2])
    T = SE3(jnp.asarray(R), jnp.asarray(t))
    pc = T.apply(jnp.asarray(xw))
    uv = np.array(pinhole.project(cam, pc))
    uv += rng.normal(size=uv.shape) * 0.3
    # 30% outliers
    n_out = 60
    idx = rng.choice(n, n_out, replace=False)
    uv[idx] += rng.uniform(20, 100, size=(n_out, 2))
    res = pnp_ransac(
        cam, jnp.asarray(xw), jnp.asarray(uv), jnp.ones((n,), bool),
        jnp.ones((n,)), jax.random.PRNGKey(1),
    )
    assert bool(res.ok)
    assert int(res.n_inliers) > 0.55 * n
    dR = np.asarray(res.T_cw.R) @ R.T
    assert np.linalg.norm(np.asarray(so3.log(jnp.asarray(dR)))) < 0.01
    np.testing.assert_allclose(np.asarray(res.T_cw.t), t, atol=0.05)


@pytest.fixture(scope="module")
def kidnapped_run():
    """Stereo VO with vocab; tracker is kidnapped (garbage frames), then
    returned to a previously mapped view."""
    n_frames = 20
    world = synthetic.make_landmark_world(
        n_frames=n_frames, n_landmarks=4000, seed=0, speed=0.8,
    )
    vocab = voc.train_vocabulary(world.desc[:3000], k=6, levels=3, iters=3)
    vo = StereoVO(tvo.make_cfg(), vocab=vocab)
    rng = np.random.default_rng(5)
    frames = [
        synthetic.render_oracle_frame(
            world, i, tvo.FX, tvo.FY, tvo.CX, tvo.CY, tvo.BF,
            tvo.WIDTH, tvo.HEIGHT, max_features=1000, px_noise=0.3,
        )
        for i in range(n_frames)
    ]
    for i in range(14):
        fr = frames[i]
        vo.process_oracle(fr.xy, fr.uright, fr.depth, fr.desc, fr.level, i * 0.1)
    assert vo.state == "OK"
    # kidnap: two frames of random garbage
    for i in range(2):
        xy = rng.uniform(0, 600, size=(500, 2))
        desc = rng.integers(0, 2**32, size=(500, 8), dtype=np.uint32)
        vo.process_oracle(
            xy, np.full((500,), -1.0), np.full((500,), -1.0), desc,
            np.zeros((500,), np.int32), (14 + i) * 0.1,
        )
    states_mid = vo.state
    # return to the view of frame 6 (already mapped)
    fr = frames[6]
    vo.process_oracle(fr.xy, fr.uright, fr.depth, fr.desc, fr.level, 1.7)
    return vo, world, states_mid


def test_kidnap_then_relocalize(kidnapped_run):
    vo, world, states_mid = kidnapped_run
    # 0.2 s of garbage is inside the RECENTLY_LOST grace window
    # (tracking.cpp:1816-1888 time_recently_lost semantics)
    assert states_mid == "RECENTLY_LOST"
    assert vo.state == "OK", "relocalization failed"
    # recovered pose must match the map's own estimate of frame 6 (the
    # map carries its accumulated drift; relocalization is consistent
    # with the map, not with absolute ground truth)
    Twc = np.linalg.inv(vo.T_np)
    est6 = vo.trajectory_wc()[6]
    err_map = np.linalg.norm(Twc[:3, 3] - est6[:3, 3])
    assert err_map < 0.1, err_map
    err_gt = np.linalg.norm(Twc[:3, 3] - world.poses_wc[6][:3, 3])
    assert err_gt < 0.5, err_gt
