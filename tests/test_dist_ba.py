"""Distributed BA on a virtual 8-device CPU mesh: must match single-chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_slam_tpu.cameras import CameraParams
from vi_slam_tpu.optim.local_ba import bundle_adjust
from vi_slam_tpu.parallel.dist_ba import dist_bundle_adjust
from vi_slam_tpu.parallel.mesh import make_mesh

from test_optim import CAM, synth_ba_problem


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestDistBA:
    def test_matches_single_chip(self):
        # 256 landmarks: divisible by 8
        prob_gt, prob0, poses_gt, pts_gt = synth_ba_problem(
            jax.random.PRNGKey(0), n_cams=6, n_pts=256, obs_per_pt=4
        )
        mesh = make_mesh(8)
        res_single = bundle_adjust(CAM, prob0, iters=8)
        res_dist = dist_bundle_adjust(CAM, prob0, mesh, iters=8)
        # identical math -> near-identical results (fp reduction order may
        # differ slightly across the psum)
        np.testing.assert_allclose(
            np.asarray(res_dist.cost), np.asarray(res_single.cost),
            rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(res_dist.poses.t), np.asarray(res_single.poses.t),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(res_dist.points), np.asarray(res_single.points),
            atol=1e-3,
        )

    def test_converges(self):
        prob_gt, prob0, poses_gt, pts_gt = synth_ba_problem(
            jax.random.PRNGKey(1), n_cams=8, n_pts=512, obs_per_pt=4
        )
        mesh = make_mesh(8)
        res = dist_bundle_adjust(CAM, prob0, mesh, iters=12)
        costs = np.asarray(res.cost)
        assert costs[-1] < costs[0] * 0.1
