"""Demo: two-view geometry + optimization through the public API.

Simulates a stereo rig observing a 3D scene from two poses, then drives:
feature-free geometric pipeline — triangulation from view 1, motion-only
pose optimization of view 2 (with injected outliers), and a small bundle
adjustment — reporting pose errors against ground truth.

Run:  python examples/two_view_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vi_slam_tpu.cameras import CameraParams, pinhole  # noqa: E402
from vi_slam_tpu.geometry import triangulate  # noqa: E402
from vi_slam_tpu.lie import se3  # noqa: E402
from vi_slam_tpu.lie.se3 import SE3  # noqa: E402
from vi_slam_tpu.optim.local_ba import BAProblem, bundle_adjust  # noqa: E402
from vi_slam_tpu.optim.pose_opt import PoseObs, pose_optimize  # noqa: E402

F32 = jnp.float32
CAM = CameraParams.make(718.856, 718.856, 607.19, 185.22, bf=386.14)
rng = np.random.default_rng(7)

# scene: 500 points, 5-50m ahead
pts = jnp.asarray(
    np.stack(
        [
            rng.uniform(-10, 10, 500),
            rng.uniform(-3, 3, 500),
            rng.uniform(5, 50, 500),
        ],
        axis=-1,
    ),
    dtype=F32,
)
T1 = SE3.identity()
T2_gt = se3.exp(jnp.asarray([-1.2, 0.02, 0.1, 0.01, 0.03, 0.005], F32))

# triangulate from two noiseless views -> should recover the scene
b1 = T1.apply(pts); b1 = b1 / b1[:, 2:3]
b2 = T2_gt.apply(pts); b2 = b2 / b2[:, 2:3]
xw = triangulate.triangulate_dlt(T1, T2_gt, b1, b2)
tri_err = float(jnp.median(jnp.linalg.norm(xw - pts, axis=-1)))
print(f"triangulation median error (noiseless): {tri_err:.2e} m")

# pose optimization of view 2 with noise + 25% outliers
uvr = pinhole.stereo_project(CAM, T2_gt.apply(pts))
uvr = uvr + jnp.asarray(rng.normal(0, 0.5, uvr.shape), F32)
n_out = 125
uvr = uvr.at[:n_out].add(jnp.asarray(rng.normal(0, 40, (n_out, 3)), F32))
obs = PoseObs(
    xw=pts, uvr=uvr, stereo=jnp.ones((500,), bool),
    sigma2=jnp.ones((500,), F32), valid=jnp.ones((500,), bool),
)
T_init = se3.retract_left(T2_gt, jnp.asarray(rng.normal(0, 0.05, 6), F32))
T_opt, inlier, n_in = pose_optimize(CAM, T_init, obs)
dT = T_opt.inverse().compose(T2_gt)
rot_err = float(jnp.linalg.norm(se3.log(dT)[3:]))
trans_err = float(jnp.linalg.norm(dT.t))
out_flagged = float((~np.asarray(inlier)[:n_out]).mean())
print(f"pose opt: rot_err={rot_err:.2e} rad  trans_err={trans_err:.2e} m  "
      f"inliers={int(n_in)}/500  outliers_rejected={100*out_flagged:.0f}%")

# small BA: 4 cameras, perturbed, first fixed
K, M, P = 4, 256, 4
xis = jnp.asarray([[-0.6 * k, 0, 0, 0, 0.01 * k, 0] for k in range(K)], F32)
poses_gt = se3.exp(xis)
obs_cam = jnp.asarray(rng.integers(0, K, (M, P)), jnp.int32)
pc = jnp.einsum("mpij,mj->mpi", poses_gt.R[obs_cam], pts[:M]) + poses_gt.t[obs_cam]
buvr = pinhole.stereo_project(CAM, pc) + jnp.asarray(rng.normal(0, 0.3, (M, P, 3)), F32)
prob = BAProblem(
    poses=se3.retract_left(
        poses_gt,
        jnp.asarray(rng.normal(0, 0.02, (K, 6)), F32).at[0].set(0.0),
    ),
    fixed=jnp.zeros((K,), bool).at[0].set(True),
    points=pts[:M] + jnp.asarray(rng.normal(0, 0.3, (M, 3)), F32),
    point_valid=jnp.ones((M,), bool),
    obs_cam=obs_cam,
    obs_uvr=buvr,
    obs_stereo=jnp.ones((M, P), bool),
    obs_sigma2=jnp.ones((M, P), F32),
    obs_mask=pc[..., 2] > 1.0,
)
res = bundle_adjust(CAM, prob, iters=12)
ba_pose_err = max(
    float(jnp.linalg.norm(
        se3.log(SE3(res.poses.R[k], res.poses.t[k]).inverse()
                .compose(SE3(poses_gt.R[k], poses_gt.t[k])))))
    for k in range(1, K)
)
print(f"BA: cost {float(res.cost[0]):.1f} -> {float(res.cost[-1]):.1f}, "
      f"max pose err {ba_pose_err:.2e}")

ok = (
    tri_err < 1e-4
    and rot_err < 2e-3 and trans_err < 2e-2 and out_flagged > 0.9
    and res.cost[-1] < res.cost[0] * 0.2 and ba_pose_err < 1e-2
)
print("TWO-VIEW", "OK" if ok else "DEGRADED")
sys.exit(0 if ok else 1)
