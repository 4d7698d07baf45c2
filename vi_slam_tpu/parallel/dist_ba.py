"""Distributed global bundle adjustment: landmarks sharded over a mesh.

Semantic reference: `Optimizer::GlobalBundleAdjustemnt` / `FullInertialBA`
(`/root/reference/src/optimization/optimizer.cpp:34/:385`) — whole-map BA
run on a transient thread. The TPU-native redesign (SURVEY §2.4.3 and
§5.7) shards the *landmark* blocks across devices:

  * every device holds the full (small) camera state, replicated;
  * each device Schur-eliminates only its own landmark shard;
  * the reduced camera system (K*6 x K*6) is summed with `psum` over the
    mesh axis — this is the only collective per iteration, sized
    independent of the landmark count;
  * the reduced solve is computed redundantly on every device (cheaper
    than scattering for K up to a few thousand poses);
  * back-substitution of landmark updates is embarrassingly parallel.

Scaling: per-iteration FLOPs ~ O(M/D * K * 108) per device + a psum of
O(K^2 * 36) floats over ICI; efficiency stays high while M/D >> K (the
usual SLAM regime).
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.optim.local_ba import BAProblem, BAResult, _ba_core
from vi_slam_tpu.utils.precision import precise


def problem_specs(axis: str) -> BAProblem:
    """PartitionSpecs for a BAProblem: landmark-axis arrays sharded, camera
    arrays replicated."""
    return BAProblem(
        poses=SE3(P(), P()),
        fixed=P(),
        points=P(axis),
        point_valid=P(axis),
        obs_cam=P(axis),
        obs_uvr=P(axis),
        obs_stereo=P(axis),
        obs_sigma2=P(axis),
        obs_mask=P(axis),
    )


def result_specs(axis: str) -> BAResult:
    return BAResult(
        poses=SE3(P(), P()),
        points=P(axis),
        obs_inlier=P(axis),
        cost=P(),
    )


def make_synthetic_problem(
    K: int, M: int, P_obs: int, seed: int = 0, noise: float = 0.05
) -> "BAProblem":
    """Realistic-shape synthetic global-BA problem (K cameras on a smooth
    trajectory, M landmarks, P_obs observations each) for scaling tests
    and benchmarks (SURVEY §2.4.3 efficiency-evidence contract)."""
    import jax.numpy as jnp
    import numpy as np
    from vi_slam_tpu.lie import se3

    rng = np.random.default_rng(seed)
    pts = np.stack(
        [
            rng.uniform(-30, 30, M),
            rng.uniform(-10, 10, M),
            rng.uniform(5, 60, M),
        ],
        axis=-1,
    ).astype(np.float32)
    xis = np.asarray(
        [[0.02 * k, 0.001 * k, 0, 0, 0.002 * k, 0.001 * k] for k in range(K)],
        np.float32,
    )
    poses = se3.exp(jnp.asarray(xis))
    obs_cam = rng.integers(0, K, (M, P_obs)).astype(np.int32)
    Rk = np.asarray(poses.R)[obs_cam]
    tk = np.asarray(poses.t)[obs_cam]
    pc = np.einsum("mpij,mj->mpi", Rk, pts) + tk
    z = np.maximum(pc[..., 2], 0.1)
    u = 500.0 * pc[..., 0] / z + 320.0
    v = 500.0 * pc[..., 1] / z + 240.0
    ur = u - 50.0 / z
    uvr = np.stack([u, v, ur], axis=-1).astype(np.float32)
    return BAProblem(
        poses=poses,
        fixed=jnp.zeros((K,), bool).at[0].set(True),
        points=jnp.asarray(
            pts + rng.normal(0, noise, pts.shape).astype(np.float32)
        ),
        point_valid=jnp.ones((M,), bool),
        obs_cam=jnp.asarray(obs_cam),
        obs_uvr=jnp.asarray(uvr),
        obs_stereo=jnp.ones((M, P_obs), bool),
        obs_sigma2=jnp.ones((M, P_obs), jnp.float32),
        obs_mask=jnp.asarray(pc[..., 2] > 0.5),
    )


def dist_bundle_adjust(
    cam: CameraParams,
    prob: BAProblem,
    mesh: Mesh,
    iters: int = 10,
    use_huber: bool = True,
    lam0: float = 1e-4,
    assembly: str = "dense",
) -> BAResult:
    """Run global BA with the landmark axis sharded over `mesh`.

    The landmark dimension of `prob` must be divisible by the mesh size
    (pad with masked landmarks first). assembly="scatter" keeps per-device
    memory O(K^2 + M/D * P^2) for full-map camera counts.
    """
    axis = mesh.axis_names[0]
    cam_spec = jax.tree.map(lambda _: P(), cam)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(cam_spec, problem_specs(axis)),
        out_specs=result_specs(axis),
    )
    @precise
    def run(c: CameraParams, p: BAProblem) -> BAResult:
        return _ba_core(
            c, p, iters, use_huber, lam0, axis_name=axis, assembly=assembly
        )

    return jax.jit(run)(cam, prob)
