"""Stereo-INERTIAL benchmark: VIO frames/sec/chip + ATE on a synthetic
inertial billboard sequence (KITTI-sized frames, 200 Hz IMU).

The visual-only headline number lives in bench.py; this records the
inertial pipeline (`pipeline/vio.py` StereoInertialVO: fused image+IMU
frame program, staged inertial init, VI-BA) that the reference drives
through `app/Stereo/kitti_stereo_vio_gtsam.cpp:100-108`.

  python tools/bench_vio.py [--cpu] [--frames 40]

Prints one JSON line: {"metric": "stereo_inertial_vio_fps_per_chip", ...}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--frames", type=int, default=40)
parser.add_argument("--warmup", type=int, default=8)
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

from vi_slam_tpu.io import evaluation, synthetic  # noqa: E402
from vi_slam_tpu.pipeline.vio import StereoInertialVO  # noqa: E402
from vi_slam_tpu.utils.config import (  # noqa: E402
    BAConfig, CameraConfig, ExtractorConfig, IMUConfig, MapConfig,
    SystemConfig, TrackerConfig,
)
from vi_slam_tpu.utils.timing import StageTimer  # noqa: E402

log = lambda *a: print(*a, file=sys.stderr, flush=True)

W, H = 1241, 376
FX = FY = 718.856
CX, CY = 607.1928, 185.2157
BF = 386.1448

cfg = SystemConfig(
    camera=CameraConfig(width=W, height=H, fx=FX, fy=FY, cx=CX, cy=CY,
                        bf=BF, th_depth=35.0, fps=10.0),
    extractor=ExtractorConfig(n_features=2000),
    ba=BAConfig(max_local_kfs=8, max_local_points=2048, local_ba_iters=6,
                inertial_window=8),
    map=MapConfig(max_keyframes=256, max_points=65536, max_obs_per_point=8),
    imu=IMUConfig(freq=200.0),
    tracker=TrackerConfig(max_frames_between_kf=4),
)

n = args.frames
log(f"platform: {jax.devices()[0].platform}; rendering {n} frames...")
iw = synthetic.make_inertial_world(n_frames=n, fps=10.0, n_landmarks=2000,
                                   seed=5)
poses = iw.world.poses_wc
rng = np.random.default_rng(7)
n_boards = 4000
centers = poses[rng.integers(0, n, n_boards), :3, 3]
offs = np.stack(
    [rng.uniform(-14.0, 14.0, n_boards),
     rng.uniform(-6.0, 3.0, n_boards),
     rng.uniform(2.0, 45.0, n_boards)], axis=-1,
)
G = 5
world = synthetic.BillboardWorld(
    centers=centers + offs,
    sizes=rng.uniform(0.15, 0.7, n_boards),
    intensities=rng.uniform(60.0, 255.0, n_boards),
    poses_wc=poses,
    textures=rng.uniform(30.0, 255.0, (n_boards, G, G)).astype(np.float32),
)
frames = []
for i in range(n):
    imgL = synthetic.render_billboard_image(
        world, poses[i], FX, FY, CX, CY, W, H, baseline=0.0)
    imgR = synthetic.render_billboard_image(
        world, poses[i], FX, FY, CX, CY, W, H, baseline=BF / FX)
    frames.append((imgL, imgR))

timer = StageTimer()
vo = StereoInertialVO(cfg, timer=timer)
times = []
t0 = time.time()
t_steady = None
for i, (imgL, imgR) in enumerate(frames):
    if i == args.warmup:
        vo.flush()
        t_steady = time.perf_counter()
    f0 = time.perf_counter()
    vo.process_stereo_inertial(imgL, imgR, iw.imu_per_frame[i],
                               iw.timestamps[i])
    times.append(time.perf_counter() - f0)
    if i < 3 or i == n - 1:
        log(f"frame {i}: {times[-1]*1e3:.1f} ms state={vo.state}")
vo.flush()
log(f"total wall: {time.time()-t0:.1f}s; imu_ready={vo.imu_ready}")

steady = np.asarray(times[args.warmup:])
# steady-state throughput incl. final drain (same protocol as bench.py)
fps = (n - args.warmup) / (time.perf_counter() - t_steady)
traj = vo.trajectory_wc()
ate = evaluation.ate_rmse(traj[:, :3, 3], poses[: len(traj), :3, 3])
lost = sum(1 for r in vo.records if r.state != "OK")
log(f"median frame: {np.median(steady)*1e3:.1f} ms -> {fps:.2f} fps; "
    f"ATE {ate['rmse']*100:.1f} cm; lost {lost}/{n}")
log(timer.report())

BASELINE_FPS = 15.0  # same operational proxy as bench.py
print(json.dumps({
    "metric": "stereo_inertial_vio_fps_per_chip",
    "value": round(fps, 3),
    "unit": "frames/s",
    "vs_baseline": round(fps / BASELINE_FPS, 3),
    "ate_rmse_cm": round(float(ate["rmse"]) * 100, 1),
    "imu_initialized": bool(vo.imu_ready),
    "lost_frames": lost,
}))
