"""Stereo-INERTIAL benchmark: VIO frames/sec/chip + ATE on a synthetic
inertial billboard sequence (KITTI-sized frames, 200 Hz IMU).

The visual-only headline number lives in bench.py; this records the
inertial pipeline (`pipeline/vio.py` StereoInertialVO: fused image+IMU
frame program, staged inertial init, VI-BA) that the reference drives
through `app/Stereo/kitti_stereo_vio_gtsam.cpp:100-108`.

Protocol mirrors bench.py: one warm pass compiles every program the
sequence triggers, then best-of-2 timed passes on fresh pipelines.

  python tools/bench_vio.py [--cpu] [--frames 60] [--smoother]

Prints one JSON line: {"metric": "stereo_inertial_vio_fps_per_chip", ...}.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--frames", type=int, default=60)
parser.add_argument("--warmup", type=int, default=8)
parser.add_argument("--smoother", action="store_true",
                    help="run the per-frame fixed-lag smoother "
                         "(ISAM2/GTSAM capability) on the tracking path")
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
    # r5 throughput cadences (bench.py sweep, BASELINE.md) + inertial
    ba=BAConfig(max_local_kfs=6, max_local_points=2048, local_ba_iters=4,
                inertial_window=8, mapping_fuse_window=1,
                use_smoother=args.smoother),
    map=MapConfig(max_keyframes=256, max_points=65536, max_obs_per_point=8),
    imu=IMUConfig(freq=200.0),
    tracker=TrackerConfig(max_frames_between_kf=4, maintenance_every=8,
                          local_ba_every=2, mapping_every=2),
)

n = args.frames
log(f"platform: {jax.devices()[0].platform}; rendering {n} frames...")
iw, bw, frames = synthetic.make_billboard_inertial_sequence(
    n, FX, FY, CX, CY, W, H, BF, n_landmarks=2000, seed=5)
poses = iw.world.poses_wc


_timer_box = [StageTimer()]
_vo = StereoInertialVO(cfg, timer=_timer_box[0])


def run():
    # Same INSTANCE each pass (reset() between): the VIO programs are
    # closures over the pipeline object, so a fresh instance recompiles
    # its jit cache — measured 16 s of compile stalls landing inside a
    # fresh-instance timed pass (3.1 fps) vs 20.5 fps on the warmed
    # instance. Production VIO is a long-running process; the warmed
    # instance IS the steady state.
    vo = _vo
    vo.reset()
    vo.timer.reset()
    t_steady = None
    for i, (imgL, imgR) in enumerate(frames):
        if i == args.warmup:
            vo.flush()
            t_steady = time.perf_counter()
        vo.process_stereo_inertial(imgL, imgR, iw.imu_per_frame[i],
                                   iw.timestamps[i])
    vo.flush()
    fps = (n - args.warmup) / (time.perf_counter() - t_steady)
    return vo, fps, vo.timer


t0 = time.time()
log("warm pass (compiles)...")
run()
log(f"warm pass done at {time.time()-t0:.1f}s")
best = None
for rep in range(2):
    vo, fps, timer = run()
    log(f"pass {rep}: {fps:.2f} fps")
    if best is None or fps > best[1]:
        best = (vo, fps, timer)
vo, fps, timer = best
log(f"total wall: {time.time()-t0:.1f}s; imu_ready={vo.imu_ready}")

traj = vo.trajectory_wc()
ate = evaluation.ate_rmse(traj[:, :3, 3], poses[: len(traj), :3, 3])
lost = sum(1 for r in vo.records if r.state != "OK")
log(f"steady throughput {fps:.2f} fps; ATE {ate['rmse']*100:.1f} cm; "
    f"lost {lost}/{n}")
log(timer.report())

BASELINE_FPS = 15.0  # same operational proxy as bench.py
print(json.dumps({
    "metric": "stereo_inertial_vio_fps_per_chip",
    "value": round(fps, 3),
    "unit": "frames/s",
    "vs_baseline": round(fps / BASELINE_FPS, 3),
    "ate_rmse_cm": round(float(ate["rmse"]) * 100, 1),
    "imu_initialized": bool(vo.imu_ready),
    "smoother": bool(args.smoother),
    "lost_frames": lost,
}))
