"""Benchmark entry: stereo tracking frames/sec/chip on a KITTI-00-sized
synthetic sequence.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference C++ stack publishes no numbers
(/root/reference/README.md:3-4 "too bad performace"); BASELINE.md pins the
operational proxy at 15 frames/s — the well-known ORB-SLAM3-class stereo
KITTI tracking rate on a desktop CPU (SURVEY §6). vs_baseline = fps / 15.

Diagnostics go to stderr. Runs on the default platform (TPU under axon);
pass --cpu to force host CPU.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--frames", type=int, default=40)
parser.add_argument("--warmup", type=int, default=5)
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
# TPU f32 matmuls default to fast-but-low-precision passes; the GN/BA
# linear algebra needs true f32 (the MXU-bound Hamming matmuls explicitly
# use bf16 inputs and are unaffected).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

from vi_slam_tpu.io import evaluation, synthetic  # noqa: E402
from vi_slam_tpu.pipeline.stereo_vo import StereoVO  # noqa: E402
from vi_slam_tpu.utils.config import (  # noqa: E402
    BAConfig, CameraConfig, ExtractorConfig, MapConfig, SystemConfig,
    TrackerConfig,
)

log = lambda *a: print(*a, file=sys.stderr, flush=True)

# KITTI 00 geometry (config/KITTI00-Stereo.yaml)
W, H = 1241, 376
FX = FY = 718.856
CX, CY = 607.1928, 185.2157
BF = 386.1448

cfg = SystemConfig(
    camera=CameraConfig(width=W, height=H, fx=FX, fy=FY, cx=CX, cy=CY,
                        bf=BF, th_depth=35.0),
    extractor=ExtractorConfig(n_features=2000),
    ba=BAConfig(max_local_kfs=8, max_local_points=2048, local_ba_iters=6),
    map=MapConfig(max_keyframes=256, max_points=65536, max_obs_per_point=8),
    # KF cadence floor: without it the need_close condition fires every
    # frame on this sequence and the KF-rate mapping/BA/cull chains run
    # per-frame, tripling device time (KITTI at 10 fps inserts KFs every
    # 2-4 frames in the reference too)
    tracker=TrackerConfig(min_frames_between_kf=1),
)

log(f"platform: {jax.devices()[0].platform}, devices: {len(jax.devices())}")
world = synthetic.make_billboard_world(
    n_frames=args.frames, n_boards=4000, seed=11, speed=1.0
)

log("rendering frames...")
frames = []
for i in range(args.frames):
    imgL = synthetic.render_billboard_image(
        world, world.poses_wc[i], FX, FY, CX, CY, W, H, baseline=0.0
    )
    imgR = synthetic.render_billboard_image(
        world, world.poses_wc[i], FX, FY, CX, CY, W, H, baseline=BF / FX
    )
    frames.append((imgL, imgR))

from vi_slam_tpu.utils.timing import StageTimer  # noqa: E402

timer = StageTimer()
vo = StereoVO(cfg, timer=timer)
times = []
t_start = time.time()
for i, (imgL, imgR) in enumerate(frames):
    t0 = time.perf_counter()
    st = vo.process_stereo(imgL, imgR, i * 0.1)
    dt = time.perf_counter() - t0
    times.append(dt)
    if i < 3 or i == args.frames - 1:
        log(f"frame {i}: {dt*1e3:.1f} ms, state={vo.records[-1].state}, "
            f"inliers={st.n_inliers}")
log(f"total wall: {time.time()-t_start:.1f}s")

steady = np.asarray(times[args.warmup:])
fps = 1.0 / float(np.median(steady))

est = vo.trajectory_wc()
gt = world.poses_wc
ate = evaluation.ate_rmse(est[:, :3, 3], gt[:, :3, 3])
lost = sum(1 for r in vo.records if r.state != "OK")
log(f"median frame: {np.median(steady)*1e3:.1f} ms -> {fps:.2f} fps")
log(f"ATE RMSE: {ate['rmse']*100:.1f} cm, lost: {lost}/{args.frames}")
log(timer.report())

BASELINE_FPS = 15.0
print(json.dumps({
    "metric": "kitti00_sized_stereo_tracking_fps_per_chip",
    "value": round(fps, 3),
    "unit": "frames/s",
    "vs_baseline": round(fps / BASELINE_FPS, 3),
}))
