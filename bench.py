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
parser.add_argument("--frontend", default="orb", choices=["orb", "klt"])
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
# NOTE: no global matmul-precision override — the solver paths that need
# true f32 set it locally via utils.precision.precise; a global "highest"
# would run every conv/matmul as a 6-pass emulation (measured: no accuracy
# gain on this bench, only cost).

import numpy as np  # noqa: E402

from vi_slam_tpu.io import evaluation, synthetic  # noqa: E402
from vi_slam_tpu.pipeline.klt_vo import make_stereo_vo  # noqa: E402
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
    # r4 tuning (measured on the real chip, ATE within 2 cm of the
    # heavier settings): 4 GN iterations of windowed local BA per KF,
    # 1-neighbor fuse pass, maintenance every 3rd keyframe (the
    # reference's LocalMapping also sheds work under load via
    # InterruptBA, localmapping.cpp:941)
    ba=BAConfig(max_local_kfs=8, max_local_points=2048, local_ba_iters=4,
                mapping_fuse_window=2),
    map=MapConfig(max_keyframes=256, max_points=65536, max_obs_per_point=8),
    tracker=TrackerConfig(min_frames_between_kf=1, maintenance_every=3,
                          frontend=args.frontend),
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
vo = make_stereo_vo(cfg, timer=timer)
times = []
t_start = time.time()
t_steady = None
for i, (imgL, imgR) in enumerate(frames):
    if i == args.warmup:
        vo.flush()  # drain compile/warmup tails before the steady clock
        t_steady = time.perf_counter()
    t0 = time.perf_counter()
    st = vo.process_stereo(imgL, imgR, i * 0.1)
    dt = time.perf_counter() - t0
    times.append(dt)
    if i < 3 or i == args.frames - 1:
        log(f"frame {i}: {dt*1e3:.1f} ms, state={vo.records[-1].state}, "
            f"inliers={st.n_inliers}")
vo.flush()  # throughput counts ALL work the frames generated
wall_steady = time.perf_counter() - t_steady
log(f"total wall: {time.time()-t_start:.1f}s, steady: {wall_steady:.2f}s")

steady = np.asarray(times[args.warmup:])
# honest steady-state THROUGHPUT: frames / wall incl. the final drain —
# a per-frame median under-reports queued pipeline work
fps = (args.frames - args.warmup) / wall_steady

est = vo.trajectory_wc()
gt = world.poses_wc
ate = evaluation.ate_rmse(est[:, :3, 3], gt[:, :3, 3])
lost = sum(1 for r in vo.records if r.state != "OK")
log(f"median frame: {np.median(steady)*1e3:.1f} ms; steady throughput "
    f"{fps:.2f} fps")
log(f"ATE RMSE: {ate['rmse']*100:.1f} cm, lost: {lost}/{args.frames}")
log(timer.report())

BASELINE_FPS = 15.0
print(json.dumps({
    "metric": "kitti00_sized_stereo_tracking_fps_per_chip",
    "value": round(fps, 3),
    "unit": "frames/s",
    "vs_baseline": round(fps / BASELINE_FPS, 3),
}))
