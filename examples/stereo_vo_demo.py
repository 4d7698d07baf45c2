"""Demo: full image-based stereo VO on a rendered synthetic world.

Renders stereo image pairs of a billboard scene along a known trajectory,
runs the complete pipeline (ORB extraction, stereo SAD association,
tracking, keyframing, local BA), and reports ATE against ground truth.

Run:  python examples/stereo_vo_demo.py [--tpu] [--frames N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import sys
import time

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--tpu", action="store_true")
parser.add_argument("--frames", type=int, default=30)
args = parser.parse_args()
if not args.tpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from vi_slam_tpu.io import evaluation, synthetic  # noqa: E402
from vi_slam_tpu.pipeline.stereo_vo import StereoVO  # noqa: E402
from vi_slam_tpu.utils.config import (  # noqa: E402
    BAConfig, CameraConfig, ExtractorConfig, MapConfig, SystemConfig,
)
from vi_slam_tpu.utils.timing import StageTimer  # noqa: E402

W, H = 512, 384
FX = FY = 450.0
CX, CY = W / 2, H / 2
BASELINE = 0.5
BF = FX * BASELINE

cfg = SystemConfig(
    camera=CameraConfig(width=W, height=H, fx=FX, fy=FY, cx=CX, cy=CY,
                        bf=BF, th_depth=45.0),
    extractor=ExtractorConfig(n_features=1200),
    ba=BAConfig(max_local_kfs=8, max_local_points=2048, local_ba_iters=6),
    map=MapConfig(max_keyframes=128, max_points=32768, max_obs_per_point=8),
)

world = synthetic.make_billboard_world(n_frames=args.frames, n_boards=2500, seed=3)
timer = StageTimer()
vo = StereoVO(cfg, timer=timer)

t0 = time.time()
for i in range(args.frames):
    imgL = synthetic.render_billboard_image(
        world, world.poses_wc[i], FX, FY, CX, CY, W, H, baseline=0.0
    )
    imgR = synthetic.render_billboard_image(
        world, world.poses_wc[i], FX, FY, CX, CY, W, H, baseline=BASELINE
    )
    st = vo.process_stereo(imgL, imgR, i * 0.1)
    if i % 5 == 0 or i == args.frames - 1:
        print(f"frame {i:3d}: state={vo.records[-1].state} "
              f"matches={st.n_matches} inliers={st.n_inliers} "
              f"kf={st.n_kfs} mp={st.n_mps}")
elapsed = time.time() - t0

est = vo.trajectory_wc()
gt = world.poses_wc
res = evaluation.ate_rmse(est[:, :3, 3], gt[:, :3, 3])
dist = np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1))
lost = sum(1 for r in vo.records if r.state != "OK")
print(f"\ntrajectory length: {dist:.1f} m, frames: {args.frames}, "
      f"lost: {lost}, wall: {elapsed:.1f}s")
print(f"ATE RMSE: {res['rmse']*100:.1f} cm  (median {res['median']*100:.1f} cm, "
      f"max {res['max']*100:.1f} cm)")
print(timer.report())

ok = lost == 0 and res["rmse"] < 0.10 * max(dist / 30.0, 1.0)
print("STEREO-VO", "OK" if ok else "DEGRADED")
sys.exit(0 if ok else 1)
