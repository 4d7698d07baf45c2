"""Stereo-inertial VIO accuracy bisection harness.

Runs the bench_vio billboard world (KITTI-sized frames, 200 Hz IMU)
through controlled pipeline variants to localize accuracy loss
(VERDICT r4 item 1: image-path VIO ATE must reach the visual-only
level; oracle-feature VIO already holds 2-5 cm):

  visual   StereoVO on the same images (no IMU)            -- frontend floor
  image    StereoInertialVO on images (the shipping path)  -- the defect
  oracle   StereoInertialVO on oracle features, KITTI-sized intrinsics
  noimu    StereoInertialVO on images with inertial fusion weakened
           (inflate IMU noise 100x: GN trusts vision)

Per-run diagnostics: per-frame translation error trace, init events
(stage, scale, gravity angle error, bias error vs truth), lost frames.

  python tools/diag_vio.py --variant image --frames 60 [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--frames", type=int, default=60)
parser.add_argument("--variant", default="image",
                    choices=["visual", "image", "oracle", "noimu"])
parser.add_argument("--trace", action="store_true",
                    help="print per-frame translation error")
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

from vi_slam_tpu.io import evaluation, synthetic  # noqa: E402
from vi_slam_tpu.pipeline.stereo_vo import StereoVO  # noqa: E402
from vi_slam_tpu.pipeline.vio import StereoInertialVO  # noqa: E402
from vi_slam_tpu.utils.config import (  # noqa: E402
    BAConfig, CameraConfig, ExtractorConfig, IMUConfig, MapConfig,
    SystemConfig, TrackerConfig,
)

log = lambda *a: print(*a, file=sys.stderr, flush=True)

W, H = 1241, 376
FX = FY = 718.856
CX, CY = 607.1928, 185.2157
BF = 386.1448

n = args.frames


def make_cfg(imu_scale=1.0):
    return SystemConfig(
        camera=CameraConfig(width=W, height=H, fx=FX, fy=FY, cx=CX, cy=CY,
                            bf=BF, th_depth=35.0, fps=10.0),
        extractor=ExtractorConfig(n_features=2000),
        ba=BAConfig(max_local_kfs=8, max_local_points=2048,
                    local_ba_iters=6, inertial_window=8),
        map=MapConfig(max_keyframes=256, max_points=65536,
                      max_obs_per_point=8),
        imu=IMUConfig(freq=200.0,
                      noise_gyro=1.7e-4 * imu_scale,
                      noise_acc=2.0e-3 * imu_scale),
        tracker=TrackerConfig(max_frames_between_kf=4),
    )


log(f"platform: {jax.devices()[0].platform}; rendering {n} frames...")
iw, bw, frames = synthetic.make_billboard_inertial_sequence(
    n, FX, FY, CX, CY, W, H, BF, n_landmarks=2000, seed=5)
poses = iw.world.poses_wc


def report(vo, tag):
    vo.flush()
    traj = vo.trajectory_wc()
    m = min(len(traj), n)
    ate = evaluation.ate_rmse(traj[:m, :3, 3], poses[:m, :3, 3])
    errs = None
    if args.trace:
        # aligned per-frame error trace
        R, t, s = evaluation.horn_align(traj[:m, :3, 3], poses[:m, :3, 3])
        al = (s * (R @ traj[:m, :3, 3].T)).T + t
        errs = np.linalg.norm(al - poses[:m, :3, 3], axis=1)
        for i in range(m):
            st = vo.records[i].state if i < len(vo.records) else "?"
            log(f"  f{i:03d} err={errs[i]*100:7.1f} cm state={st}")
    lost = sum(1 for r in vo.records if r.state != "OK")
    ate_s = evaluation.ate_rmse(traj[:m, :3, 3], poses[:m, :3, 3],
                                with_scale=True)
    out = {"variant": tag, "ate_rmse_cm": round(float(ate["rmse"]) * 100, 1),
           "ate_scaled_cm": round(float(ate_s["rmse"]) * 100, 1),
           "traj_scale": round(float(ate_s["scale"]), 4),
           "lost": lost, "n": m}
    if isinstance(vo, StereoInertialVO):
        out["imu_ready"] = bool(vo.imu_ready)
        out["init_stage"] = int(vo._init_stage)
        got = jax.device_get({"bg": vo.bg_dev, "ba": vo.ba_dev,
                              "g": vo.g_w_dev})
        out["bg_err"] = round(float(np.linalg.norm(
            got["bg"] - iw.bias_gyro)), 6)
        out["ba_err"] = round(float(np.linalg.norm(
            got["ba"] - iw.bias_acc)), 4)
        gn = np.linalg.norm(got["g"])
        if gn > 1e-6:
            cosang = float(got["g"] @ iw.gravity_w /
                           (gn * np.linalg.norm(iw.gravity_w)))
            out["g_angle_deg"] = round(
                float(np.degrees(np.arccos(np.clip(cosang, -1, 1)))), 3)
            out["g_mag"] = round(float(gn), 3)
    print(json.dumps(out))
    return ate


if args.variant == "visual":
    vo = StereoVO(make_cfg())
    for i, (l, r) in enumerate(frames):
        vo.process_stereo(l, r, iw.timestamps[i])
    report(vo, "visual")
elif args.variant == "oracle":
    vo = StereoInertialVO(make_cfg())
    for i in range(n):
        fr = synthetic.render_oracle_frame(
            iw.world, i, FX, FY, CX, CY, BF, W, H,
            max_features=1000, px_noise=0.3,
        )
        vo.process_oracle_inertial(
            fr.xy, fr.uright, fr.depth, fr.desc, fr.level,
            iw.imu_per_frame[i], iw.timestamps[i],
        )
    report(vo, "oracle")
else:
    scale = 100.0 if args.variant == "noimu" else 1.0
    vo = StereoInertialVO(make_cfg(imu_scale=scale))
    events = []
    orig = vo.metrics.event

    def spy(name, **kw):
        if name in ("scale_applied", "bad_imu", "inertial_merge",
                    "map_fork", "bad_imu_reset"):
            events.append((name, kw))
        return orig(name, **kw)

    vo.metrics.event = spy
    for i, (l, r) in enumerate(frames):
        st = vo.process_stereo_inertial(l, r, iw.imu_per_frame[i],
                                        iw.timestamps[i])
        if not vo.imu_ready and i % 10 == 0:
            log(f"frame {i}: state={vo.state} kfs={vo.n_kf}")
    for e in events:
        log(f"event: {e}")
    report(vo, args.variant)
