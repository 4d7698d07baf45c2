"""KITTI stereo SLAM app: dataset (or synthetic) -> StereoVO with loop
closing -> KITTI/TUM trajectory files -> ATE report -> map/trajectory
renders.

Semantic reference: `app/Stereo/kitti_stereo.cpp:21-100` (LoadImages +
per-frame TrackStereo loop + SaveTrajectoryKITTI) and
`System::SaveTrajectoryKITTI` (`system.cpp:645-696`).

Usage:
  python apps/kitti.py --synthetic 120            # no dataset needed
  python apps/kitti.py --dataset /data/kitti/00 [--gt poses.txt]
  add --cpu to force host CPU, --no-loop to disable loop closing.

Dataset layout (KITTI odometry): DIR/image_0/*.png, DIR/image_1/*.png,
DIR/times.txt; optional ground truth as a KITTI-format poses file.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.vi_slam_tpu_jax_cache"))

import jax

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--dataset", help="KITTI sequence dir")
parser.add_argument("--config", help="YAML config (ORB-SLAM settings, "
                    "kalibr chain, or nested dict; io/config_io.py)")
parser.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="run on an N-frame synthetic billboard world")
parser.add_argument("--gt", help="KITTI-format ground-truth poses file")
parser.add_argument("--out", default="kitti_out", help="output directory")
parser.add_argument("--vocab", help="trained vocabulary .npz (else train "
                    "a small one from the first frames)")
parser.add_argument("--no-loop", action="store_true",
                    help="disable loop closing / relocalization")
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--max-frames", type=int, default=0)
parser.add_argument("--viz-every", type=int, default=0,
                    help="write a map snapshot every N keyframes")
parser.add_argument("--metrics", action="store_true",
                    help="write per-frame JSONL metrics to OUT/run.jsonl")
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

from vi_slam_tpu import viz  # noqa: E402
from vi_slam_tpu.io import evaluation, synthetic, trajectory  # noqa: E402
from vi_slam_tpu.pipeline.stereo_vo import StereoVO  # noqa: E402
from vi_slam_tpu.retrieval import vocabulary as voc  # noqa: E402
from vi_slam_tpu.utils.config import (  # noqa: E402
    BAConfig, CameraConfig, ExtractorConfig, MapConfig, SystemConfig,
)
from vi_slam_tpu.utils.timing import StageTimer  # noqa: E402

log = lambda *a: print(*a, file=sys.stderr, flush=True)

# KITTI 00-02 geometry (config/KITTI00-Stereo.yaml)
W, H = 1241, 376
FX = FY = 718.856
CX, CY = 607.1928, 185.2157
BF = 386.1448


def load_png_gray(path: str) -> np.ndarray:
    import matplotlib.image as mpimg

    img = mpimg.imread(path)
    if img.ndim == 3:
        img = img[..., :3].mean(axis=-1)
    if img.dtype != np.uint8:
        img = (img * 255.0).clip(0, 255)
    return img.astype(np.uint8)


def frames_from_dataset(d):
    left_dir = os.path.join(d, "image_0")
    right_dir = os.path.join(d, "image_1")
    names = sorted(os.listdir(left_dir))
    times_f = os.path.join(d, "times.txt")
    if os.path.exists(times_f):
        ts = [float(x) for x in open(times_f)]
    else:
        ts = [i * 0.1 for i in range(len(names))]
    for i, n in enumerate(names):
        yield (load_png_gray(os.path.join(left_dir, n)),
               load_png_gray(os.path.join(right_dir, n)), ts[i])


def frames_from_synthetic(n, world):
    for i in range(n):
        imgL = synthetic.render_billboard_image(
            world, world.poses_wc[i], FX, FY, CX, CY, W, H, baseline=0.0)
        imgR = synthetic.render_billboard_image(
            world, world.poses_wc[i], FX, FY, CX, CY, W, H,
            baseline=BF / FX)
        yield imgL, imgR, i * 0.1


def main():
    os.makedirs(args.out, exist_ok=True)
    gt_wc = None
    if args.synthetic:
        n = args.synthetic
        log(f"rendering {n} synthetic frames...")
        world = synthetic.make_billboard_world(
            n_frames=n, n_boards=4000, seed=11, speed=1.0)
        gt_wc = world.poses_wc
        frames = frames_from_synthetic(n, world)
        n_total = n
    elif args.dataset:
        names = os.listdir(os.path.join(args.dataset, "image_0"))
        n_total = len(names)
        frames = frames_from_dataset(args.dataset)
        if args.gt:
            gt_wc = np.stack(trajectory.load_kitti(args.gt))
    else:
        parser.error("need --dataset or --synthetic N")
    if args.max_frames:
        n_total = min(n_total, args.max_frames)

    if args.config:
        from vi_slam_tpu.io import config_io

        loaded = config_io.load_config(args.config)
        cfg = loaded.replace(
            ba=BAConfig(max_local_kfs=8, max_local_points=2048,
                        local_ba_iters=6),
            map=MapConfig(max_keyframes=512, max_points=131072,
                          max_obs_per_point=8),
        )
        log(f"config from {args.config}: {cfg.camera}")
    else:
        cfg = SystemConfig(
            camera=CameraConfig(width=W, height=H, fx=FX, fy=FY, cx=CX,
                                cy=CY, bf=BF, th_depth=35.0),
            extractor=ExtractorConfig(n_features=2000),
            ba=BAConfig(max_local_kfs=8, max_local_points=2048,
                        local_ba_iters=6),
            map=MapConfig(max_keyframes=512, max_points=131072,
                          max_obs_per_point=8),
        )

    vocab = None
    if not args.no_loop:
        if args.vocab:
            log(f"loading vocabulary {args.vocab}")
            vocab = voc.load_vocabulary(args.vocab)
        else:
            # train a sequence-specific vocabulary from the first frames'
            # descriptors (the reference ships a pre-trained ORBvoc; a
            # from-sequence vocab covers the same API surface)
            log("training vocabulary from first frames...")
            from vi_slam_tpu.features.extractor import OrbExtractor

            ext = OrbExtractor(cfg.extractor, H, W)
            descs = []
            frames = list(frames)
            for imgL, _imgR, _t in frames[: min(5, len(frames))]:
                f = ext(np.asarray(imgL, np.float32))
                descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
            vocab = voc.train_vocabulary(
                np.concatenate(descs)[:20000], k=8, levels=3, iters=4)
            log(f"vocab: {vocab.n_words} words")

    timer = StageTimer()
    metrics = None
    if args.metrics:
        from vi_slam_tpu.utils.metrics import MetricsStream

        metrics = MetricsStream(
            open(os.path.join(args.out, "run.jsonl"), "w"), verbosity=1
        )
    vo = StereoVO(cfg, timer=timer, vocab=vocab, metrics=metrics)
    times, t0 = [], time.time()
    timestamps = []
    for i, (imgL, imgR, ts) in enumerate(frames):
        if args.max_frames and i >= args.max_frames:
            break
        f0 = time.perf_counter()
        vo.process_stereo(imgL, imgR, ts)
        times.append(time.perf_counter() - f0)
        timestamps.append(ts)
        if i % 50 == 0:
            log(f"frame {i}/{n_total}: {times[-1]*1e3:.1f} ms "
                f"state={vo.state} kfs={vo.n_kf} mps={vo.n_mp}")
        if args.viz_every and vo.n_kf and vo.n_kf % args.viz_every == 0:
            viz.plot_map(vo.map, os.path.join(args.out, f"map_{i:06d}.png"))
    vo.flush()
    wall = time.time() - t0

    est = vo.trajectory_wc()
    kitti_path = os.path.join(args.out, "trajectory_kitti.txt")
    tum_path = os.path.join(args.out, "trajectory_tum.txt")
    trajectory.save_kitti(kitti_path, est)
    trajectory.save_tum(tum_path, timestamps, est)
    viz.plot_trajectory(
        est, gt_wc[: len(est)] if gt_wc is not None else None,
        os.path.join(args.out, "trajectory.png"),
    )
    viz.plot_map(vo.map, os.path.join(args.out, "map.png"),
                 trajectory_wc=est)

    steady = np.asarray(times[min(5, len(times) - 1):])
    fps = 1.0 / float(np.median(steady)) if len(steady) else 0.0
    lost = sum(1 for r in vo.records if r.state != "OK")
    report = {
        "frames": len(times), "fps_median": round(fps, 2),
        "wall_s": round(wall, 1), "keyframes": vo.n_kf,
        "map_points": vo.n_mp, "lost_frames": lost,
        "loops_closed": (vo.loop_closer.stats.n_loops_closed
                         if vo.loop_closer else 0),
        "maps_merged": vo.merge_count,
    }
    if gt_wc is not None:
        ate = evaluation.ate_rmse(est[:, :3, 3],
                                  gt_wc[: len(est), :3, 3])
        report["ate_rmse_m"] = round(float(ate["rmse"]), 4)
    if metrics is not None:
        metrics.close()
    log(timer.report())
    log(f"saved: {kitti_path}, {tum_path}, trajectory.png, map.png")
    print(json.dumps(report))
    ok = lost <= len(times) // 5
    print("KITTI-APP OK" if ok else "KITTI-APP DEGRADED", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
