"""Per-kernel timing breakdown of the stereo tracking hot path on TPU.

Runs each device program of the frame core separately with
block_until_ready fences, reports median ms per call. Diagnostics only —
not part of the library.

Run from /root/repo:  python tools/profile_stages.py [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.io import synthetic
from vi_slam_tpu.ops import pyramid as pyr_ops
from vi_slam_tpu.ops import stereo as stereo_ops
from vi_slam_tpu.ops import fast as fast_ops
from vi_slam_tpu.ops import orb as orb_ops
from vi_slam_tpu.pipeline.stereo_vo import StereoVO
from vi_slam_tpu.utils.config import (
    BAConfig, CameraConfig, ExtractorConfig, MapConfig, SystemConfig,
)

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
)

print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)
world = synthetic.make_billboard_world(n_frames=8, n_boards=4000, seed=11, speed=1.0)
imgL = synthetic.render_billboard_image(
    world, world.poses_wc[3], FX, FY, CX, CY, W, H, baseline=0.0)
imgR = synthetic.render_billboard_image(
    world, world.poses_wc[3], FX, FY, CX, CY, W, H, baseline=BF / FX)

vo = StereoVO(cfg)
# bootstrap: feed a few frames so the map is warm
for i in range(4):
    iL = synthetic.render_billboard_image(
        world, world.poses_wc[i], FX, FY, CX, CY, W, H, baseline=0.0)
    iR = synthetic.render_billboard_image(
        world, world.poses_wc[i], FX, FY, CX, CY, W, H, baseline=BF / FX)
    vo.process_stereo(iL, iR, i * 0.1)

img_l = jnp.asarray(imgL, jnp.float32)
img_r = jnp.asarray(imgR, jnp.float32)
ext = vo.extractor
ext_cfg = cfg.extractor


def bench_fn(name, fn, *a, n=20, **kw):
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{name:40s} {med:9.2f} ms")
    return out


# --- pieces of _extract ---
pyr_fn = jax.jit(lambda im: pyr_ops.build_pyramid(im, ext_cfg.n_levels, ext_cfg.scale_factor))
levels = bench_fn("build_pyramid", pyr_fn, img_l)

def detect_all(im):
    lv = pyr_ops.build_pyramid(im, ext_cfg.n_levels, ext_cfg.scale_factor)
    outs = []
    for l, img in enumerate(lv):
        b = ext.budgets[l]
        if b <= 0:
            continue
        outs.append(fast_ops.detect_level(
            img, cell=ext_cfg.cell_size, top_k=b,
            threshold=ext_cfg.fast_threshold,
            min_threshold=ext_cfg.fast_min_threshold))
    return outs

bench_fn("pyramid+FAST detect (all levels)", jax.jit(detect_all), img_l)
bench_fn("full _extract (single image)", jax.jit(ext._extract), img_l)

def extract_pair(a, b):
    return ext._extract(a), ext._extract(b)

feats2 = bench_fn("extract pair", jax.jit(extract_pair), img_l, img_r)

def stereo_part(a, b):
    fL, aL = ext._extract_core(a)
    fR, aR = ext._extract_core(b)
    offs = jnp.asarray(ext.row_offsets, jnp.int32)
    sm = stereo_ops.match_stereo(fL, fR, aL, aR, offs, vo.level_scales,
                                 vo.cam.bf, max_disp=float(BF / 0.5))
    return sm

bench_fn("extract pair + stereo match", jax.jit(stereo_part), img_l, img_r)

# --- track ---
featsL, uright, depth = vo._extract_pair_fn(
    jnp.stack([img_l, img_r]).astype(jnp.uint8))
jax.block_until_ready(uright)
bench_fn("_track (project+match+poseGN)", vo._track_fn, vo.map,
         jnp.int32(max(vo.ref_kf, 0)), featsL, uright, depth, vo.T_dev, vo.vel_dev)

# --- KF-rate programs ---
from vi_slam_tpu.lie.se3 import SE3
import vi_slam_tpu.slam_map.state as map_state

matched = jnp.full((ext_cfg.n_features,), -1, jnp.int32)

def kf_once(m):
    m2, nc = vo._create_kf_fn(
        m, jnp.int32(vo.n_kf), vo.T_dev, jnp.int32(99),
        jnp.asarray(9.9, m.kf_timestamp.dtype), featsL, uright, depth,
        matched, jnp.int32(vo.n_mp), 384)
    return m2, nc

# create_kf donates the map; time it by copying first (copy overhead noted)
m_copy = jax.tree.map(jnp.copy, vo.map)
jax.block_until_ready(m_copy)
t0 = time.perf_counter()
m2, nc = kf_once(m_copy)
jax.block_until_ready(m2)
print(f"{'_create_kf (cold copy, 1 shot)':40s} {(time.perf_counter()-t0)*1e3:9.2f} ms")

window = vo._recent_kfs()
fixed = jnp.zeros((cfg.ba.max_local_kfs,), bool).at[0].set(True)
t0 = time.perf_counter()
m3, Rr, tr = vo._local_ba_fn(m2, window, fixed, jnp.int32(vo.ref_kf))
jax.block_until_ready(m3)
print(f"{'_local_ba (cold, 1 shot)':40s} {(time.perf_counter()-t0)*1e3:9.2f} ms")

red_fn = jax.jit(map_state.keyframe_redundancy)
bench_fn("keyframe_redundancy", red_fn, m3)
cull_fn = jax.jit(map_state.cull_young_points)
bench_fn("cull_young_points", cull_fn, m3, jnp.int32(vo.ref_kf), jnp.int32(3))

# host transfer cost of the scalar dict pull
bundle = vo._track_fn(vo.map, recent, featsL, uright, depth, vo.T_dev, vo.vel_dev)
jax.block_until_ready(bundle)
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    sc = jax.device_get({
        "n_in": bundle.n_in, "n_matches": bundle.n_matches,
        "n_local": bundle.n_local, "n_tracked_close": bundle.n_tracked_close,
        "n_creatable": bundle.n_creatable, "T_R": bundle.T_R, "T_t": bundle.T_t})
    ts.append(time.perf_counter() - t0)
print(f"{'host_pull dict-of-7':40s} {float(np.median(ts))*1e3:9.2f} ms")

packed = jnp.concatenate([
    bundle.T_R.reshape(-1), bundle.T_t,
    jnp.stack([bundle.n_in, bundle.n_matches, bundle.n_local,
               bundle.n_tracked_close, bundle.n_creatable]).astype(jnp.float32)])
jax.block_until_ready(packed)
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    np.asarray(packed)
    ts.append(time.perf_counter() - t0)
print(f"{'host_pull packed (17,) f32':40s} {float(np.median(ts))*1e3:9.2f} ms")
