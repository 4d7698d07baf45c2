"""True device-compute profiling: queue N dispatches back-to-back and block
once, so tunnel RTT amortizes away. Diagnostics only."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.io import synthetic
from vi_slam_tpu.ops import fast as fast_ops
from vi_slam_tpu.ops import orb as orb_ops
from vi_slam_tpu.ops import pyramid as pyr_ops
from vi_slam_tpu.ops import stereo as stereo_ops
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


def bench_queued(name, fn, *a, n=20, **kw):
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a, **kw)
    jax.block_until_ready(out)
    med = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:44s} {med:9.2f} ms/call (queued x{n})")
    return out


# pyramid + FAST
pyr_fn = jax.jit(lambda im: pyr_ops.build_pyramid(im, ext_cfg.n_levels, ext_cfg.scale_factor))
levels = bench_queued("build_pyramid", pyr_fn, img_l)

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

bench_queued("pyramid+FAST detect", jax.jit(detect_all), img_l)


def detect_all_pallas(im):
    from vi_slam_tpu.ops import fast_pallas

    lv = pyr_ops.build_pyramid(im, ext_cfg.n_levels, ext_cfg.scale_factor)
    outs = []
    for l, img in enumerate(lv):
        b = ext.budgets[l]
        if b <= 0:
            continue
        pref = fast_pallas.fast_resp_pref(
            img, ext_cfg.fast_threshold, ext_cfg.fast_min_threshold)
        outs.append(fast_ops.select_keypoints(pref, ext_cfg.cell_size, b))
    return outs


try:
    bench_queued("pyramid+FAST detect (pallas)", jax.jit(detect_all_pallas),
                 img_l)
except Exception as e:  # pallas lowering may be unsupported on a backend
    print(f"pallas FAST failed: {type(e).__name__}: {e}", file=sys.stderr)

# pieces of the atlas path
SEP = 21


def build_atlas(im):
    lv = pyr_ops.build_pyramid(im, ext_cfg.n_levels, ext_cfg.scale_factor)
    rows = []
    for l, img in enumerate(lv):
        if ext.budgets[l] <= 0:
            continue
        h, w = img.shape
        rows.append(jnp.pad(img, ((0, SEP), (0, W - w))))
    return jnp.concatenate(rows, axis=0)

atlas_fn = jax.jit(build_atlas)
atlas = bench_queued("build atlas (pyramid+pad+concat)", atlas_fn, img_l)
print(f"atlas shape: {atlas.shape}", file=sys.stderr)

xy_fake = jnp.asarray(
    np.random.default_rng(0).uniform(30, 300, size=(2000, 2)).astype(np.float32))

bench_queued("moment_images(atlas)", jax.jit(orb_ops.moment_images), atlas)
bench_queued("orientations(atlas, 2000kp)", jax.jit(orb_ops.orientations), atlas, xy_fake)
ang = jnp.zeros((2000,), jnp.float32)
blur_fn = jax.jit(pyr_ops.gaussian_blur)
blurred = bench_queued("gaussian_blur(atlas)", blur_fn, atlas)
bench_queued("extract_patches(2000)", jax.jit(orb_ops.extract_patches), blurred, xy_fake)
bench_queued("describe_patches(2000)", orb_ops.describe_patches, blurred, xy_fake, ang)
bench_queued("full _extract", jax.jit(ext._extract), img_l)


def extract_pair(a, b):
    return ext._extract(a), ext._extract(b)

bench_queued("extract pair", jax.jit(extract_pair), img_l, img_r)

featsL, atlasL = ext._fn_atlas(img_l)
featsR, atlasR = ext._fn_atlas(img_r)
offs = jnp.asarray(ext.row_offsets, jnp.int32)
sm_fn = jax.jit(lambda fL, fR, aL, aR: stereo_ops.match_stereo(
    fL, fR, aL, aR, offs, vo.level_scales, vo.cam.bf, max_disp=float(BF / 0.5)))
bench_queued("stereo match only", sm_fn, featsL, featsR, atlasL, atlasR)

featsL2, uright, depth = vo._extract_pair_fn(
    jnp.stack([img_l, img_r]).astype(jnp.uint8))
jax.block_until_ready(uright)
bench_queued("_track", vo._track_fn, vo.map, jnp.int32(max(vo.ref_kf, 0)),
             featsL2, uright, depth, vo.T_dev, vo.vel_dev)
imgs_u8 = jnp.asarray(np.stack([imgL, imgR]).astype(np.uint8))


def frame_once():
    # _frame_fn donates the map buffer: rethread the returned state so
    # every queued call has a live input
    out = vo._frame_fn(
        imgs_u8, vo.map, vo.carry_dev, vo.T_dev, vo.vel_dev,
        jnp.int32(vo.frame_id + 1), jnp.asarray(0.5, jnp.float32),
        jnp.asarray(False))
    vo.map = out[1]
    return out[0]


bench_queued("full _frame_fn", frame_once)

# upload costs
img_u8 = np.asarray(imgL, np.uint8)
img_f32 = np.asarray(imgL, np.float32)
for nm, arr in (("upload u8", img_u8), ("upload f32", img_f32)):
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(arr))
        ts.append(time.perf_counter() - t0)
    print(f"{nm:44s} {float(np.median(ts))*1e3:9.2f} ms")
