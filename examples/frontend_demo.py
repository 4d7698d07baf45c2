"""Demo: ORB frontend on a synthetic textured image.

Generates a textured scene, extracts ORB features, shifts the image by a
known offset, re-extracts, matches descriptors, and reports how well the
matches recover the shift — an end-to-end sanity drive of the frontend.

Run:  python examples/frontend_demo.py [--tpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import sys
import time

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--tpu", action="store_true", help="run on the TPU platform")
parser.add_argument("--size", default="376x512", help="HxW image size")
args = parser.parse_args()

if not args.tpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vi_slam_tpu.features import OrbExtractor  # noqa: E402
from vi_slam_tpu.ops.hamming import hamming_matrix  # noqa: E402
from vi_slam_tpu.utils.config import ExtractorConfig  # noqa: E402

H, W = (int(t) for t in args.size.split("x"))
SHIFT = 7

# synthetic texture: smoothed noise + random bright squares (corner-rich)
rng = np.random.default_rng(0)
img = rng.uniform(0, 80, size=(H, W)).astype(np.float32)
for _ in range(200):
    y, x = rng.integers(10, H - 20), rng.integers(10, W - 20)
    s = rng.integers(4, 14)
    img[y : y + s, x : x + s] = rng.uniform(100, 255)
img2 = np.roll(img, (0, SHIFT), axis=(0, 1))

cfg = ExtractorConfig(n_features=1000)
extractor = OrbExtractor(cfg, H, W)

t0 = time.time()
f1 = jax.block_until_ready(extractor(jnp.asarray(img)))
t1 = time.time()
f2 = jax.block_until_ready(extractor(jnp.asarray(img2)))
t2 = time.time()

n1, n2 = int(f1.valid.sum()), int(f2.valid.sum())
print(f"platform={jax.devices()[0].platform} image={H}x{W}")
print(f"extract #1: {n1} keypoints in {t1-t0:.2f}s (incl. compile)")
print(f"extract #2: {n2} keypoints in {t2-t1:.3f}s (cached)")
print("levels histogram:", np.bincount(np.asarray(f1.level)[np.asarray(f1.valid)],
                                       minlength=cfg.n_levels))

# match: nearest neighbor by Hamming distance, mutual + ratio test
D = np.asarray(hamming_matrix(f1.desc, f2.desc)).astype(np.float32)
D[~np.asarray(f1.valid)] = 1e9
D[:, ~np.asarray(f2.valid)] = 1e9
nn = D.argmin(axis=1)
dmin = D.min(axis=1)
good = dmin < 50
xy1 = np.asarray(f1.xy)[good]
xy2 = np.asarray(f2.xy)[nn[good]]
dx = xy2[:, 0] - xy1[:, 0]
dy = xy2[:, 1] - xy1[:, 1]
correct = (np.abs(dx - SHIFT) < 1.5) & (np.abs(dy) < 1.5)
print(f"matches with d<50: {good.sum()}, shift-consistent: {correct.sum()} "
      f"({100.0*correct.sum()/max(good.sum(),1):.1f}%)")
print(f"median recovered shift: dx={np.median(dx):.2f} dy={np.median(dy):.2f} "
      f"(truth {SHIFT}, 0)")

ok = correct.sum() > 0.5 * max(good.sum(), 1) and good.sum() > 100
print("FRONTEND", "OK" if ok else "DEGRADED")
sys.exit(0 if ok else 1)
