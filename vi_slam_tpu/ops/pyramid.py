"""Image pyramid construction with static per-level shapes.

Semantic reference: `FExtractor::ComputePyramid`
(`/root/reference/src/geometry/fextractor.cpp:1135`) — 8 levels, scale 1.2 —
and vilib's GPU half-sampling pyramid
(`thirdparty/vilib/visual_lib/src/preprocess/pyramid_gpu.cu:77`).

TPU design: level shapes are Python-computed (static); each level is an
anti-aliased bilinear resize (XLA lowers `jax.image.resize` to convs that
map onto the MXU/VPU). A fused separable Gaussian blur is provided for the
descriptor path (fextractor.cpp:1086 blurs each level with 7x7 sigma=2).
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(
    height: int, width: int, n_levels: int, scale_factor: float
) -> List[Tuple[int, int]]:
    """Static (H, W) per level, mirroring mvScaleFactor in the reference."""
    shapes = []
    for l in range(n_levels):
        s = scale_factor ** l
        shapes.append((max(int(round(height / s)), 16), max(int(round(width / s)), 16)))
    return shapes


def scale_factors(n_levels: int, scale_factor: float) -> np.ndarray:
    """Per-level scale (level coords * scale = level-0 coords)."""
    return np.asarray([scale_factor ** l for l in range(n_levels)], dtype=np.float32)


def build_pyramid(
    image: jnp.ndarray, n_levels: int, scale_factor: float
) -> List[jnp.ndarray]:
    """Grayscale (H, W) float32 -> list of per-level images.

    Successive resize from the previous level (not from level 0) matches the
    reference and acts as progressive anti-aliasing.
    """
    h, w = image.shape
    shapes = level_shapes(h, w, n_levels, scale_factor)
    levels = [image]
    for l in range(1, n_levels):
        levels.append(
            jax.image.resize(levels[-1], shapes[l], method="bilinear", antialias=True)
        )
    return levels


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    r = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (r / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(image: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with edge replication (matches the
    BORDER_REFLECT-ish behavior the descriptor path needs; exact border mode
    is immaterial since keypoints sit >= patch radius from borders).

    A single-channel conv_general_dilated lowers terribly on TPU (no channel
    dim to feed the MXU: ~48 ms/atlas measured); k statically shifted
    slice-adds are pure VPU work (~1 ms)."""
    k = _gaussian_kernel1d(ksize, sigma)
    pad = ksize // 2
    x = jnp.pad(image, ((pad, pad), (0, 0)), mode="edge")
    h = image.shape[0]
    y = sum(float(k[i]) * x[i : i + h, :] for i in range(ksize))
    x = jnp.pad(y, ((0, 0), (pad, pad)), mode="edge")
    w = image.shape[1]
    return sum(float(k[i]) * x[:, i : i + w] for i in range(ksize))


def halfsample(image: jnp.ndarray) -> jnp.ndarray:
    """2x2 average-pool halving — vilib `image_halfsample_gpu_kernel`
    equivalent (pyramid_gpu.cu:77), used by the LK tracker pyramid."""
    h2, w2 = image.shape[0] // 2, image.shape[1] // 2
    x = image[: h2 * 2, : w2 * 2]
    return x.reshape(h2, 2, w2, 2).mean(axis=(1, 3))


def build_halfsample_pyramid(image: jnp.ndarray, n_levels: int) -> List[jnp.ndarray]:
    levels = [image]
    for _ in range(1, n_levels):
        levels.append(halfsample(levels[-1]))
    return levels
