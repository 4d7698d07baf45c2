"""ORB orientation + rotated-BRIEF descriptors, batched over keypoints.

Semantic reference: `/root/reference/src/geometry/fextractor.cpp` —
`IC_Angle` (:68, intensity-centroid orientation over a radius-15 circular
patch), `computeOrientation` (:463), 7x7 Gaussian blur + 256-bit rBRIEF
`computeDescriptors` (:1025-1091).

TPU design:
  * Orientation is NOT a per-keypoint patch loop. The centroid moments
    m10/m01 are computed for the whole image as two 31x31 convolutions
    (x- and y-weighted circular kernels) on the MXU, then gathered at
    keypoint locations — O(HW k^2) dense FLOPs instead of irregular
    per-feature gathers.
  * Descriptors use a fixed 256-pair pattern (deterministically generated
    Gaussian pairs — the BRIEF construction; we deliberately do not reuse
    OpenCV's learned pattern). Each keypoint rotates the pattern by its
    orientation and bilinearly samples the blurred image: one batched
    (N, 512) gather.
  * Bits are packed to uint32[8] per descriptor; matching unpacks to a
    (N, 256) bf16 matrix and rides the MXU (see ops/hamming.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 15  # HALF_PATCH_SIZE in the reference
PATTERN_SIZE = 256
_PATTERN_SIGMA = 6.0  # ~ patch/5 per the BRIEF paper
_PATTERN_SEED = 20260817


def _make_pattern() -> np.ndarray:
    """(256, 4) int8 [ax, ay, bx, by] — isotropic Gaussian point pairs,
    clipped to the patch. Deterministic; regenerating it is part of the
    descriptor definition (descriptors are only matched against descriptors
    produced by this same pattern)."""
    rng = np.random.default_rng(_PATTERN_SEED)
    pts = rng.normal(0.0, _PATTERN_SIGMA, size=(PATTERN_SIZE, 4))
    pts = np.clip(np.round(pts), -(PATCH_RADIUS - 2), PATCH_RADIUS - 2)
    return pts.astype(np.float32)


PATTERN = _make_pattern()  # (256, 4)


def _moment_kernels() -> Tuple[np.ndarray, np.ndarray]:
    """x- and y-weighted circular kernels for the intensity centroid."""
    r = PATCH_RADIUS
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    mask = (xs * xs + ys * ys) <= r * r
    kx = (xs * mask).astype(np.float32)
    ky = (ys * mask).astype(np.float32)
    return kx, ky


_KX, _KY = _moment_kernels()


def moment_images(image: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """m10 and m01 images via 31x31 convolution (MXU-friendly)."""
    k = jnp.stack([jnp.asarray(_KX), jnp.asarray(_KY)])[:, None]  # (2,1,31,31)
    out = jax.lax.conv_general_dilated(
        image[None, None],
        k,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]
    return out[0], out[1]


def orientations(image: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """IC angles (radians) for keypoints xy (N, 2) in level coords."""
    m10, m01 = moment_images(image)
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, image.shape[1] - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, image.shape[0] - 1)
    return jnp.arctan2(m01[yi, xi], m10[yi, xi])


def bilinear_sample(image: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample at xy (..., 2); clamps to the image."""
    h, w = image.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = image[y0, x0]
    i01 = image[y0, x0 + 1]
    i10 = image[y0 + 1, x0]
    i11 = image[y0 + 1, x0 + 1]
    return (
        i00 * (1 - fx) * (1 - fy)
        + i01 * fx * (1 - fy)
        + i10 * (1 - fx) * fy
        + i11 * fx * fy
    )


@jax.jit
def describe(
    blurred: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """Compute packed rBRIEF descriptors.

    blurred: pre-blurred level image (H, W).
    xy: (N, 2) keypoint positions (level coords).
    angle: (N,) orientations in radians.
    Returns (N, 8) uint32 packed descriptors.
    """
    pattern = jnp.asarray(PATTERN)  # (256, 4)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (N,)
    rot = jnp.stack(
        [jnp.stack([ca, -sa], -1), jnp.stack([sa, ca], -1)], axis=-2
    )  # (N, 2, 2)
    pa = pattern[:, :2]  # (256, 2)
    pb = pattern[:, 2:]
    # rotated offsets per keypoint: (N, 256, 2)
    ra = jnp.einsum("nij,pj->npi", rot, pa)
    rb = jnp.einsum("nij,pj->npi", rot, pb)
    pos_a = xy[:, None, :] + ra
    pos_b = xy[:, None, :] + rb
    va = bilinear_sample(blurred, pos_a)  # (N, 256)
    vb = bilinear_sample(blurred, pos_b)
    bits = (va < vb).astype(jnp.uint32)  # (N, 256)
    shifts = jnp.asarray(np.arange(32, dtype=np.uint32))
    packed = jnp.sum(
        bits.reshape(-1, 8, 32) << shifts[None, None, :], axis=-1, dtype=jnp.uint32
    )
    return packed


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) {0,1} float32 bit matrix (for MXU matmuls)."""
    shifts = jnp.asarray(np.arange(32, dtype=np.uint32))
    bits = (desc[..., None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(*desc.shape[:-1], 256).astype(jnp.float32)
