"""Harris/Shi-Tomasi corner response, vectorized for TPU.

Semantic reference: vilib's GPU Harris/Shi-Tomasi detector
(`/root/reference/thirdparty/vilib/visual_lib/src/feature_detection/harris/
harris_gpu.cpp` and its CUDA kernels: Sobel gradients, windowed structure
tensor, k-form Harris or min-eigenvalue Shi-Tomasi response, grid NMS).

TPU design: gradients are shifted-slice differences, the structure-tensor
window is a separable box filter via prefix sums (O(1) per pixel for any
radius), and grid selection reuses `ops/fast.cell_max` — the whole
response is one fused elementwise XLA program over the image.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _sobel(image: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sobel gradients via shifted slices (edge-padded)."""
    p = jnp.pad(image, 1, mode="edge")
    h, w = image.shape

    def s(dy, dx):
        return jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), (h, w))

    gx = (
        (s(-1, 1) + 2.0 * s(0, 1) + s(1, 1))
        - (s(-1, -1) + 2.0 * s(0, -1) + s(1, -1))
    ) * 0.125
    gy = (
        (s(1, -1) + 2.0 * s(1, 0) + s(1, 1))
        - (s(-1, -1) + 2.0 * s(-1, 0) + s(-1, 1))
    ) * 0.125
    return gx, gy


def _box_sum(a: jnp.ndarray, r: int) -> jnp.ndarray:
    """(2r+1)² box sum with zero padding via 2D prefix sums."""
    h, w = a.shape
    p = jnp.pad(a, ((r + 1, r), (r + 1, r)))
    ii = jnp.cumsum(jnp.cumsum(p, axis=0), axis=1)
    d = 2 * r + 1
    return (
        ii[d:, d:] - ii[:-d, d:] - ii[d:, :-d] + ii[:-d, :-d]
    )[:h, :w]


@partial(jax.jit, static_argnames=("radius", "shi_tomasi"))
def harris_response(
    image: jnp.ndarray,
    radius: int = 2,
    k: float = 0.04,
    shi_tomasi: bool = False,
) -> jnp.ndarray:
    """Harris (det - k·trace²) or Shi-Tomasi (min eigenvalue) response.

    Matches vilib's response definitions (harris_gpu k/shi-tomasi modes);
    negative Harris scores clamp to 0 so downstream NMS/selection treats
    edges as non-corners.
    """
    gx, gy = _sobel(image)
    a = _box_sum(gx * gx, radius)
    b = _box_sum(gx * gy, radius)
    c = _box_sum(gy * gy, radius)
    if shi_tomasi:
        tr = 0.5 * (a + c)
        disc = jnp.sqrt(jnp.maximum(tr * tr - (a * c - b * b), 0.0))
        resp = tr - disc
    else:
        det = a * c - b * b
        tr = a + c
        resp = det - k * tr * tr
    h, w = image.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    m = radius + 1
    interior = (ys >= m) & (ys < h - m) & (xs >= m) & (xs < w - m)
    return jnp.where(interior, jnp.maximum(resp, 0.0), 0.0)


@partial(jax.jit, static_argnames=("cell", "top_k", "radius", "shi_tomasi"))
def detect_harris(
    image: jnp.ndarray,
    cell: int = 32,
    top_k: int = 1024,
    radius: int = 2,
    k: float = 0.04,
    rel_threshold: float = 1e-3,
    shi_tomasi: bool = False,
):
    """Grid-NMS Harris keypoints: (xy (K,2), score (K,), valid (K,)).

    One winner per `cell`-px cell, thresholded relative to the image's
    max response (vilib's quality_level semantics)."""
    from vi_slam_tpu.ops.fast import cell_max, nms3x3

    resp = harris_response(image, radius=radius, k=k, shi_tomasi=shi_tomasi)
    resp = nms3x3(resp)
    resp = jnp.where(resp > rel_threshold * jnp.max(resp), resp, 0.0)
    score, x, y = cell_max(resp, cell)
    kk = min(top_k, score.shape[0])
    top_scores, top_idx = jax.lax.top_k(score, kk)
    valid = top_scores > 0.0
    xy = jnp.stack(
        [x[top_idx].astype(jnp.float32), y[top_idx].astype(jnp.float32)],
        axis=-1,
    )
    return xy, top_scores, valid
