"""FAST corner response + grid NMS, fully vectorized for TPU.

Semantic reference: vilib's GPU FAST
(`/root/reference/thirdparty/vilib/visual_lib/src/feature_detection/fast/
fast_gpu_cuda_tools.cu:41-245` — Bresenham-16 circle, dark/bright sign
encoding, arc-contiguity LUT, per-pixel response) and its grid NMS
(`detector_base_gpu_cuda_tools.cu:701` — one winner per cell), plus the CPU
path's per-cell OpenCV FAST with threshold fallback
(`src/geometry/fextractor.cpp:800-805`).

TPU design: the per-pixel 16-neighbor gather becomes 16 statically shifted
views of a padded image (pure slicing — XLA fuses everything into one
elementwise loop over the image). Arc contiguity uses the classic bit-trick
on a 32-bit duplicated mask instead of a LUT. NMS is a 3x3 max-pool
equality test followed by per-cell argmax via reshape — no scatter, no
sort, no dynamic shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle radius 3, 16 points, (dx, dy), clockwise from 12 o'clock.
# Standard FAST geometry (also in fast_gpu_cuda_tools.cu:41-96).
CIRCLE = np.asarray(
    [
        (0, -3), (1, -3), (2, -2), (3, -1),
        (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1),
        (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)

BORDER = 3  # circle radius
ARC_LEN = 9  # FAST-9 (contiguous arc length; vilib MIN_ARC_LENGTH 9-12)


def _shifted(padded: jnp.ndarray, dx: int, dy: int, h: int, w: int) -> jnp.ndarray:
    """View of the padded image shifted by (dx, dy)."""
    return jax.lax.dynamic_slice(padded, (BORDER + dy, BORDER + dx), (h, w))


def _circle_diffs(image: jnp.ndarray) -> jnp.ndarray:
    """Signed differences to the 16 circle neighbors, (16, H, W)."""
    h, w = image.shape
    padded = jnp.pad(image, BORDER, mode="edge")
    ds = [_shifted(padded, int(dx), int(dy), h, w) - image for dx, dy in CIRCLE]
    return jnp.stack(ds, axis=0)


def _response_from_diffs(d: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9 response from precomputed circle diffs (16, H, W)."""

    def arc_score(mask: jnp.ndarray, excess) -> jnp.ndarray:
        """Max over the 16 start positions of (arc all set ? sum excess : 0)."""
        # bitmask per pixel, bits 0..15
        weights = (1 << np.arange(16, dtype=np.uint32)).astype(np.uint32)
        m = jnp.sum(
            mask.astype(jnp.uint32) * weights[:, None, None], axis=0, dtype=jnp.uint32
        )
        m2 = m | (m << np.uint32(16))
        run = m2
        for s in range(1, ARC_LEN):
            run = run & (m2 >> np.uint32(s))
        # run bit j set => arc starting at j (length 9) is fully set
        best = jnp.zeros(d.shape[1:], d.dtype)
        for j in range(16):
            arc_sum = sum(excess[(j + k) % 16] for k in range(ARC_LEN))
            valid = ((run >> np.uint32(j)) & np.uint32(1)).astype(jnp.bool_)
            best = jnp.maximum(best, jnp.where(valid, arc_sum, 0.0))
        return best

    bright = d > threshold
    dark = d < -threshold
    excess_b = jnp.maximum(d - threshold, 0.0)
    excess_d = jnp.maximum(-d - threshold, 0.0)
    return jnp.maximum(arc_score(bright, excess_b), arc_score(dark, excess_d))


def _interior_mask(h: int, w: int) -> jnp.ndarray:
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    return (ys >= BORDER) & (ys < h - BORDER) & (xs >= BORDER) & (xs < w - BORDER)


def fast_response(image: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9 corner response map (H, W) float32; 0 where not a corner.

    Score = max over valid contiguous 9-arcs of the summed threshold excess
    (bright and dark sides evaluated independently), a strictly stronger
    variant of vilib's SAD-over-arc response.
    """
    h, w = image.shape
    score = _response_from_diffs(_circle_diffs(image), threshold)
    return jnp.where(_interior_mask(h, w), score, 0.0)


def nms3x3(response: jnp.ndarray) -> jnp.ndarray:
    """Keep strict local maxima in a 3x3 neighborhood
    (vilib regular NMS, detector_base_gpu_cuda_tools.cu:624)."""
    m = jax.lax.reduce_window(
        response, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((response >= m) & (response > 0.0), response, 0.0)


@partial(jax.jit, static_argnames=("cell",))
def cell_max(response: jnp.ndarray, cell: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-cell winner: scores (C,), x (C,), y (C,) over a `cell`-pixel grid
    (vilib grid-NMS semantics: 1 best corner per cell,
    detector_base_gpu_cuda_tools.cu:701)."""
    h, w = response.shape
    hc, wc = -(-h // cell), -(-w // cell)
    padded = jnp.pad(
        response, ((0, hc * cell - h), (0, wc * cell - w)), constant_values=0.0
    )
    tiles = padded.reshape(hc, cell, wc, cell).transpose(0, 2, 1, 3).reshape(
        hc * wc, cell * cell
    )
    idx = jnp.argmax(tiles, axis=1)
    score = jnp.take_along_axis(tiles, idx[:, None], axis=1)[:, 0]
    cy = jnp.arange(hc * wc) // wc
    cx = jnp.arange(hc * wc) % wc
    y = cy * cell + idx // cell
    x = cx * cell + idx % cell
    return score, x.astype(jnp.int32), y.astype(jnp.int32)


def resp_pref(
    image: jnp.ndarray, threshold: float, min_threshold: float
) -> jnp.ndarray:
    """NMS'd low-threshold response with a +1e4 bonus where the pixel also
    clears the high threshold (the per-cell fallback preference signal;
    fextractor.cpp:800-805 two-threshold semantics). The Pallas twin
    (`ops/fast_pallas.fast_resp_pref`) computes the same map in one fused
    VMEM pass."""
    h, w = image.shape
    d = _circle_diffs(image)
    interior = _interior_mask(h, w)
    resp_low = jnp.where(interior, _response_from_diffs(d, min_threshold), 0.0)
    resp_high = jnp.where(interior, _response_from_diffs(d, threshold), 0.0)
    resp = nms3x3(resp_low)
    # Prefer winners that clear the high threshold: +1e4 bonus dominates the
    # per-cell argmax, so a cell falls back to its low-threshold winner only
    # when no pixel in it passes the high threshold.
    return jnp.where((resp > 0.0) & (resp_high > 0.0), resp + 1e4, resp)


def select_keypoints(
    pref: jnp.ndarray, cell: int, top_k: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-cell winner + global top-K selection from a preference map.

    Returns (xy (K, 2) float32 level coords, score (K,), valid (K,) bool).
    """
    score, x, y = cell_max(pref, cell)
    k = min(top_k, score.shape[0])
    top_scores, top_idx = jax.lax.top_k(score, k)
    valid = top_scores > 0.0
    xy = jnp.stack(
        [x[top_idx].astype(jnp.float32), y[top_idx].astype(jnp.float32)], axis=-1
    )
    true_score = jnp.where(top_scores >= 1e4, top_scores - 1e4, top_scores)
    return xy, true_score, valid


@partial(jax.jit, static_argnames=("cell", "top_k", "threshold", "min_threshold"))
def detect_level(
    image: jnp.ndarray,
    cell: int,
    top_k: int,
    threshold: float,
    min_threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Detect up to `top_k` corners on one pyramid level.

    Mirrors the reference's threshold-fallback (fextractor.cpp:800-805): the
    response at the low threshold is computed once; cells whose winner fails
    the high threshold fall back to their low-threshold winner, so weakly
    textured regions still yield corners without a second pass.

    Returns (xy (K, 2) float32 level coords, score (K,), valid (K,) bool).
    """
    return select_keypoints(
        resp_pref(image, threshold, min_threshold), cell, top_k
    )
