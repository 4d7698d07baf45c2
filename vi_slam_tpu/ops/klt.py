"""Pyramidal inverse-compositional Lucas-Kanade feature tracker.

Semantic reference: vilib's GPU feature tracker
(`/root/reference/thirdparty/vilib/visual_lib/src/feature_tracker/
feature_tracker_gpu.cpp` + `feature_tracker_cuda_tools.cu`
`track_features_kernel`: per-feature patch pyramids, inverse-compositional
translation-only LK with a fixed iteration budget per level, convergence
and residual gates).

TPU design: no per-feature CUDA blocks — ALL N features iterate together
as (N, P²) batched bilinear gathers and (N, 2, 2) closed-form solves.
Levels are a static Python loop (coarse → fine, positions doubled between
levels); iterations are a static unrolled loop inside one jitted program.
The inverse-compositional form hoists the Hessian out of the iteration:
gradients come from the TEMPLATE patch, so each iteration costs one
bilinear gather + one 2-vector reduction per feature.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class TrackResult(NamedTuple):
    xy: jnp.ndarray  # (N, 2) tracked level-0 positions
    ok: jnp.ndarray  # (N,) bool — converged, in-bounds, residual gate
    residual: jnp.ndarray  # (N,) mean abs photometric residual


def _sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample at (..., 2) positions, clamped to the image."""
    h, w = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return (
        i00 * (1 - fx) * (1 - fy)
        + i01 * fx * (1 - fy)
        + i10 * (1 - fx) * fy
        + i11 * fx * fy
    )


def _track_level(
    prev: jnp.ndarray,
    nxt: jnp.ndarray,
    xy_prev: jnp.ndarray,  # (N, 2) template centers in this level's coords
    xy_cur: jnp.ndarray,  # (N, 2) current estimates
    half: int,
    iters: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One pyramid level of IC-LK. Returns (xy_cur', mean-abs residual)."""
    d = jnp.arange(-half, half + 1, dtype=prev.dtype)
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    offs = jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)  # (P²,2)
    pts = xy_prev[:, None, :] + offs[None, :, :]  # (N, P², 2)
    T = _sample(prev, pts)
    # template gradients (central differences, bilinear)
    ex = jnp.asarray([0.5, 0.0], prev.dtype)
    ey = jnp.asarray([0.0, 0.5], prev.dtype)
    gx = _sample(prev, pts + ex) - _sample(prev, pts - ex)
    gy = _sample(prev, pts + ey) - _sample(prev, pts - ey)
    # 2x2 IC Hessian per feature (hoisted out of the iteration)
    h11 = jnp.sum(gx * gx, axis=-1)
    h12 = jnp.sum(gx * gy, axis=-1)
    h22 = jnp.sum(gy * gy, axis=-1)
    det = h11 * h22 - h12 * h12
    det_safe = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)

    for _ in range(iters):
        w = xy_cur[:, None, :] + offs[None, :, :]
        e = _sample(nxt, w) - T  # (N, P²)
        b1 = jnp.sum(gx * e, axis=-1)
        b2 = jnp.sum(gy * e, axis=-1)
        dx = (h22 * b1 - h12 * b2) / det_safe
        dy = (h11 * b2 - h12 * b1) / det_safe
        # inverse-compositional translation update: p <- p - Δ
        xy_cur = xy_cur - jnp.stack([dx, dy], axis=-1)
    # residual at the FINAL position (the gated TrackResult.residual must
    # reflect the returned xy, not the one-iteration-stale error)
    e = _sample(nxt, xy_cur[:, None, :] + offs[None, :, :]) - T
    res = jnp.mean(jnp.abs(e), axis=-1)
    return xy_cur, res


@partial(jax.jit, static_argnames=("half", "iters"))
def track_pyramidal(
    prev_pyr: List[jnp.ndarray],
    next_pyr: List[jnp.ndarray],
    xy: jnp.ndarray,  # (N, 2) level-0 positions in prev
    valid: jnp.ndarray,  # (N,) bool
    xy_guess: jnp.ndarray = None,  # (N, 2) optional level-0 initial guess
    half: int = 5,
    iters: int = 8,
    max_residual: float = 25.0,
    min_eig: float = 1e-3,
) -> TrackResult:
    """Track level-0 features from prev to next through a half-sampling
    pyramid (build with `ops/pyramid.build_halfsample_pyramid`).

    Mirrors feature_tracker_gpu's per-level schedule: start at the
    coarsest level with xy/2^L, run `iters` IC iterations, double and
    descend (feature_tracker_cuda_tools.cu track loop). Gates: final
    residual, structure-tensor conditioning, and in-bounds position.
    """
    L = len(prev_pyr)
    cur = (xy if xy_guess is None else xy_guess) / (2.0 ** (L - 1))
    res = jnp.zeros((xy.shape[0],), xy.dtype)
    for l in range(L - 1, -1, -1):
        tmpl = xy / (2.0 ** l)
        cur, res = _track_level(
            prev_pyr[l], next_pyr[l], tmpl, cur, half, iters
        )
        if l > 0:
            cur = cur * 2.0
    h, w = prev_pyr[0].shape
    m = half + 1
    inb = (
        (cur[:, 0] >= m) & (cur[:, 0] < w - m)
        & (cur[:, 1] >= m) & (cur[:, 1] < h - m)
    )
    # conditioning gate on the finest-level template
    d = jnp.arange(-half, half + 1, dtype=xy.dtype)
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    offs = jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)
    pts = xy[:, None, :] + offs[None, :, :]
    ex = jnp.asarray([0.5, 0.0], xy.dtype)
    ey = jnp.asarray([0.0, 0.5], xy.dtype)
    gx = _sample(prev_pyr[0], pts + ex) - _sample(prev_pyr[0], pts - ex)
    gy = _sample(prev_pyr[0], pts + ey) - _sample(prev_pyr[0], pts - ey)
    h11 = jnp.sum(gx * gx, axis=-1)
    h12 = jnp.sum(gx * gy, axis=-1)
    h22 = jnp.sum(gy * gy, axis=-1)
    tr = 0.5 * (h11 + h22)
    disc = jnp.sqrt(jnp.maximum(tr * tr - (h11 * h22 - h12 * h12), 0.0))
    lam_min = (tr - disc) / offs.shape[0]
    ok = valid & inb & (res < max_residual) & (lam_min > min_eig)
    return TrackResult(xy=cur, ok=ok, residual=res)
