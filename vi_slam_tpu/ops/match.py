"""Descriptor matching: brute-force, windowed projection search, rotation
consistency — all as masked dense operations on the MXU.

Semantic reference: `/root/reference/src/geometry/fmatcher.cpp` —
`SearchByProjection` (local map :321, last frame :2471), `SearchByBoW`
(:546), initialization window search (:983), `SearchForTriangulation`
(:1242), `Fuse` (:1918), thresholds TH_LOW=50/TH_HIGH=100 (:313-315),
rotation-histogram consistency `ComputeThreeMaxima` (:2813).

TPU design: the reference's per-feature grid-cell candidate walks become a
full (N, M) Hamming distance matrix (one bf16 matmul) with *masks* encoding
every candidate constraint (window radius, pyramid level, disparity band,
epipolar distance). Argmin + ratio/threshold tests are per-row reductions.
No inverted grid, no dynamic candidate lists.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.ops.hamming import hamming_matrix_bits
from vi_slam_tpu.ops.orb import unpack_bits

INF = jnp.int32(1 << 20)


class Matches(NamedTuple):
    """Row-wise match result: for each query feature i, the matched target
    index idx[i] (valid only where ok[i])."""

    idx: jnp.ndarray  # (N,) int32
    dist: jnp.ndarray  # (N,) int32
    ok: jnp.ndarray  # (N,) bool


def masked_min2(dist: jnp.ndarray, mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-row best and second-best over a masked distance matrix.

    Returns (best_idx, best_dist, second_dist)."""
    d = jnp.where(mask, dist, INF)
    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    # second-best via masked min (an iota compare, NOT a scatter — TPU
    # row-indexed scatters serialize at ~µs/row)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d2 = jnp.where(cols == best_idx[:, None], INF, d)
    second = jnp.min(d2, axis=1)
    return best_idx, best, second


def rotation_consistency_mask(
    dangle: jnp.ndarray, ok: jnp.ndarray, n_bins: int = 30, keep: int = 3
) -> jnp.ndarray:
    """Keep only matches whose orientation delta falls in the `keep` most
    populated of `n_bins` histogram bins (fmatcher.cpp:2813 semantics)."""
    two_pi = 2.0 * jnp.pi
    frac = jnp.mod(dangle, two_pi) / two_pi
    bins = jnp.clip((frac * n_bins).astype(jnp.int32), 0, n_bins - 1)
    counts = jnp.sum(
        jnp.where(ok[:, None], jax.nn.one_hot(bins, n_bins, dtype=jnp.float32), 0.0),
        axis=0,
    )
    top_vals, top_idx = jax.lax.top_k(counts, keep)
    # reference also drops top bins holding < 10% of the max bin
    good_bin = jnp.zeros((n_bins,), dtype=bool)
    for j in range(keep):
        good_bin = good_bin | (
            (jnp.arange(n_bins) == top_idx[j]) & (top_vals[j] > 0.1 * top_vals[0])
        )
    return ok & good_bin[bins]


@partial(jax.jit, static_argnames=("cross_check",))
def match_descriptors(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    max_dist: int = 50,
    ratio: float = 0.9,
    cross_check: bool = True,
) -> Matches:
    """Brute-force mutual-NN matching with Lowe ratio, the analogue of the
    BoW-free paths in fmatcher (TH_LOW + mvbPrevMatched-style search)."""
    b1, b2 = unpack_bits(desc1), unpack_bits(desc2)
    D = hamming_matrix_bits(b1, b2)
    mask = valid1[:, None] & valid2[None, :]
    idx, best, second = masked_min2(D, mask)
    ok = (best <= max_dist) & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    if cross_check:
        back_idx, back_best, _ = masked_min2(D.T, mask.T)
        mutual = back_idx[idx] == jnp.arange(idx.shape[0], dtype=jnp.int32)
        ok = ok & mutual
    return Matches(idx=idx, dist=best, ok=ok & valid1)


@jax.jit
def search_by_projection(
    proj_uv: jnp.ndarray,
    proj_level: jnp.ndarray,
    proj_desc: jnp.ndarray,
    proj_valid: jnp.ndarray,
    kp_xy: jnp.ndarray,
    kp_level: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_valid: jnp.ndarray,
    radius: jnp.ndarray,
    level_scales: jnp.ndarray,
    max_dist: int = 100,
    ratio: float = 0.9,
    level_slack: int = 1,
) -> Matches:
    """Match projected map points to frame keypoints within a scale-aware
    window (SearchByProjection semantics, fmatcher.cpp:321/:2471).

    proj_uv: (M, 2) projected pixel positions of map points.
    proj_level: (M,) predicted octave for each point (PredictScale).
    radius: scalar or (M,) base search radius in pixels; the effective
      window is radius * scale(level), as in the reference.
    level_scales: (L,) pyramid scale per level.
    Returns, per map point, the matched keypoint index.
    """
    b1 = unpack_bits(proj_desc)
    b2 = unpack_bits(kp_desc)
    D = hamming_matrix_bits(b1, b2)

    r = jnp.broadcast_to(jnp.asarray(radius), proj_uv.shape[:1])
    r_eff = r * level_scales[jnp.clip(proj_level, 0, level_scales.shape[0] - 1)]
    dx = jnp.abs(proj_uv[:, 0:1] - kp_xy[None, :, 0])
    dy = jnp.abs(proj_uv[:, 1:2] - kp_xy[None, :, 1])
    in_window = (dx <= r_eff[:, None]) & (dy <= r_eff[:, None])
    level_ok = jnp.abs(kp_level[None, :] - proj_level[:, None]) <= level_slack
    mask = in_window & level_ok & proj_valid[:, None] & kp_valid[None, :]

    idx, best, second = masked_min2(D, mask)
    ok = (best <= max_dist) & (
        best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    )
    return Matches(idx=idx, dist=best, ok=ok & proj_valid)


def resolve_duplicate_targets(m: Matches, n_targets: int) -> Matches:
    """Enforce one source per target: keep only the lowest-distance source
    claiming each target (the reference enforces this via per-kp bookkeeping
    in its search loops)."""
    # segment-min over targets
    tgt = jnp.where(m.ok, m.idx, n_targets)  # route invalid to a dump slot
    order_key = m.dist.astype(jnp.int64) * (m.idx.shape[0] + 1) + jnp.arange(
        m.idx.shape[0]
    )
    best_key = jax.ops.segment_min(order_key, tgt, num_segments=n_targets + 1)
    winner = best_key[tgt] == order_key
    return Matches(idx=m.idx, dist=m.dist, ok=m.ok & winner)
