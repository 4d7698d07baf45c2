"""ORB feature extraction pipeline: pyramid -> FAST -> orient -> describe.

Semantic reference: `FExtractor::compute`
(`/root/reference/src/geometry/fextractor.cpp:1034`): 8-level pyramid,
per-cell FAST with threshold fallback, quadtree spatial distribution to
nFeatures, IC orientation, blurred rBRIEF.

TPU redesign of the quadtree (`DistributeOctTree`, fextractor.cpp:530):
spatial uniformity is enforced by per-cell grid NMS (one winner per
`cell`-px cell, vilib-style) and the per-level budget n_l follows the same
geometric split as the reference (nfeatures * (1-f)/(1-f^L) * f^l,
f = 1/scale). Selection is a static `top_k` per level — no data-dependent
recursion, one compiled program per image geometry.

All outputs are fixed-capacity arrays with a validity mask (SURVEY §7.3:
dynamic cardinality under static shapes).
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.ops import fast as fast_ops
from vi_slam_tpu.ops import orb as orb_ops
from vi_slam_tpu.ops import pyramid as pyr_ops
from vi_slam_tpu.utils.config import ExtractorConfig


class Features(NamedTuple):
    """Fixed-capacity keypoint set for one image.

    xy:     (N, 2) float32 — level-0 (undistorted-image) pixel coords
    level:  (N,)  int32    — pyramid level
    angle:  (N,)  float32  — orientation (radians)
    score:  (N,)  float32  — detector response
    desc:   (N, 8) uint32  — packed 256-bit descriptors
    valid:  (N,)  bool
    """

    xy: jnp.ndarray
    level: jnp.ndarray
    angle: jnp.ndarray
    score: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


def level_budgets(n_features: int, n_levels: int, scale_factor: float) -> List[int]:
    """Per-level keypoint budgets, mirroring fextractor.cpp's geometric
    distribution (ComputeKeyPointsOctTree target counts)."""
    f = 1.0 / scale_factor
    first = n_features * (1.0 - f) / (1.0 - f ** n_levels)
    budgets = []
    acc = 0
    for l in range(n_levels):
        if l == n_levels - 1:
            budgets.append(max(n_features - acc, 0))
        else:
            b = int(round(first * f ** l))
            budgets.append(b)
            acc += b
    return budgets


ATLAS_SEP = 21  # zero rows between stacked levels (>= patch/SAD reach)


def atlas_row_offsets(shapes, budgets) -> List[int]:
    """Starting atlas row of each level (levels with zero budget get -1)."""
    offs, row = [], 0
    for (h, _w), b in zip(shapes, budgets):
        if b <= 0:
            offs.append(-1)
            continue
        offs.append(row)
        row += h + ATLAS_SEP
    return offs


class OrbExtractor:
    """Compiles one jitted extraction program per image shape."""

    def __init__(self, cfg: ExtractorConfig, height: int, width: int):
        self.cfg = cfg
        self.height = height
        self.width = width
        self.shapes = pyr_ops.level_shapes(height, width, cfg.n_levels, cfg.scale_factor)
        self.scales = pyr_ops.scale_factors(cfg.n_levels, cfg.scale_factor)
        self.budgets = level_budgets(cfg.n_features, cfg.n_levels, cfg.scale_factor)
        self.row_offsets = atlas_row_offsets(self.shapes, self.budgets)
        # the fused Pallas FAST kernel only lowers on real TPU backends;
        # CPU (tests, virtual-device meshes) falls back to the XLA path
        self._pallas_ok = jax.default_backend() == "tpu"
        self._fn = jax.jit(self._extract)
        self._fn_atlas = jax.jit(self._extract_core)

    def __call__(self, image: jnp.ndarray) -> Features:
        return self._fn(image)

    def _extract(self, image: jnp.ndarray) -> Features:
        return self._extract_core(image)[0]

    def _extract_core(self, image: jnp.ndarray):
        """Flattened multi-level extraction.

        Detection runs per level (cheap static-shape ops on the native
        level size). Everything per-keypoint is then batched ACROSS levels
        through a vertical level atlas: blurred levels are stacked with
        21 zero separator rows (>= the radius-15 moment circle and the
        descriptor patch clip), so one moment-map pass, one patch gather,
        and one stencil matmul serve all 2000 keypoints — per-keypoint
        gathers are the dominant TPU cost, and their launch overhead
        amortizes across levels. Zero separators reproduce exactly the
        per-level zero ("SAME") boundary semantics.
        """
        cfg = self.cfg
        W = self.width
        SEP = ATLAS_SEP
        levels = pyr_ops.build_pyramid(image, cfg.n_levels, cfg.scale_factor)

        xs, ys, lv, sc, va, atlas_rows, row_offs = [], [], [], [], [], [], []
        atlas_xy = []
        row = 0
        for l, img in enumerate(levels):
            budget = self.budgets[l]
            if budget <= 0:
                continue
            if cfg.use_pallas_fast and self._pallas_ok:
                # fused VMEM kernel: one image read, one response write
                # (vilib fast_gpu equivalent; see ops/fast_pallas.py)
                from vi_slam_tpu.ops import fast_pallas

                pref = fast_pallas.fast_resp_pref(
                    img, cfg.fast_threshold, cfg.fast_min_threshold
                )
                xy, score, valid = fast_ops.select_keypoints(
                    pref, cfg.cell_size, budget
                )
            else:
                xy, score, valid = fast_ops.detect_level(
                    img,
                    cell=cfg.cell_size,
                    top_k=budget,
                    threshold=cfg.fast_threshold,
                    min_threshold=cfg.fast_min_threshold,
                )
            # keypoints too close to the border can't support the descriptor
            # patch; drop them (reference uses EDGE_THRESHOLD=19 margins)
            h, w = img.shape
            margin = orb_ops._PATCH_C + 2
            inb = (
                (xy[:, 0] >= margin)
                & (xy[:, 0] < w - margin)
                & (xy[:, 1] >= margin)
                & (xy[:, 1] < h - margin)
            )
            valid = valid & inb
            s = self.scales[l]
            xs.append(xy[:, 0] * s)
            ys.append(xy[:, 1] * s)
            lv.append(jnp.full((xy.shape[0],), l, dtype=jnp.int32))
            sc.append(score)
            va.append(valid)
            atlas_xy.append(xy + jnp.asarray([0.0, row], jnp.float32))
            atlas_rows.append(jnp.pad(img, ((0, SEP), (0, W - w))))
            row += h + SEP

        atlas = jnp.concatenate(atlas_rows, axis=0)
        xy_atlas = jnp.concatenate(atlas_xy, axis=0)
        # IC angle on the raw image, descriptors on the blurred one
        # (fextractor.cpp:1086-1091); one blur pass serves all levels.
        angle = orb_ops.orientations(atlas, xy_atlas)
        desc = orb_ops.describe_patches(
            pyr_ops.gaussian_blur(atlas), xy_atlas, angle
        )

        xy = jnp.stack([jnp.concatenate(xs), jnp.concatenate(ys)], axis=-1)
        feats = Features(
            xy=xy,
            level=jnp.concatenate(lv),
            angle=angle,
            score=jnp.concatenate(sc),
            desc=desc,
            valid=jnp.concatenate(va),
        )
        # pad/trim to exactly n_features for a stable downstream shape
        cap = self.cfg.n_features
        n = feats.xy.shape[0]
        if n < cap:
            pad = cap - n
            feats = Features(
                xy=jnp.pad(feats.xy, ((0, pad), (0, 0))),
                level=jnp.pad(feats.level, (0, pad)),
                angle=jnp.pad(feats.angle, (0, pad)),
                score=jnp.pad(feats.score, (0, pad)),
                desc=jnp.pad(feats.desc, ((0, pad), (0, 0))),
                valid=jnp.pad(feats.valid, (0, pad)),
            )
        elif n > cap:
            feats = Features(*(a[:cap] for a in feats))
        # the raw (unblurred) level atlas doubles as the stereo-SAD image
        # source (ops/stereo.py gathers patches from it by level row offset)
        return feats, atlas
