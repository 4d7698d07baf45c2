"""Fused Pallas TPU kernel for the FAST-9 front end.

Semantic reference: vilib's GPU FAST + NMS
(`/root/reference/thirdparty/vilib/visual_lib/src/feature_detection/fast/
fast_gpu_cuda_tools.cu:41-245` Bresenham-16 response,
`detector_base_gpu_cuda_tools.cu:624` 3x3 NMS) and the CPU path's
two-threshold fallback (`src/geometry/fextractor.cpp:800-805`).

This kernel fuses, in one VMEM pass over row strips of the image:
  1. the 16 circle-neighbor differences (static shifted slices of the strip),
  2. FAST-9 arc contiguity at BOTH thresholds (bit-trick on a duplicated
     uint32 mask instead of vilib's 2048-entry LUT),
  3. the threshold-excess arc score at the low threshold (rolling 9-window
     sum, so only O(1) arrays are live instead of 16 diff maps),
  4. 3x3 non-max suppression,
  5. the high-threshold preference bonus used by the per-cell fallback
     selection (see `fast.detect_level`).

The XLA reference path (`ops/fast.py`) materializes a (16, H, W) diff
stack twice; here everything stays in a (strip+halo, W) VMEM tile, cutting
HBM traffic to one image read + one response write.

Output matches `nms-then-prefer` semantics of `ops/fast.py`:
  resp_pref = where(nms(resp_low) > 0 & resp_high > 0, nms+1e4, nms)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vi_slam_tpu.ops.fast import BORDER, CIRCLE, ARC_LEN

HALO = BORDER + 1  # circle radius + 1 px for the 3x3 NMS ring


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _strip_kernel(img_hbm, out_ref, tile, sem, *, sh, wp, h, w, th_lo, th_hi):
    """One row strip: rows [i*sh, i*sh+sh) of the original image.

    tile: VMEM scratch (sh + 2*HALO, wp) holding the padded-image strip.
    out_ref: (sh, wp - 2*HALO) response block.
    """
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * sh, sh + 2 * HALO), :], tile, sem
    )
    cp.start()
    cp.wait()

    # Extended region (out strip + 1px NMS ring): tile rows/cols 3..-3.
    eh, ew = sh + 2, wp - 2 * BORDER  # = wp - 6
    center = tile[BORDER : BORDER + eh, BORDER : BORDER + ew]

    def nbr(k):
        dx, dy = int(CIRCLE[k, 0]), int(CIRCLE[k, 1])
        return tile[BORDER + dy : BORDER + dy + eh, BORDER + dx : BORDER + dx + ew]

    def excess_b(k):
        return jnp.maximum(nbr(k) - center - th_lo, 0.0)

    def excess_d(k):
        return jnp.maximum(center - nbr(k) - th_lo, 0.0)

    # Circle-sign bitmasks at both thresholds (bits 0..15).
    zero_u = jnp.zeros((eh, ew), jnp.uint32)
    m_lo_b, m_lo_d, m_hi_b, m_hi_d = zero_u, zero_u, zero_u, zero_u
    for k in range(16):
        d = nbr(k) - center
        bit = np.uint32(1 << k)
        m_lo_b |= jnp.where(d > th_lo, bit, 0).astype(jnp.uint32)
        m_lo_d |= jnp.where(d < -th_lo, bit, 0).astype(jnp.uint32)
        m_hi_b |= jnp.where(d > th_hi, bit, 0).astype(jnp.uint32)
        m_hi_d |= jnp.where(d < -th_hi, bit, 0).astype(jnp.uint32)

    def runs(m):
        """Bit j set iff the 9-arc starting at j is fully set (cyclic)."""
        m2 = m | (m << np.uint32(16))
        r = m2
        for s in range(1, ARC_LEN):
            r = r & (m2 >> np.uint32(s))
        return r

    run_lo_b = runs(m_lo_b)
    run_lo_d = runs(m_lo_d)
    hi_any = (
        ((runs(m_hi_b) | runs(m_hi_d)) & np.uint32(0xFFFF)) != 0
    )

    def arc_best(run, excess):
        """Max over valid arc starts of the 9-window excess sum."""
        window = excess(0)
        for k in range(1, ARC_LEN):
            window = window + excess(k)
        ok = ((run >> np.uint32(0)) & np.uint32(1)) != 0
        best = jnp.where(ok, window, 0.0)
        for j in range(1, 16):
            window = window - excess(j - 1) + excess((j + ARC_LEN - 1) % 16)
            ok = ((run >> np.uint32(j)) & np.uint32(1)) != 0
            best = jnp.maximum(best, jnp.where(ok, window, 0.0))
        return best

    resp = jnp.maximum(arc_best(run_lo_b, excess_b), arc_best(run_lo_d, excess_d))

    # Interior mask in original-image coords: ext row r -> orig i*sh + r - 1,
    # ext col c -> orig c - 1.
    rows = jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 0) + i * sh - 1
    cols = jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 1) - 1
    interior = (
        (rows >= BORDER) & (rows < h - BORDER) & (cols >= BORDER) & (cols < w - BORDER)
    )
    resp = jnp.where(interior, resp, 0.0)

    # 3x3 NMS on the inner (sh, ew-2) region.
    c0 = resp[1 : 1 + sh, 1 : ew - 1]
    mx = c0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            mx = jnp.maximum(mx, resp[1 + dy : 1 + dy + sh, 1 + dx : ew - 1 + dx])
    keep = (c0 >= mx) & (c0 > 0.0)
    nms = jnp.where(keep, c0, 0.0)

    bonus = keep & hi_any[1 : 1 + sh, 1 : ew - 1]
    val = jnp.where(bonus, nms + 1e4, nms)
    out_ref[:] = jnp.zeros((sh, wp), jnp.float32)
    out_ref[:, : ew - 2] = val


@functools.partial(
    jax.jit, static_argnames=("threshold", "min_threshold", "strip", "interpret")
)
def fast_resp_pref(
    image: jnp.ndarray,
    threshold: float,
    min_threshold: float,
    strip: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused FAST response + NMS + high-threshold preference, (H, W) f32.

    Equivalent to ops/fast.detect_level's `resp_pref` intermediate; feed
    into `ops/fast.cell_max` + top_k for keypoint selection.
    """
    h, w = image.shape
    # DMA slices must be lane-aligned: the padded width is the 128 multiple.
    wp = _round_up(w + 2 * HALO, 128)
    n_strips = pl.cdiv(h, strip)
    hp = n_strips * strip + 2 * HALO

    padded = jnp.pad(image, HALO, mode="edge")
    padded = jnp.pad(
        padded, ((0, hp - h - 2 * HALO), (0, wp - w - 2 * HALO)), mode="edge"
    )

    kern = functools.partial(
        _strip_kernel,
        sh=strip,
        wp=wp,
        h=h,
        w=w,
        th_lo=float(min_threshold),
        th_hi=float(threshold),
    )
    out = pl.pallas_call(
        kern,
        grid=(n_strips,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((strip, wp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_strips * strip, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((strip + 2 * HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    # NMS-output col j == ext col j+1 == original col j: no shift needed.
    return out[:h, :w]
