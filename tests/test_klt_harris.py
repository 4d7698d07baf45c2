"""Harris detector + pyramidal LK tracker tests vs known ground truth.

Semantic reference: vilib Harris GPU detector and
`feature_tracker_gpu.cpp` (translation LK over patch pyramids) — SURVEY
§2.2 first-class GPU kernel capabilities.
"""

import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.ops import harris, klt
from vi_slam_tpu.ops import pyramid as pyr_ops


def _texture(h, w, seed=0, block=4):
    rng = np.random.default_rng(seed)
    return np.kron(
        rng.uniform(0, 255, size=(h // block, w // block)),
        np.ones((block, block)),
    ).astype(np.float32)


def test_harris_corner_vs_edge_vs_flat():
    img = np.zeros((64, 64), np.float32)
    img[20:, 20:] = 200.0  # one corner at (20, 20), edges along its sides
    r = np.asarray(harris.harris_response(jnp.asarray(img), radius=2))
    cy, cx = np.unravel_index(np.argmax(r), r.shape)
    assert abs(cx - 20) <= 2 and abs(cy - 20) <= 2, (cx, cy)
    # edge response (midway along the vertical edge) far below the corner
    assert r[40, 20] < 0.1 * r[cy, cx]
    # flat region is exactly zero
    assert r[10, 10] == 0.0 and r[40, 40] == 0.0


def test_detect_harris_on_texture():
    img = _texture(128, 160, seed=5)
    xy, score, valid = harris.detect_harris(
        jnp.asarray(img), cell=16, top_k=256
    )
    n = int(jnp.sum(valid))
    assert n > 40, n
    flat_xy, _, flat_valid = harris.detect_harris(
        jnp.zeros((128, 160), jnp.float32), cell=16, top_k=256
    )
    assert int(jnp.sum(flat_valid)) == 0


def test_klt_integer_shift():
    img = _texture(128, 160, seed=7)
    dx, dy = 3, 2
    nxt = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    pyr_p = pyr_ops.build_halfsample_pyramid(jnp.asarray(img), 3)
    pyr_n = pyr_ops.build_halfsample_pyramid(jnp.asarray(nxt), 3)
    xy, _, valid = harris.detect_harris(jnp.asarray(img), cell=16,
                                        top_k=128)
    res = klt.track_pyramidal(pyr_p, pyr_n, xy, valid)
    ok = np.asarray(res.ok)
    assert ok.sum() > 30, ok.sum()
    flow = np.asarray(res.xy - xy)[ok]
    err = np.abs(flow - np.asarray([dx, dy]))
    assert np.median(err[:, 0]) < 0.15 and np.median(err[:, 1]) < 0.15, (
        np.median(err, axis=0)
    )


def test_klt_large_shift_needs_pyramid():
    """A 12-px shift exceeds the single-level basin; the pyramid finds it
    (the point of the per-level schedule, feature_tracker_cuda_tools.cu)."""
    img = _texture(160, 192, seed=9, block=8)
    dx = 12
    nxt = np.roll(img, dx, axis=1)
    pyr_p = pyr_ops.build_halfsample_pyramid(jnp.asarray(img), 4)
    pyr_n = pyr_ops.build_halfsample_pyramid(jnp.asarray(nxt), 4)
    xy, _, valid = harris.detect_harris(jnp.asarray(img), cell=16,
                                        top_k=128)
    res = klt.track_pyramidal(pyr_p, pyr_n, xy, valid)
    ok = np.asarray(res.ok)
    assert ok.sum() > 20, ok.sum()
    flow_x = np.asarray(res.xy - xy)[ok, 0]
    assert abs(np.median(flow_x) - dx) < 0.3, np.median(flow_x)


def test_klt_rejects_garbage():
    """Tracking into an uncorrelated image fails the residual gate."""
    img = _texture(128, 160, seed=11)
    other = _texture(128, 160, seed=12)
    pyr_p = pyr_ops.build_halfsample_pyramid(jnp.asarray(img), 3)
    pyr_n = pyr_ops.build_halfsample_pyramid(jnp.asarray(other), 3)
    xy, _, valid = harris.detect_harris(jnp.asarray(img), cell=16,
                                        top_k=128)
    res = klt.track_pyramidal(pyr_p, pyr_n, xy, valid)
    n_valid = max(int(np.asarray(valid).sum()), 1)
    frac = float(np.asarray(res.ok).sum()) / n_valid
    assert frac < 0.25, frac
