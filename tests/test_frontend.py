"""Image-frontend unit tests vs independent numpy references.

Covers (SURVEY §4 per-kernel test demands): FAST-9 arc semantics vs a
brute-force numpy implementation (`fast_gpu_cuda_tools.cu:41-245`
semantics), NMS + grid selection, IC-angle and rBRIEF behavior under 90°
rotation (fextractor.cpp IC_Angle / computeOrbDescriptor), the stereo
scanline matcher recovering a known disparity (fmatcher.cpp
ComputeStereoMatches capability), extractor sanity on flat vs textured
input, and Pallas/XLA equivalence of the fused FAST response kernel.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vi_slam_tpu.features.extractor import OrbExtractor
from vi_slam_tpu.ops import fast as fast_ops
from vi_slam_tpu.ops import orb as orb_ops
from vi_slam_tpu.ops import pyramid as pyr_ops
from vi_slam_tpu.ops import stereo as stereo_ops
from vi_slam_tpu.ops.hamming import popcount_u32
from vi_slam_tpu.utils.config import ExtractorConfig


def np_fast_response(img: np.ndarray, t: float) -> np.ndarray:
    """Brute-force FAST-9: max over contiguous 9-arcs (bright or dark) of
    the summed threshold excess; 0 when no valid arc."""
    h, w = img.shape
    resp = np.zeros((h, w), np.float64)
    circle = np.asarray(fast_ops.CIRCLE)
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            c = img[y, x]
            d = np.array(
                [img[y + dy, x + dx] - c for dx, dy in circle], np.float64
            )
            best = 0.0
            for sign in (1.0, -1.0):
                e = np.maximum(sign * d - t, 0.0)
                m = np.concatenate([sign * d > t] * 2)
                for j in range(16):
                    if m[j : j + 9].all():
                        idx = np.arange(j, j + 9) % 16
                        best = max(best, float(e[idx].sum()))
            resp[y, x] = best
    return resp


def test_fast_response_matches_bruteforce():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, size=(24, 32)).astype(np.float32)
    t = 20.0
    got = np.asarray(fast_ops.fast_response(jnp.asarray(img), t))
    want = np_fast_response(img.astype(np.float64), t)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_nms3x3_keeps_local_maxima():
    r = np.zeros((8, 8), np.float32)
    r[2, 2] = 5.0
    r[2, 3] = 4.0  # suppressed by the 5
    r[6, 6] = 3.0
    out = np.asarray(fast_ops.nms3x3(jnp.asarray(r)))
    assert out[2, 2] == 5.0 and out[6, 6] == 3.0
    assert out[2, 3] == 0.0


def test_cell_max_one_winner_per_cell():
    r = np.zeros((8, 8), np.float32)
    r[1, 1] = 2.0
    r[2, 3] = 7.0  # same 4px cell, wins
    r[5, 6] = 1.0
    score, x, y = fast_ops.cell_max(jnp.asarray(r), 4)
    s = np.asarray(score)
    assert s.shape == (4,)
    assert s[0] == 7.0 and int(x[0]) == 3 and int(y[0]) == 2
    assert s[3] == 1.0 and int(x[3]) == 6 and int(y[3]) == 5


def _wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def test_ic_angle_rotates_with_image():
    """A 90° image rotation shifts the IC angle by 90°
    (IC_Angle semantics, fextractor.cpp)."""
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, size=(64, 64)).astype(np.float32)
    # make the patch anisotropic so the angle is well-defined
    img[:32, :] += 80.0
    a0 = float(
        orb_ops.orientations(
            jnp.asarray(img), jnp.asarray([[32.0, 32.0]])
        )[0]
    )
    rot = np.rot90(img)  # CCW: out[y', x'] = img[x', 63 - y']
    a1 = float(
        orb_ops.orientations(
            jnp.asarray(np.ascontiguousarray(rot)),
            jnp.asarray([[32.0, 31.0]]),
        )[0]
    )
    assert abs(abs(_wrap(a1 - a0)) - np.pi / 2) < 0.1


def test_rbrief_rotation_invariance():
    """rBRIEF descriptors of the same (rotated) patch stay close in
    Hamming distance (steered BRIEF, computeOrbDescriptor)."""
    rng = np.random.default_rng(11)
    img = rng.uniform(0, 255, size=(64, 64)).astype(np.float32)
    img[:32, :] += 80.0
    b0 = pyr_ops.gaussian_blur(jnp.asarray(img))
    rot = np.ascontiguousarray(np.rot90(img))
    b1 = pyr_ops.gaussian_blur(jnp.asarray(rot))
    xy0 = jnp.asarray([[32.0, 32.0]])
    xy1 = jnp.asarray([[32.0, 31.0]])
    a0 = orb_ops.orientations(jnp.asarray(img), xy0)
    a1 = orb_ops.orientations(jnp.asarray(rot), xy1)
    d0 = orb_ops.describe_patches(b0, xy0, a0)
    d1 = orb_ops.describe_patches(b1, xy1, a1)
    ham = int(jnp.sum(popcount_u32(d0 ^ d1)))
    assert ham < 48, f"rotated-patch Hamming distance {ham}"
    # sanity: a different location is NOT close
    d2 = orb_ops.describe_patches(
        b0, jnp.asarray([[40.0, 24.0]]),
        orb_ops.orientations(jnp.asarray(img), jnp.asarray([[40.0, 24.0]])),
    )
    assert int(jnp.sum(popcount_u32(d0 ^ d2))) > 60


@pytest.fixture(scope="module")
def textured_pair():
    """Stereo pair with constant ground-truth disparity 20 px."""
    rng = np.random.default_rng(19)
    H, W, D = 192, 256, 20
    # blocky random texture: strong stable corners at block boundaries
    base = np.kron(
        rng.uniform(0, 255, size=(H // 4, (W + D) // 4)), np.ones((4, 4))
    ).astype(np.float32)
    left = base[:, :W]
    right = base[:, D : D + W]
    return left, right, D


def test_stereo_scanline_recovers_disparity(textured_pair):
    left, right, D = textured_pair
    cfg = ExtractorConfig(n_features=512)
    ext = OrbExtractor(cfg, left.shape[0], left.shape[1])
    fL, atlasL = ext._fn_atlas(jnp.asarray(left))
    fR, atlasR = ext._fn_atlas(jnp.asarray(right))
    sm = stereo_ops.match_stereo(
        fL, fR, atlasL, atlasR,
        jnp.asarray(ext.row_offsets, jnp.int32),
        jnp.asarray(ext.scales), jnp.asarray(100.0),
        max_disp=64.0,
    )
    ok = np.asarray(sm.ok & fL.valid)
    disp = np.asarray(fL.xy[:, 0] - sm.u_right)[ok]
    # the median-SAD sweep (frame.cpp:960-978) trims the high-SAD tail
    # even of an all-correct population, so the count bound is lower than
    # the raw candidate count; the disparity assertions below are the
    # real gate
    assert ok.sum() > 25, f"only {ok.sum()} stereo matches"
    med = float(np.median(disp))
    assert abs(med - D) < 0.75, f"median disparity {med} vs gt {D}"
    frac_good = float(np.mean(np.abs(disp - D) < 1.5))
    assert frac_good > 0.8, frac_good


def test_extractor_flat_vs_textured(textured_pair):
    left, _, _ = textured_pair
    # cell_size=16: the grid NMS allows one winner per cell, so a 192x256
    # image needs a finer grid than the full-frame default to fill budget
    cfg = ExtractorConfig(n_features=512, cell_size=16)
    ext = OrbExtractor(cfg, left.shape[0], left.shape[1])
    flat = ext(jnp.zeros(left.shape, jnp.float32))
    assert int(jnp.sum(flat.valid)) == 0
    feats = ext(jnp.asarray(left))
    n = int(jnp.sum(feats.valid))
    assert n > 150, n
    lv = np.asarray(feats.level)[np.asarray(feats.valid)]
    assert len(np.unique(lv)) >= 3, "keypoints should span pyramid levels"


def test_pallas_fast_matches_xla():
    """The fused Pallas response kernel (interpret mode on CPU) matches
    the XLA `resp_pref` map bit-for-bit in structure."""
    from vi_slam_tpu.ops import fast_pallas

    rng = np.random.default_rng(23)
    img = rng.uniform(0, 255, size=(64, 96)).astype(np.float32)
    want = np.asarray(fast_ops.resp_pref(jnp.asarray(img), 20.0, 7.0))
    got = np.asarray(
        fast_pallas.fast_resp_pref(
            jnp.asarray(img), 20.0, 7.0, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_pallas_extractor_path(textured_pair):
    """The extractor's use_pallas_fast flag yields the same keypoints."""
    left, _, _ = textured_pair
    cfg = ExtractorConfig(n_features=256)
    ext_x = OrbExtractor(cfg, left.shape[0], left.shape[1])
    fx = ext_x(jnp.asarray(left))
    import dataclasses

    # interpret mode isn't reachable through the config flag (it targets
    # real TPUs); emulate by patching the kernel to interpret mode
    from vi_slam_tpu.ops import fast_pallas

    orig = fast_pallas.fast_resp_pref
    fast_pallas.fast_resp_pref = (
        lambda img, th, tl, **kw: orig(img, th, tl, interpret=True)
    )
    try:
        cfg_p = dataclasses.replace(cfg, use_pallas_fast=True)
        ext_p = OrbExtractor(cfg_p, left.shape[0], left.shape[1])
        # the backend gate would fall back to XLA on CPU; force the
        # pallas branch so interpret mode actually runs it
        ext_p._pallas_ok = True
        fp = ext_p(jnp.asarray(left))
    finally:
        fast_pallas.fast_resp_pref = orig
    np.testing.assert_array_equal(np.asarray(fx.valid), np.asarray(fp.valid))
    np.testing.assert_allclose(
        np.asarray(fx.xy), np.asarray(fp.xy), atol=1e-5
    )
