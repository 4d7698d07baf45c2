"""Two-view reconstruction for monocular initialization: parallel H/F
RANSAC, model selection, motion recovery, triangulation.

Semantic reference: `MonoInitializer`
(`/root/reference/src/core/monoinitializer.cpp` — `Initialize`,
`FindHomography`/`FindFundamental` run in parallel threads,
symmetric-transfer scoring `CheckHomography`/`CheckFundamental`,
selection RH = SH/(SH+SF) > 0.40, `ReconstructH` (Faugeras decomposition)
/ `ReconstructF` (E decomposition, 4 hypotheses), `CheckRT`) and the
equivalent `MotionEstimator::Reconstruct`
(`/root/reference/src/geometry/motion_estimation.cpp:2006`).

TPU redesign: the reference's two RANSAC *threads* become one fused
program where every hypothesis of both models is solved in a single
vmap — (H, 8) sampled correspondences -> batched normalized DLT (H and
F share the samples, like the reference's shared mvSets) -> batched
symmetric-transfer scoring -> argmax. Motion hypotheses (4 from E, 8
from H) are all triangulated and scored in one batched CheckRT; the
winner is a branch-free argmax. No sequential hypothesis loop anywhere.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vi_slam_tpu.cameras.base import CameraParams
from vi_slam_tpu.geometry.triangulate import triangulate_dlt
from vi_slam_tpu.lie.se3 import SE3
from vi_slam_tpu.utils.precision import precise

# chi2 thresholds (monoinitializer.cpp CheckHomography/CheckFundamental)
_TH_H = 5.991
_TH_F = 3.841
_TH_SCORE = 5.991  # score cap term


class TwoViewResult(NamedTuple):
    ok: jnp.ndarray  # () bool
    T21: SE3  # pose of view 2 wrt view 1 (world = view 1)
    points: jnp.ndarray  # (N, 3) triangulated points (view-1 frame)
    inliers: jnp.ndarray  # (N,) bool — triangulated good points
    n_good: jnp.ndarray  # () int32
    used_homography: jnp.ndarray  # () bool


# ---------------------------------------------------------------------------
# model estimation (normalized DLT, batched over hypotheses)
# ---------------------------------------------------------------------------


def _normalize(x: jnp.ndarray, w: jnp.ndarray):
    """Similarity normalization (mean 0, mean abs dev 1) as in
    MonoInitializer::Normalize."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mean = jnp.sum(x * w[:, None], axis=0) / wsum
    d = x - mean
    md = jnp.sum(jnp.abs(d) * w[:, None], axis=0) / wsum
    s = 1.0 / jnp.maximum(md, 1e-9)
    xn = d * s
    T = jnp.asarray(
        [
            [s[0], 0.0, -mean[0] * s[0]],
            [0.0, s[1], -mean[1] * s[1]],
            [0.0, 0.0, 1.0],
        ],
        x.dtype,
    )
    return xn, T


def _h_dlt(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Homography from 8 correspondences (x2 ~ H x1), unnormalized DLT on
    pre-normalized coords. x1/x2: (8, 2). Returns (3,3)."""
    n = x1.shape[0]
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (16, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[-1].reshape(3, 3)


def _f_8point(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Fundamental matrix from 8 correspondences, rank-2 enforced."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1
    )  # (8, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[-1].reshape(3, 3)
    U, s, Vt2 = jnp.linalg.svd(F)
    s = s.at[2].set(0.0)
    return U @ jnp.diag(s) @ Vt2


def _score_h(H21, H12, x1, x2, valid, sigma2):
    """Symmetric transfer error score (CheckHomography semantics)."""

    def transfer(Hm, a, b):
        ah = jnp.concatenate([a, jnp.ones_like(a[:, :1])], axis=-1)
        p = ah @ Hm.T
        w = p[:, 2]
        uv = p[:, :2] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)[:, None]
        return jnp.sum((uv - b) ** 2, axis=-1)

    chi1 = transfer(H21, x1, x2) / sigma2
    chi2 = transfer(H12, x2, x1) / sigma2
    ok = valid & (chi1 < _TH_H) & (chi2 < _TH_H)
    score = jnp.where(
        valid & (chi1 < _TH_H), _TH_SCORE - chi1, 0.0
    ) + jnp.where(valid & (chi2 < _TH_H), _TH_SCORE - chi2, 0.0)
    return jnp.sum(score), ok


def _score_f(F21, x1, x2, valid, sigma2):
    """Epipolar-distance score (CheckFundamental semantics)."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    l2 = x1h @ F21.T  # epiline in image 2
    l1 = x2h @ F21  # epiline in image 1
    d2 = jnp.sum(x2h * l2, axis=-1) ** 2 / jnp.maximum(
        l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12
    )
    d1 = jnp.sum(x1h * l1, axis=-1) ** 2 / jnp.maximum(
        l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12
    )
    chi1 = d2 / sigma2
    chi2 = d1 / sigma2
    ok = valid & (chi1 < _TH_F) & (chi2 < _TH_F)
    score = jnp.where(
        valid & (chi1 < _TH_F), _TH_SCORE - chi1, 0.0
    ) + jnp.where(valid & (chi2 < _TH_F), _TH_SCORE - chi2, 0.0)
    return jnp.sum(score), ok


# ---------------------------------------------------------------------------
# motion recovery
# ---------------------------------------------------------------------------


def _decompose_e(E: jnp.ndarray):
    """E -> 4 (R, t) hypotheses (DecomposeE, monoinitializer.cpp)."""
    U, _s, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _decompose_h(H: jnp.ndarray, K: jnp.ndarray, Kinv: jnp.ndarray):
    """Faugeras SVD decomposition of a calibrated homography into 8
    motion hypotheses (ReconstructH semantics, monoinitializer.cpp)."""
    A = Kinv @ H @ K
    U, s, Vt = jnp.linalg.svd(A)
    V = Vt.T
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(V)
    sgn = detU * detV
    d1, d2, d3 = s[0], s[1], s[2]

    # x1/x3 magnitudes (Faugeras); guard degenerate d1~d3
    den = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    aux1 = jnp.sqrt(jnp.maximum(d1 * d1 - d2 * d2, 0.0) / den)
    aux3 = jnp.sqrt(jnp.maximum(d2 * d2 - d3 * d3, 0.0) / den)
    x1s = jnp.asarray([1.0, 1.0, -1.0, -1.0], A.dtype) * aux1
    x3s = jnp.asarray([1.0, -1.0, 1.0, -1.0], A.dtype) * aux3

    # case d' > 0
    sin_t = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    # sign(s_theta) = sign(x1) * sign(x3) for each of the 4 combinations
    eps = jnp.asarray([1.0, -1.0, -1.0, 1.0], A.dtype)
    stheta = eps * sin_t

    def make_pos(i):
        Rp = jnp.asarray(
            [
                [cos_t, 0.0, -stheta[i]],
                [0.0, 1.0, 0.0],
                [stheta[i], 0.0, cos_t],
            ],
            A.dtype,
        )
        tp = (d1 - d3) * jnp.asarray([x1s[i], 0.0, -x3s[i]], A.dtype)
        R = sgn * (U @ Rp @ Vt)
        t = U @ tp
        return R, t

    # case d' < 0
    sin_p = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sphi = eps * sin_p  # same sign(x1)*sign(x3) pattern

    def make_neg(i):
        Rp = jnp.asarray(
            [
                [cos_p, 0.0, sphi[i]],
                [0.0, -1.0, 0.0],
                [sphi[i], 0.0, -cos_p],
            ],
            A.dtype,
        )
        tp = (d1 + d3) * jnp.asarray([x1s[i], 0.0, x3s[i]], A.dtype)
        R = sgn * (U @ Rp @ Vt)
        t = U @ tp
        return R, t

    Rs, ts = [], []
    for i in range(4):
        R, t = make_pos(i)
        Rs.append(R)
        ts.append(t)
    for i in range(4):
        R, t = make_neg(i)
        Rs.append(R)
        ts.append(t)
    Rs = jnp.stack(Rs)
    ts = jnp.stack(ts)
    ts = ts / jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    return Rs, ts


def _check_rt(
    R: jnp.ndarray,
    t: jnp.ndarray,
    x1n: jnp.ndarray,
    x2n: jnp.ndarray,
    valid: jnp.ndarray,
    sigma2: jnp.ndarray,
    fx: jnp.ndarray,
    min_parallax_cos: float = 0.99998,
):
    """Score one motion hypothesis: triangulate all matches, count points
    with positive depth in both views, adequate parallax, and low
    reprojection error (CheckRT, monoinitializer.cpp).

    x1n/x2n: (N, 2) normalized image coords (K^-1 applied)."""
    T1 = SE3.identity(dtype=x1n.dtype)
    T2 = SE3(R, t)
    b1 = jnp.concatenate([x1n, jnp.ones_like(x1n[:, :1])], axis=-1)
    b2 = jnp.concatenate([x2n, jnp.ones_like(x2n[:, :1])], axis=-1)
    xw = triangulate_dlt(T1, T2, b1, b2)
    z1 = xw[:, 2]
    pc2 = T2.apply(xw)
    z2 = pc2[:, 2]
    # parallax
    c2 = -R.T @ t
    r1 = xw
    r2 = xw - c2
    cosp = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
    )
    # reprojection error in pixels^2 (scaled by fx as proxy for K)
    p1 = xw[:, :2] / jnp.maximum(z1, 1e-12)[:, None]
    p2 = pc2[:, :2] / jnp.maximum(z2, 1e-12)[:, None]
    e1 = jnp.sum((p1 - x1n) ** 2, axis=-1) * fx * fx
    e2 = jnp.sum((p2 - x2n) ** 2, axis=-1) * fx * fx
    good = (
        valid
        & (z1 > 0)
        & (z2 > 0)
        & (cosp < min_parallax_cos)
        & (e1 < 4.0 * sigma2)
        & (e2 < 4.0 * sigma2)
    )
    # median-parallax proxy: use a high quantile of (1 - cosp) among good
    par = jnp.where(good, 1.0 - cosp, 0.0)
    return jnp.sum(good), xw, good, par


# ---------------------------------------------------------------------------
# main entry
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_hyp",))
@precise
def reconstruct_two_view(
    cam: CameraParams,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    valid: jnp.ndarray,
    sigma2: jnp.ndarray,
    key: jax.Array,
    n_hyp: int = 200,
) -> TwoViewResult:
    """Full monocular initialization from matched pixel coords (N,2)+(N,2).

    Mirrors MonoInitializer::Initialize: shared RANSAC samples for H and
    F, symmetric-transfer model selection (RH > 0.40), motion recovery
    from the winning model, CheckRT hypothesis selection. ok requires
    enough good triangulations (>=50 and >=90% of inliers, relaxed from
    the reference's seed thresholds).
    """
    N = uv1.shape[0]
    dtype = uv1.dtype
    w = valid.astype(dtype)

    # --- normalization (shared by both models)
    x1n_img, T1 = _normalize(uv1, w)
    x2n_img, T2 = _normalize(uv2, w)
    T2inv = jnp.linalg.inv(T2)

    # --- shared hypothesis samples
    probs = w / jnp.maximum(jnp.sum(w), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hyp, 8), replace=True, p=probs)

    def solve_models(sample):
        a1 = x1n_img[sample]
        a2 = x2n_img[sample]
        Hn = _h_dlt(a1, a2)
        Fn = _f_8point(a1, a2)
        H21 = T2inv @ Hn @ T1
        F21 = T2.T @ Fn @ T1
        return H21 / jnp.where(jnp.abs(H21[2, 2]) < 1e-12, 1e-12, H21[2, 2]), F21

    H_all, F_all = jax.vmap(solve_models)(idx)

    def score_pair(H21, F21):
        H12 = jnp.linalg.inv(H21)
        sh, _ = _score_h(H21, H12, uv1, uv2, valid, sigma2)
        sf, _ = _score_f(F21, uv1, uv2, valid, sigma2)
        return sh, sf

    SH_all, SF_all = jax.vmap(score_pair)(H_all, F_all)
    bh = jnp.argmax(SH_all)
    bf = jnp.argmax(SF_all)
    H_best = H_all[bh]
    F_best = F_all[bf]
    SH = SH_all[bh]
    SF = SF_all[bf]
    _, inl_h = _score_h(H_best, jnp.linalg.inv(H_best), uv1, uv2, valid, sigma2)
    _, inl_f = _score_f(F_best, uv1, uv2, valid, sigma2)

    use_h = SH / jnp.maximum(SH + SF, 1e-12) > 0.40

    # --- motion hypotheses from both models (compute both, select)
    Km = jnp.asarray(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]], dtype
    )
    Kinv = jnp.linalg.inv(Km)
    E = Km.T @ F_best @ Km
    Rs_e, ts_e = _decompose_e(E)  # (4,...)
    Rs_h, ts_h = _decompose_h(H_best, Km, Kinv)  # (8,...)
    Rs = jnp.concatenate([Rs_e, Rs_h], axis=0)  # (12,...)
    ts = jnp.concatenate([ts_e, ts_h], axis=0)
    hyp_from_h = jnp.concatenate(
        [jnp.zeros((4,), bool), jnp.ones((8,), bool)]
    )
    hyp_enabled = jnp.where(use_h, hyp_from_h, ~hyp_from_h)
    model_inl = jnp.where(use_h, inl_h, inl_f)

    # normalized coords
    x1n = (uv1 - jnp.asarray([cam.cx, cam.cy], dtype)) / jnp.asarray(
        [cam.fx, cam.fy], dtype
    )
    x2n = (uv2 - jnp.asarray([cam.cx, cam.cy], dtype)) / jnp.asarray(
        [cam.fx, cam.fy], dtype
    )

    def check(R, t, en):
        n_good, xw, good, par = _check_rt(
            R, t, x1n, x2n, model_inl, sigma2, jnp.asarray(cam.fx, dtype)
        )
        # median parallax among good points (ReconstructH/F parallax gate)
        par_sorted = jnp.sort(par)
        med_par = par_sorted[par.shape[0] - jnp.maximum(n_good // 2, 1)]
        return jnp.where(en, n_good, -1), xw, good, med_par

    n_goods, xws, goods, med_pars = jax.vmap(check)(Rs, ts, hyp_enabled)
    # near-ties on n_good (twisted-pair H ambiguity) break on parallax:
    # the physical solution triangulates with more parallax
    top = jnp.max(n_goods)
    tie = n_goods.astype(dtype) > 0.95 * jnp.maximum(top, 1).astype(dtype)
    best = jnp.argmax(jnp.where(tie, med_pars, -1.0))
    n_best = n_goods[best]
    n_inl = jnp.sum(model_inl)
    # winner must dominate (ReconstructF: nsimilar check — unique winner)
    sorted_goods = jnp.sort(n_goods)
    second = sorted_goods[-2]
    ok = (
        (n_best >= 50)
        & (n_best.astype(dtype) > 0.75 * n_inl.astype(dtype))
        & (second.astype(dtype) < 0.75 * n_best.astype(dtype))
    )
    return TwoViewResult(
        ok=ok,
        T21=SE3(Rs[best], ts[best]),
        points=xws[best],
        inliers=goods[best],
        n_good=n_best.astype(jnp.int32),
        used_homography=use_h,
    )
