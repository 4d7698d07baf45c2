"""Planar-target camera calibration (Zhang's method, pure numpy).

Reference analogue: `tools/calibrate_camera.py` (OpenCV chessboard
calibration). This build has no OpenCV; the same capability — recover
fx, fy, cx, cy from several views of a planar grid — is implemented
directly: per-view DLT homographies, then the IAC linear system on the
homography constraints, then per-view extrinsics.

Input: an .npz with arrays `obj` (V, N, 2) planar target coordinates and
`img` (V, N, 2) detected pixel positions (V views, N points/view).
`--selftest` generates synthetic views and checks recovery instead.

Usage:
  python tools/calibrate_camera.py corr.npz
  python tools/calibrate_camera.py --selftest
"""

import argparse
import sys

import numpy as np


def homography_dlt(obj_xy: np.ndarray, img_xy: np.ndarray) -> np.ndarray:
    """DLT homography target-plane -> image (normalized for conditioning)."""

    def normalize(pts):
        c = pts.mean(0)
        s = np.sqrt(2.0) / max(np.linalg.norm(pts - c, axis=1).mean(), 1e-9)
        T = np.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1.0]])
        ph = np.concatenate([pts, np.ones((len(pts), 1))], 1)
        return (T @ ph.T).T, T

    a, Ta = normalize(obj_xy)
    b, Tb = normalize(img_xy)
    n = len(a)
    A = np.zeros((2 * n, 9))
    for i in range(n):
        X, Y, _ = a[i]
        u, v, _ = b[i]
        A[2 * i] = [-X, -Y, -1, 0, 0, 0, u * X, u * Y, u]
        A[2 * i + 1] = [0, 0, 0, -X, -Y, -1, v * X, v * Y, v]
    _, _, Vt = np.linalg.svd(A)
    Hn = Vt[-1].reshape(3, 3)
    H = np.linalg.inv(Tb) @ Hn @ Ta
    return H / H[2, 2]


def _v_ij(H, i, j):
    return np.array([
        H[0, i] * H[0, j],
        H[0, i] * H[1, j] + H[1, i] * H[0, j],
        H[1, i] * H[1, j],
        H[2, i] * H[0, j] + H[0, i] * H[2, j],
        H[2, i] * H[1, j] + H[1, i] * H[2, j],
        H[2, i] * H[2, j],
    ])


def calibrate(obj: np.ndarray, img: np.ndarray):
    """Zhang's closed-form intrinsics from V >= 3 planar views.

    Returns (K (3,3), per-view (R, t) list, mean reprojection error px).
    """
    V = obj.shape[0]
    Hs = [homography_dlt(obj[i], img[i]) for i in range(V)]
    A = []
    for H in Hs:
        A.append(_v_ij(H, 0, 1))
        A.append(_v_ij(H, 0, 0) - _v_ij(H, 1, 1))
    A = np.stack(A)
    _, _, Vt = np.linalg.svd(A)
    b11, b12, b22, b13, b23, b33 = Vt[-1]
    # closed-form K from the IAC B = K^-T K^-1 (Zhang eq. 13)
    cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = np.sqrt(abs(lam / b11))
    fy = np.sqrt(abs(lam * b11 / (b11 * b22 - b12 * b12)))
    skew = -b12 * fx * fx * fy / lam
    cx = skew * cy / fx - b13 * fx * fx / lam
    K = np.array([[fx, skew, cx], [0, fy, cy], [0, 0, 1.0]])

    Kinv = np.linalg.inv(K)
    exts, errs = [], []
    for vi, H in enumerate(Hs):
        h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
        s = 1.0 / np.linalg.norm(Kinv @ h1)
        r1 = s * (Kinv @ h1)
        r2 = s * (Kinv @ h2)
        r3 = np.cross(r1, r2)
        R = np.stack([r1, r2, r3], axis=1)
        U, _, Vt2 = np.linalg.svd(R)
        R = U @ Vt2
        t = s * (Kinv @ h3)
        exts.append((R, t))
        pc = (R[:, :2] @ obj[vi].T).T + t
        uv = (K @ pc.T).T
        uv = uv[:, :2] / uv[:, 2:3]
        errs.append(np.linalg.norm(uv - img[vi], axis=1).mean())
    return K, exts, float(np.mean(errs))


def selftest():
    rng = np.random.default_rng(0)
    fx, fy, cx, cy = 700.0, 705.0, 620.0, 190.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    gx, gy = np.meshgrid(np.arange(9), np.arange(6))
    obj1 = np.stack([gx.reshape(-1) * 0.03, gy.reshape(-1) * 0.03], -1)
    objs, imgs = [], []
    for v in range(6):
        w = rng.normal(0, 0.25, 3)
        th = np.linalg.norm(w)
        Kx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        R = (
            np.eye(3) + np.sin(th) / th * Kx
            + (1 - np.cos(th)) / th**2 * Kx @ Kx
        )
        t = np.array([rng.normal(0, 0.05), rng.normal(0, 0.05),
                      0.5 + 0.1 * v])
        pc = (R[:, :2] @ obj1.T).T + t
        uv = (K @ pc.T).T
        uv = uv[:, :2] / uv[:, 2:3] + rng.normal(0, 0.1, (len(obj1), 2))
        objs.append(obj1)
        imgs.append(uv)
    Kr, _, err = calibrate(np.stack(objs), np.stack(imgs))
    print(f"true: fx={fx} fy={fy} cx={cx} cy={cy}")
    print(f"est : fx={Kr[0,0]:.2f} fy={Kr[1,1]:.2f} "
          f"cx={Kr[0,2]:.2f} cy={Kr[1,2]:.2f}  reproj={err:.3f}px")
    ok = (
        abs(Kr[0, 0] - fx) < 5 and abs(Kr[1, 1] - fy) < 5
        and abs(Kr[0, 2] - cx) < 5 and abs(Kr[1, 2] - cy) < 5
    )
    print("selftest:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("corr", nargs="?", help=".npz with obj (V,N,2), img (V,N,2)")
    p.add_argument("--selftest", action="store_true")
    a = p.parse_args()
    if a.selftest:
        sys.exit(selftest())
    if not a.corr:
        p.error("need a correspondence .npz or --selftest")
    d = np.load(a.corr)
    K, exts, err = calibrate(d["obj"], d["img"])
    print(f"fx={K[0,0]:.4f} fy={K[1,1]:.4f} cx={K[0,2]:.4f} "
          f"cy={K[1,2]:.4f} skew={K[0,1]:.5f}")
    print(f"mean reprojection error: {err:.4f} px over {len(exts)} views")


if __name__ == "__main__":
    main()
