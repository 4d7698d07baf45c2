"""ctypes bindings for the native host-runtime components.

The TPU compute path is JAX/XLA; the host bookkeeping around it —
covisibility graph / spanning tree (KeyFrame::UpdateConnections,
keyframe.h:79-93) and the IMU sample queue (tracking.cpp:1378) — is
C++ (native/src/), matching where the reference keeps its runtime.

`build()` compiles the shared library on demand (g++, no external
deps); every class degrades to a documented pure-Python fallback when
the toolchain is unavailable, so the package stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_NAME = "libvi_slam_native.so"
_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, _LIB_NAME)
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> bool:
    """Compile the native library if needed. Returns availability."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    mk_dir = os.path.join(os.path.dirname(_HERE), "native")
    if not os.path.isdir(mk_dir):
        return False
    try:
        subprocess.run(
            ["make", "-s"], cwd=mk_dir, check=True, capture_output=True
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    # covis graph
    lib.covis_create.restype = ctypes.c_void_p
    lib.covis_create.argtypes = [ctypes.c_int32]
    lib.covis_destroy.argtypes = [ctypes.c_void_p]
    lib.covis_add_keyframe.argtypes = [
        ctypes.c_void_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
    ]
    lib.covis_remove_point.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.covis_remove_keyframe.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.covis_weight.restype = ctypes.c_int32
    lib.covis_weight.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
    lib.covis_best_neighbors.restype = ctypes.c_int32
    lib.covis_best_neighbors.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.covis_parents.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)
    ]
    lib.covis_essential_edges.restype = ctypes.c_int32
    lib.covis_essential_edges.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    # imu ring
    lib.imu_ring_create.restype = ctypes.c_void_p
    lib.imu_ring_create.argtypes = [ctypes.c_int32]
    lib.imu_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.imu_ring_push.argtypes = [
        ctypes.c_void_p, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.imu_ring_size.restype = ctypes.c_int32
    lib.imu_ring_size.argtypes = [ctypes.c_void_p]
    lib.imu_ring_drain.restype = ctypes.c_int32
    lib.imu_ring_drain.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class CovisGraph:
    """Incremental covisibility graph + spanning tree (native-backed)."""

    def __init__(self, max_kf: int):
        self.max_kf = max_kf
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.covis_create(max_kf)
        else:  # pure-Python fallback
            self._h = None
            self._weights = [dict() for _ in range(max_kf)]
            self._point_obs: dict = {}
            self._parent = np.full((max_kf,), -1, np.int32)
            self._alive = np.zeros((max_kf,), bool)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._h:
            self._lib.covis_destroy(self._h)
            self._h = None

    def add_keyframe(self, kf: int, mp_ids: np.ndarray) -> None:
        ids = np.ascontiguousarray(np.asarray(mp_ids, np.int64))
        if self._lib is not None:
            self._lib.covis_add_keyframe(
                self._h, kf,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(ids),
            )
            return
        self._alive[kf] = True
        wk = self._weights[kf]
        for mp in ids:
            if mp < 0:
                continue
            obs = self._point_obs.setdefault(int(mp), [])
            for other in obs:
                if other == kf or not self._alive[other]:
                    continue
                wk[other] = wk.get(other, 0) + 1
                wo = self._weights[other]
                wo[kf] = wo.get(kf, 0) + 1
            if kf not in obs:
                obs.append(kf)
        earlier = [(w, -k) for k, w in wk.items() if k < kf and self._alive[k]]
        if earlier:
            w, nk = max(earlier)
            self._parent[kf] = -nk
        elif kf > 0:
            prev = np.flatnonzero(self._alive[:kf])
            self._parent[kf] = prev[-1] if prev.size else -1

    def remove_keyframe(self, kf: int) -> None:
        if self._lib is not None:
            self._lib.covis_remove_keyframe(self._h, kf)
            return
        for other in list(self._weights[kf]):
            self._weights[other].pop(kf, None)
        self._weights[kf] = {}
        for obs in self._point_obs.values():
            if kf in obs:
                obs.remove(kf)
        new_parent = self._parent[kf]
        self._parent[self._parent == kf] = new_parent
        self._alive[kf] = False
        self._parent[kf] = -1

    def weight(self, a: int, b: int) -> int:
        if self._lib is not None:
            return int(self._lib.covis_weight(self._h, a, b))
        return self._weights[a].get(b, 0)

    def best_neighbors(self, kf: int, n: int) -> Tuple[np.ndarray, np.ndarray]:
        if self._lib is not None:
            ids = np.zeros((n,), np.int32)
            w = np.zeros((n,), np.int32)
            m = self._lib.covis_best_neighbors(
                self._h, kf, n,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                w.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return ids[:m], w[:m]
        v = sorted(
            self._weights[kf].items(), key=lambda kv: (-kv[1], kv[0])
        )[:n]
        return (
            np.asarray([k for k, _ in v], np.int32),
            np.asarray([w for _, w in v], np.int32),
        )

    def parents(self) -> np.ndarray:
        if self._lib is not None:
            out = np.zeros((self.max_kf,), np.int32)
            self._lib.covis_parents(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            )
            return out
        return self._parent.copy()

    def essential_edges(self, min_weight: int, max_edges: int = 4096) -> np.ndarray:
        if self._lib is not None:
            out = np.zeros((max_edges, 2), np.int32)
            n = self._lib.covis_essential_edges(
                self._h, min_weight, max_edges,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return out[:n]
        pairs = set()
        for k in range(self.max_kf):
            if not self._alive[k]:
                continue
            p = self._parent[k]
            if p >= 0 and self._alive[p]:
                pairs.add((min(int(p), k), max(int(p), k)))
            for other, w in self._weights[k].items():
                if other > k and self._alive[other] and w >= min_weight:
                    pairs.add((k, other))
        return np.asarray(sorted(pairs), np.int32).reshape(-1, 2)


class ImuRing:
    """Native single-producer/single-consumer IMU sample queue."""

    def __init__(self, capacity: int = 8192):
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.imu_ring_create(capacity)
        else:
            self._h = None
            self._buf: list = []
            self._cap = capacity

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._h:
            self._lib.imu_ring_destroy(self._h)
            self._h = None

    def push(self, t: float, acc, gyro) -> None:
        if self._lib is not None:
            a = np.ascontiguousarray(acc, np.float32)
            g = np.ascontiguousarray(gyro, np.float32)
            self._lib.imu_ring_push(
                self._h, float(t),
                a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            return
        self._buf.append((float(t), np.asarray(acc, np.float32),
                          np.asarray(gyro, np.float32)))
        if len(self._buf) > self._cap:
            self._buf.pop(0)

    def size(self) -> int:
        if self._lib is not None:
            return int(self._lib.imu_ring_size(self._h))
        return len(self._buf)

    def drain(self, t0: float, t1: float, max_out: int = 2048):
        """Samples with t0 < t <= t1 (consumed), as (t (N,), acc (N,3),
        gyro (N,3)) — PreintegrateIMU drain semantics."""
        if self._lib is not None:
            out_t = np.zeros((max_out,), np.float64)
            out_a = np.zeros((max_out, 3), np.float32)
            out_g = np.zeros((max_out, 3), np.float32)
            n = self._lib.imu_ring_drain(
                self._h, float(t0), float(t1), max_out,
                out_t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                out_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                out_g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            return out_t[:n], out_a[:n], out_g[:n]
        keep, out = [], []
        for s in self._buf:
            if s[0] <= t1:
                if s[0] > t0:
                    out.append(s)
            else:
                keep.append(s)
        self._buf = keep
        if not out:
            return (np.zeros((0,)), np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.float32))
        return (
            np.asarray([s[0] for s in out]),
            np.stack([s[1] for s in out]),
            np.stack([s[2] for s in out]),
        )
