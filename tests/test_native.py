"""Native host-runtime tests: covisibility graph + IMU ring buffer.

The native C++ implementations must agree with the pure-Python fallback
and with the device covisibility computation (slam_map.state
covisibility_row) — KeyFrame::UpdateConnections parity.
"""

import numpy as np
import pytest

from vi_slam_tpu import native


@pytest.fixture(scope="module", params=["native", "python"])
def impl(request):
    if request.param == "native":
        if not native.available():
            pytest.skip("native toolchain unavailable")
        return "native"
    return "python"


def make_graph(impl, max_kf):
    g = native.CovisGraph(max_kf)
    if impl == "python":
        # force the fallback path
        g._lib = None
        g._h = None
        g._weights = [dict() for _ in range(max_kf)]
        g._point_obs = {}
        g._parent = np.full((max_kf,), -1, np.int32)
        g._alive = np.zeros((max_kf,), bool)
    return g


def test_covis_weights_and_parents(impl):
    g = make_graph(impl, 8)
    g.add_keyframe(0, np.arange(0, 30))
    g.add_keyframe(1, np.arange(10, 40))  # shares 20 with KF0
    g.add_keyframe(2, np.arange(35, 70))  # shares 5 with KF1, 0 with KF0
    assert g.weight(0, 1) == 20
    assert g.weight(1, 0) == 20
    assert g.weight(1, 2) == 5
    assert g.weight(0, 2) == 0
    parents = g.parents()
    assert parents[0] == -1
    assert parents[1] == 0
    assert parents[2] == 1


def test_covis_best_neighbors_and_edges(impl):
    g = make_graph(impl, 8)
    g.add_keyframe(0, np.arange(0, 100))
    g.add_keyframe(1, np.arange(0, 80))  # 80 shared with 0
    g.add_keyframe(2, np.arange(60, 160))  # 40 w/ 0, 20 w/ 1
    ids, w = g.best_neighbors(2, 4)
    assert list(ids[:2]) == [0, 1]
    assert list(w[:2]) == [40, 20]
    edges = g.essential_edges(min_weight=50)
    got = {tuple(e) for e in edges}
    assert (0, 1) in got  # covis >= 50 and tree
    assert (1, 2) not in got or g.parents()[2] == 1
    # spanning-tree edge of KF2 present regardless of weight
    p2 = g.parents()[2]
    assert (min(p2, 2), max(p2, 2)) in got


def test_covis_remove_keyframe(impl):
    g = make_graph(impl, 8)
    g.add_keyframe(0, np.arange(0, 50))
    g.add_keyframe(1, np.arange(0, 50))
    g.add_keyframe(2, np.arange(0, 50))
    assert g.parents()[2] in (0, 1)
    g.remove_keyframe(1)
    assert g.weight(0, 1) == 0
    parents = g.parents()
    assert parents[1] == -1
    # children of 1 re-parented to 1's parent (0)
    if parents[2] != -1:
        assert parents[2] == 0


def test_imu_ring_drain(impl):
    r = native.ImuRing(64)
    if impl == "python":
        r._lib = None
        r._h = None
        r._buf = []
        r._cap = 64
    for i in range(20):
        t = 0.01 * i
        r.push(t, [0.1 * i, 0, 9.8], [0, 0.01 * i, 0])
    assert r.size() == 20
    t, a, g = r.drain(0.045, 0.105)
    # samples strictly after 0.045 and <= 0.105: 0.05..0.10 -> 6
    assert len(t) == 6
    np.testing.assert_allclose(t[0], 0.05)
    np.testing.assert_allclose(t[-1], 0.10)
    np.testing.assert_allclose(a[:, 2], 9.8, rtol=1e-6)
    # consumed: draining the same window again yields nothing
    t2, _, _ = r.drain(0.045, 0.105)
    assert len(t2) == 0
    # later samples remain
    t3, _, _ = r.drain(0.0, 1.0)
    assert len(t3) == 9  # 0.11 .. 0.19


def test_native_lib_builds():
    assert native.build() or not native.available()
