"""Trajectory writers: KITTI / TUM / EuRoC round trips + KF-only saver.

Reference surface: `System::SaveTrajectory{TUM,EuRoC,KITTI}` and
`SaveKeyFrameTrajectory*` (system.cpp:403-696).
"""

import numpy as np

from vi_slam_tpu.io import trajectory


def _random_poses(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        w = rng.normal(0, 0.5, 3)
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        R = (
            np.eye(3)
            + np.sin(th) / max(th, 1e-9) * K
            + (1 - np.cos(th)) / max(th * th, 1e-12) * K @ K
        )
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = rng.normal(0, 5, 3)
        out.append(T)
    return out


class TestEuRoC:
    def test_roundtrip(self, tmp_path):
        poses = _random_poses(7)
        ts = [1403636579.763555 + 0.05 * i for i in range(7)]
        p = tmp_path / "traj.csv"
        trajectory.save_euroc(str(p), ts, poses)
        ts2, poses2 = trajectory.load_euroc(str(p))
        np.testing.assert_allclose(ts2, ts, atol=2e-9)
        for a, b in zip(poses, poses2):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_format_fields(self, tmp_path):
        p = tmp_path / "t.csv"
        trajectory.save_euroc(str(p), [1.0], [np.eye(4)])
        lines = p.read_text().splitlines()
        assert lines[0].startswith("#timestamp")
        vals = lines[1].split(",")
        assert len(vals) == 8
        assert vals[0] == "1000000000"
        assert float(vals[4]) == 1.0  # q_w first


class TestKittiRoundtrip:
    def test_roundtrip(self, tmp_path):
        poses = _random_poses(5, seed=3)
        p = tmp_path / "k.txt"
        trajectory.save_kitti(str(p), poses)
        back = trajectory.load_kitti(str(p))
        for a, b in zip(poses, back):
            np.testing.assert_allclose(a, b, atol=1e-7)
