"""Offline visualization: trajectories, maps, tracking overlays.

Semantic reference: the reference's live Pangolin viewer
(`/root/reference/src/display/viewer.cpp:378` DrawMapPoints/DrawKeyFrames/
DrawCurrentCamera and the tracked-keypoint overlay of FrameDrawer). A TPU
deployment is headless, so the equivalent surface is offline rendering:
the same content (map points, keyframe frusta, live trajectory, per-frame
keypoint overlay) drawn to image files with matplotlib — callable during
a run (per-N-frames snapshots) or at the end.

All functions accept host numpy/JAX arrays and never touch the device
beyond a read, so they can run from a separate process on checkpoints.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_trajectory(
    est_wc: np.ndarray,
    gt_wc: Optional[np.ndarray] = None,
    path: str = "trajectory.png",
    title: str = "trajectory",
) -> str:
    """Top-down (x, z) + height profile of a (N, 4, 4) Twc trajectory,
    optionally against ground truth (the viewer's follow-camera top view,
    viewer.cpp:188)."""
    plt = _plt()
    fig, (ax, ax2) = plt.subplots(
        1, 2, figsize=(11, 5), gridspec_kw={"width_ratios": [3, 2]}
    )
    p = np.asarray(est_wc)[:, :3, 3]
    ax.plot(p[:, 0], p[:, 2], "-", lw=1.2, label="estimate")
    if gt_wc is not None:
        g = np.asarray(gt_wc)[:, :3, 3]
        ax.plot(g[:, 0], g[:, 2], "--", lw=1.0, label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.axis("equal")
    ax.legend(loc="best")
    ax.set_title(title)
    ax2.plot(p[:, 1], lw=1.0, label="est y")
    if gt_wc is not None:
        ax2.plot(np.asarray(gt_wc)[:, 1, 3], "--", lw=1.0, label="gt y")
    ax2.set_xlabel("frame")
    ax2.set_ylabel("y [m]")
    ax2.legend(loc="best")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_map(
    map_state,
    path: str = "map.png",
    trajectory_wc: Optional[np.ndarray] = None,
    max_points: int = 20000,
    frustum_scale: float = 0.5,
) -> str:
    """Top-down map render: map points + keyframe frusta + trajectory
    (MapDrawer::DrawMapPoints/DrawKeyFrames, viewer.cpp:378 content)."""
    plt = _plt()
    mp = np.asarray(map_state.mp_pos)
    mv = np.asarray(map_state.mp_valid)
    kf_R = np.asarray(map_state.kf_R)
    kf_t = np.asarray(map_state.kf_t)
    kv = np.asarray(map_state.kf_valid)

    pts = mp[mv]
    if len(pts) > max_points:
        pts = pts[:: max(1, len(pts) // max_points)]
    fig, ax = plt.subplots(figsize=(8, 8))
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], s=0.5, c="k", alpha=0.35,
                   label=f"{int(mv.sum())} map points")
    # keyframe frusta: camera center + viewing direction (z axis of Twc)
    for k in np.flatnonzero(kv):
        R, t = kf_R[k], kf_t[k]
        c = -R.T @ t  # camera center in world
        z = R.T @ np.asarray([0.0, 0.0, 1.0])
        ax.plot(
            [c[0], c[0] + frustum_scale * z[0]],
            [c[2], c[2] + frustum_scale * z[2]],
            "-", c="tab:blue", lw=0.8,
        )
        ax.plot([c[0]], [c[2]], ".", c="tab:blue", ms=2.5)
    if trajectory_wc is not None:
        p = np.asarray(trajectory_wc)[:, :3, 3]
        ax.plot(p[:, 0], p[:, 2], "-", c="tab:green", lw=1.0,
                label="trajectory")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.axis("equal")
    ax.legend(loc="best")
    ax.set_title("map (top-down)")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def draw_tracked_frame(
    image: np.ndarray,
    xy: np.ndarray,
    valid: np.ndarray,
    matched: Optional[np.ndarray] = None,
    path: str = "frame.png",
    state: str = "",
) -> str:
    """Per-frame keypoint overlay (FrameDrawer::DrawFrame semantics:
    green = tracked map point, blue = detected only)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.imshow(np.asarray(image), cmap="gray", vmin=0, vmax=255)
    xy = np.asarray(xy)
    valid = np.asarray(valid)
    det = valid if matched is None else (valid & ~np.asarray(matched))
    ax.plot(xy[det, 0], xy[det, 1], "s", ms=2.5, mfc="none",
            mec="tab:blue", mew=0.6)
    if matched is not None:
        trk = valid & np.asarray(matched)
        ax.plot(xy[trk, 0], xy[trk, 1], "s", ms=3, mfc="none",
                mec="lime", mew=0.8)
        ax.set_title(f"{state}  tracked {int(trk.sum())} / "
                     f"detected {int(valid.sum())}")
    else:
        ax.set_title(f"{state}  detected {int(valid.sum())}")
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
