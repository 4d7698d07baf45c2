"""Plot the tracking/nav state timeline from a metrics JSONL stream.

Reference analogue: `tools/plotinit.py` / `tools/plotnavstate.py` (plot
the IMU-initialization and navigation state over time). Input is the
MetricsStream JSONL written by `apps/kitti.py --metrics` (or any
`utils/metrics.py` sink): per-frame records (inliers, matches, kfs, mps,
state) and events (map_fork, map_merge, loop_closed).

Usage:
  python tools/plot_navstate.py run.jsonl [--out navstate.png]
"""

import argparse
import json

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("jsonl")
    p.add_argument("--out", default="navstate.png")
    a = p.parse_args()

    frames, events = [], []
    with open(a.jsonl) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            (frames if obj.get("kind") == "frame" else events).append(obj)
    if not frames:
        raise SystemExit("no frame records in stream")

    fid = [r.get("frame", i) for i, r in enumerate(frames)]
    inl = [r.get("inliers", 0) for r in frames]
    kfs = [r.get("kfs", 0) for r in frames]
    mps = [r.get("mps", 0) for r in frames]
    state = [r.get("state", "OK") for r in frames]

    fig, axes = plt.subplots(3, 1, figsize=(10, 8), sharex=True)
    axes[0].plot(fid, inl, lw=1.0)
    axes[0].set_ylabel("inliers")
    bad = [f for f, s in zip(fid, state) if s != "OK"]
    for b in bad:
        axes[0].axvline(b, color="#cc4444", alpha=0.25, lw=0.8)
    axes[1].plot(fid, kfs, lw=1.0)
    axes[1].set_ylabel("keyframes")
    axes[2].plot(fid, mps, lw=1.0)
    axes[2].set_ylabel("map points")
    axes[2].set_xlabel("frame")
    for ev in events:
        name = ev.get("event", "?")
        for ax in axes:
            pass
        axes[1].annotate(
            name, xy=(fid[-1], kfs[-1]), fontsize=7, alpha=0.7,
        )
    n_bad = len(bad)
    axes[0].set_title(
        f"{len(frames)} frames, {n_bad} non-OK, "
        f"{len(events)} events"
    )
    fig.tight_layout()
    fig.savefig(a.out, dpi=120)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
