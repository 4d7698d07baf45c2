"""Map checkpoint / resume.

Semantic reference: the reference *declares* map save/load but never
implements it (`/root/reference/include/vi_slam/core/system.h:177-179`
TODO; boost::serialization scaffolding on IMU types imu.h:46-58).
SURVEY §5.4 calls for full-map checkpointing as a day-one feature — with
the struct-of-arrays map it is a flat npz dump, and it doubles as the
resume story for distributed GBA.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.slam_map.state import MapState

_FORMAT_VERSION = 1


def save_map(path: str, state: MapState, meta: Optional[Dict[str, Any]] = None) -> None:
    """Write the whole map (and optional host metadata) to one npz."""
    arrays = {f"map_{k}": np.asarray(v) for k, v in state._asdict().items()}
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"version": _FORMAT_VERSION, **(meta or {})}).encode(),
        dtype=np.uint8,
    )
    np.savez_compressed(path, **arrays)


def load_map(path: str) -> Tuple[MapState, Dict[str, Any]]:
    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
    if meta.get("version") != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta.get('version')}")
    fields = {
        k[len("map_"):]: jnp.asarray(z[k])
        for k in z.files
        if k.startswith("map_")
    }
    return MapState(**fields), meta


def save_vo(path: str, vo) -> None:
    """Checkpoint a pipeline (StereoVO/MonoVO): map + host trackers.
    Trajectory records are included so SaveTrajectory* works after
    resume (system.cpp:403-696 capability)."""
    if hasattr(vo, "flush"):
        vo.flush()
    meta = {
        "n_kf": vo.n_kf,
        "n_mp": vo.n_mp,
        "state": vo.state,
        "ref_kf": vo.ref_kf,
        "frame_id": vo.frame_id,
        "T_np": vo.T_np.tolist(),
        "ref_pose_np": vo.ref_pose_np.tolist(),
        "records": [
            {
                "frame_id": r.frame_id,
                "timestamp": r.timestamp,
                "ref_kf": r.ref_kf,
                "T_rel": np.asarray(r.T_rel).tolist(),
                "state": r.state,
            }
            for r in vo.records
        ],
    }
    save_map(path, vo.map, meta)


def load_vo(path: str, vo) -> None:
    """Restore a checkpoint into an already-constructed pipeline (config
    must match the saved capacities)."""
    from vi_slam_tpu.pipeline.stereo_vo import FrameRecord
    from vi_slam_tpu.lie.se3 import SE3

    state, meta = load_map(path)
    if state.kf_R.shape[0] != vo.map.kf_R.shape[0]:
        raise ValueError("keyframe capacity mismatch with checkpoint")
    vo.map = state
    vo.n_kf = int(meta["n_kf"])
    vo.n_mp = int(meta["n_mp"])
    vo.state = meta["state"]
    vo.ref_kf = int(meta["ref_kf"])
    vo.frame_id = int(meta["frame_id"])
    vo.T_np = np.asarray(meta["T_np"])
    vo.ref_pose_np = np.asarray(meta["ref_pose_np"])
    vo.T_dev = SE3(
        jnp.asarray(vo.T_np[:3, :3], state.kf_R.dtype),
        jnp.asarray(vo.T_np[:3, 3], state.kf_t.dtype),
    )
    vo.vel_dev = SE3.identity()
    vo._last_good = (vo.T_dev.R, vo.T_dev.t)
    vo.records = [
        FrameRecord(
            frame_id=r["frame_id"],
            timestamp=r["timestamp"],
            ref_kf=r["ref_kf"],
            T_rel=np.asarray(r["T_rel"]),
            state=r["state"],
        )
        for r in meta["records"]
    ]
