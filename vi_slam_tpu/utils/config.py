"""Typed configuration for the whole engine.

Replaces the reference's two overlapping config systems (`basics::Config`
cv::FileStorage singleton — `/root/reference/include/vi_slam/basics/config.h:14-46`
— and the per-run YAML parsed by `Tracking::ParseCamParamFile/ParseORBParamFile/
ParseIMUParamFile`, `/root/reference/src/core/tracking.cpp:488/:1021/:1105`)
with one frozen dataclass tree. Presets mirror `config/KITTI00-Stereo.yaml`.

Everything here is *static* configuration: values feed jit specialization
(shapes, iteration counts) or host-side thresholds. No cv/YAML dependency;
`from_yaml` accepts a plain dict so a YAML loader can be layered on top.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from enum import Enum
from typing import Optional, Tuple


class Sensor(Enum):
    """Sensor modes (reference: `core/system.h:96-102` eSensor)."""

    MONOCULAR = 0
    STEREO = 1
    RGBD = 2
    IMU_MONOCULAR = 3
    IMU_STEREO = 4


@dataclass(frozen=True)
class CameraConfig:
    model: str = "pinhole"  # "pinhole" | "kb8"
    width: int = 1241
    height: int = 376
    fx: float = 718.856
    fy: float = 718.856
    cx: float = 607.1928
    cy: float = 185.2157
    dist: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0, 0.0)
    bf: float = 386.1448  # baseline * fx (stereo), 0 for mono
    fps: float = 10.0
    # depth threshold factor: close/far stereo points (KITTI00 ThDepth=35)
    th_depth: float = 35.0


@dataclass(frozen=True)
class ExtractorConfig:
    """ORB extractor knobs (reference: ORBextractor section of
    config/KITTI00-Stereo.yaml and fextractor.h:26-91)."""

    n_features: int = 2000
    n_levels: int = 8
    scale_factor: float = 1.2
    fast_threshold: float = 20.0  # iniThFAST
    fast_min_threshold: float = 7.0  # minThFAST
    cell_size: int = 32  # vilib grid-NMS cell (fast_cuda.cpp:88-99)
    # cap on per-level candidate corners entering top-K selection
    max_candidates_per_level: int = 4096
    # use the fused Pallas FAST kernel (ops/fast_pallas.py) instead of the
    # XLA path for the response map — TPU only (interpret mode on CPU is
    # for tests); equivalence verified by tests/test_frontend.py
    # fused Pallas FAST+NMS strip kernel (ops/fast_pallas.py) vs the XLA
    # shifted-slice path (ops/fast.py). r5 verdict, measured END-TO-END
    # on the real chip with the compile-free bench protocol (bench.py
    # --no-pallas-fast A/B, best-of-2): XLA 16.4 fps vs pallas 15.4 fps
    # at equal ATE — the pallas kernel LOSES ~1 fps end-to-end (its
    # chained-dispatch microbench win of 2.30 vs 2.94 ms was an async-
    # dispatch measurement artifact). Default OFF; the kernel stays as a
    # tested, selectable capability (vilib fast_gpu equivalent).
    use_pallas_fast: bool = False


@dataclass(frozen=True)
class MatcherConfig:
    """Descriptor-matching thresholds (reference: fmatcher.cpp:313-315)."""

    th_low: int = 50
    th_high: int = 100
    nn_ratio: float = 0.9
    check_orientation: bool = True
    histo_bins: int = 30
    # stereo scanline-match outlier gates (ops/stereo.py). The
    # median-SAD sweep is reference semantics (frame.cpp:960-978) and is
    # the r5 accuracy fix: dense repeated-texture worlds went 207 cm ->
    # 0.3 cm ATE with it on. The tie-tolerant left-right mutual check is
    # an optional extra gate; measured it over-prunes (ties on repeated
    # texture) without improving ATE once the median sweep runs, so it
    # defaults off.
    stereo_mutual: bool = False
    stereo_median_sweep: bool = True


@dataclass(frozen=True)
class TrackerConfig:
    # motion-model projection search radius (px), scaled by pyramid level
    search_radius: float = 15.0
    # min matches to accept a tracking solution (tracking.cpp semantics)
    min_matches_motion: int = 20
    min_matches_local_map: int = 30
    # keyframe decision (NeedNewKeyFrame tracking.cpp:2925)
    min_frames_between_kf: int = 0
    max_frames_between_kf: int = 10
    kf_ref_ratio: float = 0.75  # insert KF if tracked < ratio * ref visible
    # re-localization grace window, seconds (time_recently_lost)
    recently_lost_sec: float = 5.0
    # async pipeline depth: how many frames may be in flight before the
    # host finalizes the oldest (0 = fully synchronous). Depth overlaps
    # the device round trip with the next frames' compute (SURVEY §2.4.2
    # thread-trio equivalent). Over the tunnel-attached TPU a single
    # blocking device_get costs a full ~56 ms RTT; with 3 outstanding
    # transfers the gets themselves pipeline and the RTT disappears
    # (measured: depth-1 = 67 ms/frame host_pull, depth-3 = ~7 ms).
    pipeline_depth: int = 3
    # Atlas multi-map (atlas.cpp:45 CreateNewMap, tracking.cpp:3686
    # CreateMapInAtlas): after a map has been LOST this long past the
    # recently-lost grace with relocalization failing, park it and start
    # a fresh map; the merge detector may weld them back (MergeLocal).
    atlas_enabled: bool = True
    atlas_lost_sec: float = 0.5
    # timestamp sanity (tracking.cpp:1681-1715): a backwards or larger
    # forward jump than this forks a new map (or resets, without atlas)
    max_timestamp_jump_sec: float = 3.0
    # stereo back-projected points created per keyframe (the reference
    # creates ~100 closest, tracking.cpp:3063; a larger budget lets the
    # map survive sparser keyframe cadences)
    kf_point_budget: int = 384
    # run the map-maintenance chain (point/KF culling) every Nth keyframe
    maintenance_every: int = 1
    # run the mapping pass (fuse + triangulate) every Nth keyframe
    mapping_every: int = 1
    # run local BA every Nth keyframe (the reference's tracking thread
    # preempts a busy LocalMapping via InterruptBA, localmapping.cpp:941 —
    # under keyframe-per-frame load it effectively skips BA runs too)
    local_ba_every: int = 1
    # --- KLT frontend (pipeline/klt_vo.py; vilib feature_tracker_gpu
    # semantics: IC-LK track between frames, full ORB redetect + track
    # respawn at keyframes) ---
    frontend: str = "orb"  # "orb" | "klt"
    klt_half: int = 5  # LK patch half-size (vilib patch 8x8 ~ half 4-5)
    klt_iters: int = 8  # IC iterations per pyramid level
    # halfsample pyramid depth: the convergence basin is roughly
    # +/- half * 2^(levels-1) px; 5 levels covers ~80 px/frame flow
    # (KITTI-speed motion on close structure with no velocity prior)
    klt_levels: int = 5
    klt_max_residual: float = 25.0  # mean-abs photometric gate
    # respawn/keyframe trigger: redetect when live tracks fall below this
    # (occupancy respawn, feature_tracker_gpu.cpp track lifecycle)
    klt_min_tracks: int = 350
    # keypoint<->track association radius at keyframes (px, level 0)
    klt_assoc_radius: float = 2.0
    # ORB rescue: when the KLT pose pass yields fewer inliers than this,
    # the frame falls back to the full ORB extract+match+GN inside the
    # same dispatch and respawns the track set from it. LK mis-locks are
    # COHERENT on repetitive structure (every track snaps the same way),
    # so a descriptor-based pass is the one defense that cannot be fooled
    # the same way. Costs ORB-frame time only on weak frames.
    klt_rescue_min: int = 60


@dataclass(frozen=True)
class BAConfig:
    # motion-only pose optimization (optimizer.cpp:819: 4 rounds x 10 iters)
    pose_rounds: int = 4
    pose_iters_per_round: int = 10
    chi2_mono: float = 5.991
    chi2_stereo: float = 7.815
    # local BA window caps (static shapes; LocalBundleAdjustment semantics)
    max_local_kfs: int = 16
    max_fixed_kfs: int = 16
    max_local_points: int = 4096
    local_ba_iters: int = 10
    # inertial sliding window (LocalInertialBA: Nd=10, 25 if bLarge)
    inertial_window: int = 10
    # global BA
    gba_iters: int = 10
    solver_dtype: str = "float32"
    # per-frame fixed-lag smoother on the VIO tracking path (the
    # ISAM2/GTSAM capability, optim/smoother.py): after the robust
    # inertial pose GN, the last `smoother_window` frame states are
    # re-optimized jointly with exact Schur marginalization of the
    # oldest state (gtsamoptimizer.h:107-262 semantics)
    use_smoother: bool = False
    smoother_window: int = 6
    smoother_vis: int = 96
    smoother_iters: int = 2
    # SearchInNeighbors fuse window (covisible neighbors per mapping pass,
    # localmapping.cpp:722 uses ~10 on CPU; each neighbor costs two full
    # Hamming matrices on the device)
    mapping_fuse_window: int = 3


@dataclass(frozen=True)
class IMUConfig:
    """Noise densities / random walk (reference: Calib imu.h:74-126,
    ParseIMUParamFile tracking.cpp:1105)."""

    noise_gyro: float = 1.7e-4
    noise_acc: float = 2.0e-3
    walk_gyro: float = 1.9e-5
    walk_acc: float = 3.0e-3
    freq: float = 200.0
    # body-from-camera extrinsics as a flat 4x4 row-major tuple
    T_bc: Optional[Tuple[float, ...]] = None
    gravity: float = 9.81


@dataclass(frozen=True)
class MapConfig:
    """Static capacities for the struct-of-arrays map (SURVEY §7.1)."""

    max_keyframes: int = 512
    max_points: int = 65536
    max_obs_per_point: int = 16
    covis_weight_min: int = 15  # covisibility edge threshold (keyframe.h)
    essential_weight_min: int = 100  # essential-graph edge threshold


@dataclass(frozen=True)
class PlaceConfig:
    """Vocabulary / place recognition (DBoW3 equivalents)."""

    vocab_k: int = 10  # branching factor
    vocab_levels: int = 4  # depth -> k^L leaf words (10^4 here)
    min_common_words_ratio: float = 0.8
    loop_consistency: int = 3


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for distributed global BA (SURVEY §2.4 item 3)."""

    data_axis: str = "dp"
    n_devices: int = 1


@dataclass(frozen=True)
class SystemConfig:
    sensor: Sensor = Sensor.STEREO
    camera: CameraConfig = field(default_factory=CameraConfig)
    extractor: ExtractorConfig = field(default_factory=ExtractorConfig)
    matcher: MatcherConfig = field(default_factory=MatcherConfig)
    tracker: TrackerConfig = field(default_factory=TrackerConfig)
    ba: BAConfig = field(default_factory=BAConfig)
    imu: IMUConfig = field(default_factory=IMUConfig)
    map: MapConfig = field(default_factory=MapConfig)
    place: PlaceConfig = field(default_factory=PlaceConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace(self, **kw) -> "SystemConfig":
        return dataclasses.replace(self, **kw)


def kitti00_stereo() -> SystemConfig:
    """Preset mirroring `/root/reference/config/KITTI00-Stereo.yaml`."""
    return SystemConfig(sensor=Sensor.STEREO)


def kitti00_mono() -> SystemConfig:
    return SystemConfig(
        sensor=Sensor.MONOCULAR,
        camera=CameraConfig(bf=0.0),
    )


def from_dict(d: dict) -> SystemConfig:
    """Build a config from a nested plain dict (YAML-loaded)."""

    def _build(cls, sub: dict):
        names = {f.name: f for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in sub.items():
            if k not in names:
                raise KeyError(f"unknown config key {cls.__name__}.{k}")
            f = names[k]
            if dataclasses.is_dataclass(f.type) or f.name in (
                "camera", "extractor", "matcher", "tracker", "ba", "imu",
                "map", "place", "mesh",
            ):
                sub_cls = {
                    "camera": CameraConfig, "extractor": ExtractorConfig,
                    "matcher": MatcherConfig, "tracker": TrackerConfig,
                    "ba": BAConfig, "imu": IMUConfig, "map": MapConfig,
                    "place": PlaceConfig, "mesh": MeshConfig,
                }[f.name]
                kw[k] = _build(sub_cls, v)
            elif f.name == "sensor":
                kw[k] = Sensor[v] if isinstance(v, str) else Sensor(v)
            else:
                kw[k] = v
        return cls(**kw)

    return _build(SystemConfig, d)
