"""Config file ingestion: YAML -> SystemConfig.

Semantic reference — the reference's two overlapping config readers:
  * cv::FileStorage settings files with flat dotted keys
    (`%YAML:1.0`, `Camera.fx: ...`) parsed by
    `Tracking::ParseCamParamFile/ParseORBParamFile/ParseIMUParamFile`
    (`/root/reference/src/core/tracking.cpp:488/:1021/:1105`,
    `config/KITTI00-Stereo.yaml`),
  * kalibr-style camera-IMU chain files (`cam0: {T_cam_imu: ...}`)
    read by `basics::Yaml` (`include/vi_slam/basics/yaml.h:16-77`,
    `config/zed_imu_camera.yaml`) and by GTSAMOptimizer directly
    (gtsamoptimizer.cpp:31-59).

This module sniffs the format and produces one typed `SystemConfig`:
  * nested dicts with `camera:`/`extractor:` sections -> utils.config.from_dict
  * flat `Camera.*` dotted keys -> ORB-SLAM settings semantics
  * `cam0:`/`cam1:` kalibr chains -> stereo rig + IMU extrinsics (T_bc)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from vi_slam_tpu.utils import config as cfglib


def _read_yaml(path: str) -> dict:
    import yaml

    with open(path) as f:
        text = f.read()
    # cv::FileStorage files start with a "%YAML:1.0" directive that
    # PyYAML rejects; strip it (and the following "---") like the
    # reference's OpenCV reader tolerates
    lines = text.splitlines()
    while lines and (
        lines[0].startswith("%YAML") or lines[0].strip() == "---"
    ):
        lines = lines[1:]
    return yaml.safe_load("\n".join(lines)) or {}


def _from_orbslam_settings(d: dict) -> cfglib.SystemConfig:
    """Flat dotted-key settings file (KITTI00-Stereo.yaml layout;
    ParseCamParamFile/ParseORBParamFile semantics)."""

    def g(key, default=None):
        return d.get(key, default)

    cam_type = str(g("Camera.type", "PinHole")).lower()
    model = "kb8" if cam_type in ("kannalabrandt8", "fisheye") or g(
        "Camera.bFishEye", 0
    ) else "pinhole"
    if model == "kb8":
        dist = tuple(
            float(g(f"Camera.k{i}", 0.0)) for i in (1, 2, 3, 4)
        ) + (0.0,)
    else:
        dist = (
            float(g("Camera.k1", 0.0)),
            float(g("Camera.k2", 0.0)),
            float(g("Camera.p1", 0.0)),
            float(g("Camera.p2", 0.0)),
            float(g("Camera.k3", 0.0)),
        )
    camera = cfglib.CameraConfig(
        model=model,
        width=int(g("Camera.width", 1241)),
        height=int(g("Camera.height", 376)),
        fx=float(g("Camera.fx", 718.856)),
        fy=float(g("Camera.fy", 718.856)),
        cx=float(g("Camera.cx", 607.1928)),
        cy=float(g("Camera.cy", 185.2157)),
        dist=dist,
        bf=float(g("Camera.bf", 0.0)),
        fps=float(g("Camera.fps", 10.0)),
        th_depth=float(g("ThDepth", 35.0)),
    )
    extractor = cfglib.ExtractorConfig(
        n_features=int(g("ORBextractor.nFeatures", 2000)),
        n_levels=int(g("ORBextractor.nLevels", 8)),
        scale_factor=float(g("ORBextractor.scaleFactor", 1.2)),
        fast_threshold=float(g("ORBextractor.iniThFAST", 20)),
        fast_min_threshold=float(g("ORBextractor.minThFAST", 7)),
    )
    imu_kw = {}
    # ParseIMUParamFile keys (tracking.cpp:1105): IMU.NoiseGyro etc.
    for yk, fk in (
        ("IMU.NoiseGyro", "noise_gyro"),
        ("IMU.NoiseAcc", "noise_acc"),
        ("IMU.GyroWalk", "walk_gyro"),
        ("IMU.AccWalk", "walk_acc"),
        ("IMU.Frequency", "freq"),
    ):
        if yk in d:
            imu_kw[fk] = float(d[yk])
    if "Tbc" in d:
        imu_kw["T_bc"] = tuple(
            float(x) for x in np.asarray(d["Tbc"], np.float64).reshape(-1)
        )
    imu = cfglib.IMUConfig(**imu_kw)
    sensor = (
        cfglib.Sensor.IMU_STEREO
        if imu_kw and camera.bf > 0
        else cfglib.Sensor.IMU_MONOCULAR
        if imu_kw
        else cfglib.Sensor.STEREO
        if camera.bf > 0
        else cfglib.Sensor.MONOCULAR
    )
    return cfglib.SystemConfig(
        sensor=sensor, camera=camera, extractor=extractor, imu=imu
    )


def _from_kalibr_chain(d: dict) -> cfglib.SystemConfig:
    """kalibr camera-IMU chain (zed_imu_camera.yaml layout, yaml.h:16-77
    reader semantics): cam0 intrinsics/distortion/resolution, T_cam_imu
    (camera <- imu), optional cam1 with T_cn_cnm1 for the stereo
    baseline, optional top-level imu parameters."""
    cam0 = d["cam0"]
    fx, fy, cx, cy = (float(x) for x in cam0["intrinsics"])
    w, h = (int(x) for x in cam0["resolution"])
    dmodel = str(cam0.get("distortion_model", "radtan")).lower()
    dco = [float(x) for x in cam0.get("distortion_coeffs", [])]
    if dmodel in ("equidistant", "kannala_brandt", "kb8"):
        model = "kb8"
        dist = tuple((dco + [0.0] * 4)[:4]) + (0.0,)
    else:
        model = "pinhole"
        # kalibr radtan order is [k1, k2, p1, p2]
        dist = tuple((dco + [0.0] * 4)[:4]) + (0.0,)

    bf = 0.0
    if "cam1" in d and "T_cn_cnm1" in d["cam1"]:
        T10 = np.asarray(d["cam1"]["T_cn_cnm1"], np.float64)
        baseline = float(np.linalg.norm(T10[:3, 3]))
        bf = baseline * fx

    # T_cam_imu = T_c<-b; the pipeline wants T_bc = T_b<-c
    T_bc: Optional[tuple] = None
    if "T_cam_imu" in cam0:
        T_cb = np.asarray(cam0["T_cam_imu"], np.float64)
        T_bc_m = np.linalg.inv(T_cb)
        T_bc = tuple(float(x) for x in T_bc_m.reshape(-1))

    imu_kw = {}
    imu_d = d.get("imu0", d.get("imu", {})) or {}
    for yk, fk in (
        ("gyroscope_noise_density", "noise_gyro"),
        ("accelerometer_noise_density", "noise_acc"),
        ("gyroscope_random_walk", "walk_gyro"),
        ("accelerometer_random_walk", "walk_acc"),
        ("update_rate", "freq"),
    ):
        if yk in imu_d:
            imu_kw[fk] = float(imu_d[yk])
    if T_bc is not None:
        imu_kw["T_bc"] = T_bc

    camera = cfglib.CameraConfig(
        model=model, width=w, height=h, fx=fx, fy=fy, cx=cx, cy=cy,
        dist=dist, bf=bf,
    )
    sensor = (
        cfglib.Sensor.IMU_STEREO
        if T_bc is not None and bf > 0
        else cfglib.Sensor.IMU_MONOCULAR
        if T_bc is not None
        else cfglib.Sensor.STEREO
        if bf > 0
        else cfglib.Sensor.MONOCULAR
    )
    return cfglib.SystemConfig(
        sensor=sensor, camera=camera, imu=cfglib.IMUConfig(**imu_kw)
    )


def load_config(path: str) -> cfglib.SystemConfig:
    """Load any supported config file into a SystemConfig."""
    d = _read_yaml(path)
    if not isinstance(d, dict):
        raise ValueError(f"config file {path} did not parse to a mapping")
    if "cam0" in d:
        return _from_kalibr_chain(d)
    if any(str(k).startswith("Camera.") for k in d):
        return _from_orbslam_settings(d)
    return cfglib.from_dict(d)
