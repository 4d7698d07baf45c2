"""Config ingestion: YAML files -> SystemConfig.

Covers the reference's two reader families (cv::FileStorage settings,
tracking.cpp:488/:1021/:1105; kalibr chains, basics/yaml.h:16-77) plus
the native nested-dict format.
"""

import os

import numpy as np

from vi_slam_tpu.io import config_io
from vi_slam_tpu.utils import config as cfglib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestOrbSlamSettings:
    def test_kitti_preset_parity(self):
        """configs/kitti00_stereo.yaml must reproduce the code preset."""
        cfg = config_io.load_config(
            os.path.join(REPO, "configs", "kitti00_stereo.yaml")
        )
        preset = cfglib.kitti00_stereo()
        for f in ("width", "height", "fx", "fy", "cx", "cy", "bf",
                  "th_depth", "fps", "model"):
            assert getattr(cfg.camera, f) == getattr(preset.camera, f), f
        assert cfg.extractor.n_features == preset.extractor.n_features
        assert cfg.extractor.n_levels == preset.extractor.n_levels
        assert cfg.extractor.scale_factor == preset.extractor.scale_factor
        assert cfg.sensor == cfglib.Sensor.STEREO

    def test_yaml_directive_tolerated(self, tmp_path):
        p = tmp_path / "s.yaml"
        p.write_text("%YAML:1.0\n---\nCamera.fx: 100.0\nCamera.bf: 0.0\n")
        cfg = config_io.load_config(str(p))
        assert cfg.camera.fx == 100.0
        assert cfg.sensor == cfglib.Sensor.MONOCULAR


class TestKalibrChain:
    def test_chain_file(self):
        cfg = config_io.load_config(
            os.path.join(REPO, "configs", "stereo_imu_chain.yaml")
        )
        assert cfg.sensor == cfglib.Sensor.IMU_STEREO
        assert cfg.camera.fx == 460.0
        # bf = baseline * fx = 0.12 * 460
        assert abs(cfg.camera.bf - 0.12 * 460.0) < 1e-6
        assert cfg.imu.freq == 200.0
        # T_bc is the inverse of the written T_cam_imu
        T_bc = np.asarray(cfg.imu.T_bc).reshape(4, 4)
        T_cb = np.linalg.inv(T_bc)
        expect = np.array(
            [[0, -1, 0, 0.005], [0, 0, -1, -0.002], [1, 0, 0, -0.01],
             [0, 0, 0, 1.0]]
        )
        np.testing.assert_allclose(T_cb, expect, atol=1e-9)


class TestNestedDict:
    def test_roundtrip(self, tmp_path):
        p = tmp_path / "n.yaml"
        p.write_text(
            "sensor: STEREO\n"
            "camera: {fx: 500.0, fy: 500.0, cx: 320.0, cy: 240.0,\n"
            "         width: 640, height: 480, bf: 250.0}\n"
            "extractor: {n_features: 800}\n"
        )
        cfg = config_io.load_config(str(p))
        assert cfg.camera.fx == 500.0
        assert cfg.extractor.n_features == 800
