from vi_slam_tpu.cameras.base import CameraParams as CameraParams
from vi_slam_tpu.cameras.base import KB8Params as KB8Params
from vi_slam_tpu.cameras import pinhole as pinhole
from vi_slam_tpu.cameras import kb8 as kb8
from vi_slam_tpu.cameras import dispatch as dispatch
