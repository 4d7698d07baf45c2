from vi_slam_tpu.lie import so3 as so3
from vi_slam_tpu.lie import se3 as se3
from vi_slam_tpu.lie import sim3 as sim3
from vi_slam_tpu.lie.se3 import SE3 as SE3
from vi_slam_tpu.lie.sim3 import Sim3 as Sim3
