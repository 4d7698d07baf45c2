from vi_slam_tpu.geometry import triangulate as triangulate
from vi_slam_tpu.geometry import epipolar as epipolar
