from vi_slam_tpu.io import trajectory as trajectory
from vi_slam_tpu.io import evaluation as evaluation
from vi_slam_tpu.io import synthetic as synthetic
