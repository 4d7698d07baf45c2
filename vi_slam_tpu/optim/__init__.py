from vi_slam_tpu.optim import robust as robust
from vi_slam_tpu.optim import pose_opt as pose_opt
from vi_slam_tpu.optim import local_ba as local_ba
