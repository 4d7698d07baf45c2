from vi_slam_tpu.utils import config as config
from vi_slam_tpu.utils import timing as timing
