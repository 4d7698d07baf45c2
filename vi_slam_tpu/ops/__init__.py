from vi_slam_tpu.ops import pyramid as pyramid
from vi_slam_tpu.ops import fast as fast
from vi_slam_tpu.ops import orb as orb
from vi_slam_tpu.ops import hamming as hamming
