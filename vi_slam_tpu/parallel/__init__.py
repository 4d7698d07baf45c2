from vi_slam_tpu.parallel import dist_ba as dist_ba
from vi_slam_tpu.parallel.mesh import make_mesh as make_mesh
