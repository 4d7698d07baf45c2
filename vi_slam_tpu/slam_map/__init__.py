from vi_slam_tpu.slam_map.state import MapState as MapState
from vi_slam_tpu.slam_map import state as state
