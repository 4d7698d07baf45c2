from vi_slam_tpu.loop.sim3_solver import horn_sim3, sim3_ransac  # noqa: F401
