from vi_slam_tpu.imu.preintegration import (
    ImuCalib as ImuCalib,
    Preintegrated as Preintegrated,
    integrate as integrate,
)
