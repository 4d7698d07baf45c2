from vi_slam_tpu.pipeline.stereo_vo import StereoVO as StereoVO
