from vi_slam_tpu.features.extractor import (
    Features as Features,
    OrbExtractor as OrbExtractor,
)
