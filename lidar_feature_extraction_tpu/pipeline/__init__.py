from lidar_feature_extraction_tpu.pipeline import (  # noqa: F401
    localization,
    mapping,
    odometry,
    replay,
)
