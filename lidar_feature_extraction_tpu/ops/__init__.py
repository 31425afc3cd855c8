from lidar_feature_extraction_tpu.ops import (  # noqa: F401
    extraction,
)
