from lidar_feature_extraction_tpu.core import quaternion, pose, stats, scan  # noqa: F401
