from lidar_feature_extraction_tpu.fusion import kalman, ekf  # noqa: F401
