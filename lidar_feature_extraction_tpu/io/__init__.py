from lidar_feature_extraction_tpu.io import kitti, pcd  # noqa: F401
