from lidar_feature_extraction_tpu.utils import evaluation, profiling  # noqa: F401
