from lidar_feature_extraction_tpu.parallel import (  # noqa: F401
    mesh,
    distributed,
    pose_graph,
)
