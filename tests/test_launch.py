"""Launch/orchestration assembly: config overlays, PCD map loading,
workload constructors (reference: lidar_feature_launch + map_loader)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_feature_extraction_tpu.config import (ExtractionConfig,
                                                 PipelineConfig,
                                                 RegistrationConfig,
                                                 VoxelMapConfig)
from lidar_feature_extraction_tpu.io.pcd import save_pcd
from lidar_feature_extraction_tpu.pipeline import launch
from lidar_feature_extraction_tpu.pipeline.localization import GeometryMaps


def small_cfg() -> PipelineConfig:
    vm = VoxelMapConfig(voxel_size=2.0, table_capacity=1 << 10,
                        points_per_voxel=4, max_probes=8)
    return PipelineConfig(
        extraction=ExtractionConfig(n_rings=4, max_points_per_ring=256,
                                    nms_rounds=16, max_edges=128,
                                    max_surfaces=256),
        registration=RegistrationConfig(
            n_neighbors=8, max_iterations=4, edge_map=vm, surface_map=vm,
            max_edge_points=128, max_surface_points=256))


def test_load_config_preset_and_overrides():
    cfg = launch.load_config("kitti_hdl64",
                             overrides={"extraction": {"padding": 7},
                                        "registration":
                                            {"max_iterations": 11}})
    assert cfg.extraction.padding == 7
    assert cfg.registration.max_iterations == 11
    # untouched preset values survive
    assert cfg.extraction.edge_threshold == 50.0
    assert cfg.compact_extraction


def test_load_config_params_file_json(tmp_path):
    p = tmp_path / "params.json"
    p.write_text(json.dumps({"ekf": {"predict_frequency": 25.0},
                             "compact_extraction": True}))
    cfg = launch.load_config("default", params_file=str(p))
    assert cfg.ekf.predict_frequency == 25.0
    assert cfg.compact_extraction


def test_load_config_rejects_unknown_field():
    with pytest.raises(KeyError):
        launch.load_config("default", overrides={"no_such": 1})
    with pytest.raises(KeyError):
        launch.load_config("no_such_preset")


def test_load_maps_and_launch_localization(tmp_path):
    rng = np.random.default_rng(0)
    t = np.linspace(-10, 10, 256)
    edge = np.stack([t, np.full_like(t, 3.0),
                     rng.normal(scale=0.02, size=len(t))], axis=-1)
    g = rng.uniform(-10, 10, size=(512, 2))
    surf = np.concatenate([g, rng.normal(scale=0.02, size=(512, 1))],
                          axis=-1)
    ep = os.path.join(tmp_path, "edge.pcd")
    sp = os.path.join(tmp_path, "surface.pcd")
    save_pcd(ep, edge.astype(np.float32))
    save_pcd(sp, surf.astype(np.float32))

    cfg = small_cfg()
    maps = launch.load_maps(ep, sp, cfg)
    assert isinstance(maps, GeometryMaps)

    pipe = launch.launch_localization(ep, sp, cfg)
    az = np.sort(rng.uniform(-np.pi, np.pi, size=1024))
    rr = 5.0 + 1.5 * np.sin(3 * az)
    xyz = np.stack([rr * np.cos(az), rr * np.sin(az),
                    np.zeros_like(az)], axis=-1)
    ring = (np.arange(1024) % 4).astype(np.int32)
    res = pipe.process_scan(xyz.astype(np.float32), ring, stamp=0.0)
    assert np.isfinite(np.asarray(res.fused_pose.t)).all()


def test_launch_mapping_and_odometry_construct():
    cfg = small_cfg()
    mp = launch.launch_mapping(cfg, loop_radius=3.0)
    assert mp.loop_radius == 3.0
    od = launch.launch_odometry(cfg)
    assert od is not None
