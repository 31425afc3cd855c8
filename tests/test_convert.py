"""Point-cloud ingestion tests (point_type_converter parity: repack +
drop-zero semantics, convert.py:183-209)."""

import numpy as np
import pytest

from lidar_feature_extraction_tpu.io import convert


def test_structured_with_ring_and_intensity():
    dt = np.dtype([("x", "f4"), ("y", "f4"), ("z", "f4"),
                   ("intensity", "f4"), ("ring", "u2")])
    arr = np.zeros(4, dt)
    arr["x"] = [1, 0, 3, np.nan]
    arr["y"] = [1, 0, 3, 0]
    arr["z"] = [1, 0, 3, 0]
    arr["intensity"] = [0.5, 0.1, 0.9, 0.2]
    arr["ring"] = [2, 0, 7, 1]
    scan = convert.from_structured(arr)
    np.testing.assert_array_equal(scan.valid, [True, False, True, False])
    np.testing.assert_array_equal(scan.ring, [2, 0, 7, 1])
    np.testing.assert_allclose(scan.intensity, arr["intensity"])


def test_structured_without_ring_estimates():
    dt = np.dtype([("x", "f4"), ("y", "f4"), ("z", "f4")])
    arr = np.zeros(10, dt)
    arr["x"] = np.linspace(5, 20, 10)
    arr["z"] = np.linspace(-2, 0.5, 10)
    scan = convert.from_structured(arr, n_rings=16)
    assert scan.ring.min() >= 0 and scan.ring.max() < 16
    assert scan.valid.all()


def test_missing_xyz_raises():
    dt = np.dtype([("a", "f4")])
    with pytest.raises(ValueError):
        convert.from_structured(np.zeros(3, dt))


def test_raw_f32_kitti_layout():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    pts[7, :3] = 0.0
    scan = convert.from_raw_f32(pts.ravel(), point_step=4)
    assert scan.xyz.shape == (100, 3)
    assert not scan.valid[7]
    assert scan.valid.sum() == 99
    np.testing.assert_allclose(scan.intensity, pts[:, 3])


def test_alias_field_names():
    dt = np.dtype([("x", "f4"), ("y", "f4"), ("z", "f4"),
                   ("reflectivity", "f4"), ("laser_id", "i4")])
    arr = np.zeros(3, dt)
    arr["x"] = [1, 2, 3]
    arr["laser_id"] = [4, 5, 6]
    arr["reflectivity"] = [0.1, 0.2, 0.3]
    scan = convert.from_structured(arr)
    np.testing.assert_array_equal(scan.ring, [4, 5, 6])
    np.testing.assert_allclose(scan.intensity, [0.1, 0.2, 0.3])
