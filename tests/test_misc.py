"""Tests for peripheral components: coloring, trajectory accumulation,
checkpointing, profiling utilities."""

import numpy as np
import jax.numpy as jnp

from lidar_feature_extraction_tpu.ops import color
from lidar_feature_extraction_tpu.ops import extraction as ex
from lidar_feature_extraction_tpu.pipeline.trajectory import (
    PathAccumulator, map_viewer_transform)
from lidar_feature_extraction_tpu.utils import checkpoint
from lidar_feature_extraction_tpu.core.pose import Pose
from lidar_feature_extraction_tpu.fusion import ekf, kalman
from lidar_feature_extraction_tpu.config import EkfConfig


def test_color_by_label_covers_all_codes():
    labels = jnp.arange(8)
    rgb = np.asarray(color.color_by_label(labels))
    assert rgb.shape == (8, 3)
    assert len({tuple(c) for c in rgb}) == 8  # all distinct
    # Edge red-ish, surface blue-ish
    assert rgb[ex.EDGE][0] > rgb[ex.EDGE][2]
    assert rgb[ex.SURFACE][2] > rgb[ex.SURFACE][0]


def test_color_by_value_ramp():
    v = jnp.asarray([0.0, 0.5, 1.0])
    rgb = np.asarray(color.color_by_value(v, vmin=0.0, vmax=1.0))
    assert rgb[0][2] == 255 and rgb[0][0] == 0   # low -> blue
    assert rgb[2][0] == 255 and rgb[2][2] == 0   # high -> red


def test_path_accumulator_and_tum_export(tmp_path):
    acc = PathAccumulator()
    for i in range(5):
        acc.append(Pose(jnp.asarray([1.0, 0, 0, 0]),
                        jnp.asarray([float(i), 0.0, 0.0])), stamp=0.1 * i)
    assert len(acc) == 5
    np.testing.assert_allclose(acc.positions[:, 0], np.arange(5))
    p = str(tmp_path / "traj.tum")
    acc.save_tum(p)
    rows = np.loadtxt(p)
    assert rows.shape == (5, 8)
    np.testing.assert_allclose(rows[:, 1], np.arange(5))
    np.testing.assert_allclose(rows[:, 7], 1.0)  # qw last in TUM


def test_map_viewer_transform():
    pts = np.array([[0.0, 0, 0], [2, 2, 2], [4, 4, 4]])
    np.testing.assert_allclose(map_viewer_transform(pts), [2, 2, 2])
    valid = np.array([True, True, False])
    np.testing.assert_allclose(map_viewer_transform(pts, valid), [1, 1, 1])


def test_checkpoint_roundtrip(tmp_path):
    cfg = EkfConfig(extend_state_step=5)
    st = ekf.init_ekf(cfg)
    st = ekf.predict(st, 0.02, cfg)
    pose = Pose(jnp.asarray([0.9, 0.1, 0.0, 0.0]),
                jnp.asarray([1.0, 2.0, 3.0]))

    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_checkpoint(path, ekf=st, pose=pose)
    assert checkpoint.checkpoint_exists(path)

    out = checkpoint.load_checkpoint(
        path, ekf=ekf.init_ekf(cfg), pose=Pose.identity())
    np.testing.assert_allclose(np.asarray(out["ekf"].td.x),
                               np.asarray(st.td.x))
    np.testing.assert_allclose(np.asarray(out["pose"].t), [1, 2, 3])


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    import pytest

    path = str(tmp_path / "c.npz")
    checkpoint.save_checkpoint(path, x=jnp.zeros(3))
    with pytest.raises(ValueError):
        checkpoint.load_checkpoint(path, x=jnp.zeros(4))
    with pytest.raises(KeyError):
        checkpoint.load_checkpoint(path, y=jnp.zeros(3))


def test_stage_timer():
    from lidar_feature_extraction_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        sum(range(1000))
    with t.stage("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    assert rep["a"]["total_s"] > 0
