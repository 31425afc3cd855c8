"""Fused Pallas extraction kernel: labeling + compaction columns of an
entire ring group in VMEM.

The XLA extraction path (ops/extraction.py) runs ~60 separate HBM-round-
trip kernels per scan (curvature shifts, neighbor flags, the NMS rounds,
masking passes, run detection). This kernel keeps a group of rings
resident in VMEM and runs the whole per-ring pipeline of the reference
(``extraction/app/feature_extraction.cpp:92-171``) in one launch:

  range -> curvature -> neighbor flags -> gap prefix -> blocks ->
  segmented NMS (edge + surface passes) -> occlusion / out-of-range /
  parallel-beam masks -> one-hot compaction columns.

The math is the SAME code as the XLA path — ``label_planes`` and
``compact_columns`` are shared, written in Mosaic-supported plane ops
(2-D iota, lane rolls, cumsums, while_loop) — so label parity is by
construction, and the oracle tests that pin the XLA path pin this one
too (tests/test_extraction_pallas.py asserts bit-equality).

The one-hot compaction matmul itself stays OUTSIDE the kernel: its
[R, P, ce+cs] one-hot operand exceeds VMEM for full scans and XLA
already runs it on the MXU at full rate (measured ~0 ms after dispatch
accounting).

Grid: one program per ``ring_group`` rings (the grid is sequential on a
single TensorCore — the group size only bounds VMEM residency, ~20
[G, P] f32/i32 planes).

Validity note: the kernel derives the point mask as ``lane < count`` —
exactly the layout ``build_range_image`` produces (valid points
compacted to the front of each ring). That invariant is asserted by the
wrapper for non-jitted inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidar_feature_extraction_tpu.config import ExtractionConfig
from lidar_feature_extraction_tpu.ops.extraction import (
    label_planes, compact_columns, _voxel_run_key_planes)


def _kernel(x_ref, y_ref, z_ref, count_ref, labels_ref, curv_ref,
            col_ref, *, cfg: ExtractionConfig, surface_leaf: float,
            ce: int, cs: int):
    x = x_ref[:]
    y = y_ref[:]
    z = z_ref[:]
    count = count_ref[:, 0]
    G, P = x.shape

    idx = jax.lax.broadcasted_iota(jnp.int32, (G, P), 1)
    mask = idx < jnp.reshape(count, (-1, 1))

    labels, curv = label_planes(x, y, mask, count, cfg)
    key = _voxel_run_key_planes(x, y, z, surface_leaf)
    col, _, _, _ = compact_columns(labels, mask, key, ce, cs)

    labels_ref[:] = labels
    curv_ref[:] = curv
    col_ref[:] = col


@functools.partial(jax.jit, static_argnames=(
    "cfg", "surface_leaf", "ce", "cs", "ring_group", "interpret"))
def label_and_columns_pallas(x, y, z, count, cfg: ExtractionConfig,
                             surface_leaf: float, ce: int, cs: int,
                             ring_group: int = 16,
                             interpret: bool = False):
    """Fused labeling + compaction-column kernel.

    x, y, z: [R, P] coordinate planes; count: [R] int32.
    Returns (labels [R, P] i32, curvature [R, P] f32, col [R, P] i32).
    """
    R, P = x.shape
    g = min(ring_group, R)
    while R % g:
        g -= 1
    grid = (R // g,)

    plane = pl.BlockSpec((g, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    cnt = pl.BlockSpec((g, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, cfg=cfg,
                               surface_leaf=surface_leaf, ce=ce, cs=cs)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[plane, plane, plane, cnt],
        out_specs=(pl.BlockSpec((g, P), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),) * 3,
        out_shape=(jax.ShapeDtypeStruct((R, P), jnp.int32),
                   jax.ShapeDtypeStruct((R, P), x.dtype),
                   jax.ShapeDtypeStruct((R, P), jnp.int32)),
        # The default 16 MB scoped-VMEM cap is below this kernel's
        # working set at useful group sizes; v5e VMEM is 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, y, z, count.astype(jnp.int32).reshape(R, 1))
