"""SE(3) pose as a (quaternion, translation) pytree.

Replaces the reference's ``Eigen::Isometry3d`` plumbing
(``localization/src/posevec.cpp:46-54``) with a flat JAX-friendly
container that vmaps over batches of poses.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from lidar_feature_extraction_tpu.core import quaternion as quat


class Pose(NamedTuple):
    """Rigid transform: ``apply(p) = R(q) p + t``. q is wxyz [..., 4]."""

    q: jnp.ndarray
    t: jnp.ndarray

    @staticmethod
    def identity(dtype=jnp.float32) -> "Pose":
        return Pose(quat.quat_identity(dtype), jnp.zeros(3, dtype))

    def apply(self, p: jnp.ndarray) -> jnp.ndarray:
        """Transform points [..., 3]."""
        return quat.quat_rotate(self.q, p) + self.t

    def compose(self, other: "Pose") -> "Pose":
        """``self @ other``: first apply ``other``, then ``self``."""
        return Pose(
            quat.quat_normalize(quat.quat_multiply(self.q, other.q)),
            quat.quat_rotate(self.q, other.t) + self.t,
        )

    def inverse(self) -> "Pose":
        qinv = quat.quat_conjugate(self.q)
        return Pose(qinv, -quat.quat_rotate(qinv, self.t))

    def matrix(self) -> jnp.ndarray:
        """Homogeneous 4x4 matrix [..., 4, 4]."""
        r = quat.quat_to_matrix(self.q)
        top = jnp.concatenate([r, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=top.dtype),
            top.shape[:-2] + (1, 4))
        return jnp.concatenate([top, bottom], axis=-2)

    @staticmethod
    def from_matrix(m: jnp.ndarray) -> "Pose":
        return Pose(quat.matrix_to_quat(m[..., :3, :3]), m[..., :3, 3])


def pose_delta_magnitudes(a: Pose, b: Pose):
    """(translation delta norm, quaternion vec-part norm) of ``a^-1 b``.

    Used for keyframe gating; parity: ``PoseDiffIsSufficientlySmall``
    (``mapping/include/lidar_feature_mapping/map.hpp:49-59``).
    """
    d = a.inverse().compose(b)
    dq = d.q * jnp.where(d.q[..., :1] < 0, -1.0, 1.0)
    return jnp.linalg.norm(d.t, axis=-1), jnp.linalg.norm(dq[..., 1:], axis=-1)
