"""Multi-device / multi-host execution (mesh, DP localization,
distributed pose graph, IMU keyframe graph, multihost bootstrap).

Submodules load lazily: ``multihost.initialize`` must run BEFORE
anything initializes the XLA backend (jax.distributed contract), and an
eager ``from . import distributed`` would pull in op modules whose
module-level jnp constants initialize it.
"""

from importlib import import_module

_SUBMODULES = ("mesh", "distributed", "pose_graph", "multihost",
               "imu_graph")


def __getattr__(name):
    if name in _SUBMODULES:
        return import_module(f"{__name__}.{name}")
    raise AttributeError(name)


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
