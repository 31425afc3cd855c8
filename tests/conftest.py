import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware (SURVEY.md §4). NOTE: this environment pins
# JAX_PLATFORMS=axon (single real TPU chip via a tunnel) and its site
# hook re-registers the axon backend regardless of the env var, so the
# platform must be forced through jax.config AFTER import — otherwise
# every test competes for the one chip and serializes/deadlocks.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the number of live compiled executables in one pytest
    process.

    The full suite compiles hundreds of XLA:CPU programs; with all of
    them held live, a late compile of a large nested-control-flow
    program (the loop-closure Gauss-Newton / CG pose-graph programs in
    test_slam.py) segfaults inside ``backend_compile_and_load``
    deterministically — 3/3 full-suite runs at r3, reproduced at r4
    with a file-set bisection (the crash follows cumulative compile
    volume, not any single poisoning test: an 11-file half-set + slam
    crashes, the complementary set passes, and no single pairing
    reproduces). Verified independent of the r4 native-prefetcher
    heap-corruption bug (fixed in native/io_shim.cpp): with that fixed
    and this fixture removed, the crash still reproduces (rc=139);
    with the fixture in place the full suite is green 3/3. Dropping
    cache references after each module lets the JIT code regions be
    reclaimed and the suite complete in one process.
    """
    yield
    jax.clear_caches()
    gc.collect()
