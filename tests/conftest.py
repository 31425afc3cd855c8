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
