import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (the driver separately dry-runs multi-chip compile).
#
# NOTE: the environment's sitecustomize imports jax at interpreter startup
# with JAX_PLATFORMS=axon baked in, so plain env-var assignment here is too
# late — use jax.config.update, which works any time before backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
