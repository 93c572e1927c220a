import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; the config update does not.
jax.config.update("jax_platforms", "cpu")
