import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; the config update does not.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite jit-compiles large scan programs
# (full-episode rollouts); caching them makes reruns start-up-time only.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
