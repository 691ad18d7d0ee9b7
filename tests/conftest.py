"""Test configuration: force CPU with 8 virtual devices (sharding tests) and
enable float64 (reference-parity numerics) BEFORE jax initializes."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets axon (TPU); tests run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon (TPU) backend and
# overrides JAX_PLATFORMS; pin the config directly so tests stay on CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
