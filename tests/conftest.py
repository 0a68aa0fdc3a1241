"""Test env: force CPU with 8 virtual devices so sharding tests run without TPUs.

Must run before jax initializes a backend — pytest imports conftest first.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The TPU image's sitecustomize registers the axon TPU backend and sets
# jax_platforms programmatically, which beats the env var — override it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "xla_force_host_platform_device_count=8 not applied"
