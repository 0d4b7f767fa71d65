"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md §4(f)).

The axon TPU plugin ignores the JAX_PLATFORMS env var, so we must override
via jax.config before any backend is initialized. All Pallas kernels run in
interpret mode on CPU (tests pass ``interpret=True`` via RasterizeSettings).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu"
