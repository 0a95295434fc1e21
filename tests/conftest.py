"""Test config: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (SURVEY.md §4 test plan)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the image's axon TPU plugin force-registers itself regardless of
# JAX_PLATFORMS; the config update below wins after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
