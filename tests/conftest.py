"""Test config: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (SURVEY.md §4 test plan)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in flags:
    # 8 emulated devices time-share the host's cores; on a 1-core CI box the
    # inter-device skew at a collective can exceed XLA's default 40 s
    # rendezvous termination, which hard-aborts the whole pytest process.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# the image's axon TPU plugin force-registers itself regardless of
# JAX_PLATFORMS; the config update below wins after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache shared across test processes/runs: the heavy
# loop/train-step tests are compile-bound on CPU, and their programs are
# identical run-to-run.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".cache", "jax_test")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", jax.devices()
