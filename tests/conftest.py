"""Test configuration: force an 8-device virtual CPU mesh so all sharding /
collective code paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Must run before jax is imported anywhere. Force-override: the ambient
# environment may pin JAX_PLATFORMS to a real TPU backend whose init is slow.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: repeated test runs skip recompilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/lseg_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
