"""Test configuration: force an 8-device virtual CPU mesh so all sharding /
collective code paths are exercised without TPU hardware (SURVEY.md §4).

Note: the ambient environment may pre-import jax (sitecustomize) with
JAX_PLATFORMS pointing at a tunneled TPU backend, so setting the env var
here is too late — we must update jax.config directly. XLA_FLAGS is still
read lazily at first backend init, so setting it here works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: repeated test runs skip recompilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/lseg_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", jax.devices()
