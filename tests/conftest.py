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
# NOTE: the persistent XLA:CPU compile cache is DISABLED here. In this
# environment deserializing cached CPU AOT executables crashes the
# process (SIGSEGV/abort inside compilation_cache.get_executable_and_time
# — reproduced even with a fresh same-host cache dir, plus "Compile
# machine features ... doesn't match" warnings on a heterogeneous
# fleet). Cold-compiling the suite (~9 min) is slower but reliable.

assert jax.devices()[0].platform == "cpu", jax.devices()
