import os

# The session's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon (the TPU tunnel), freezing the env-var default before
# this file runs.  Tests must run on a virtual 8-device CPU mesh, so override
# through jax.config (still effective until first backend use) and set the
# host-device-count flag before the CPU client initializes.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)  # f64 navigation parity on CPU

assert jax.devices()[0].platform == "cpu", "tests must not run on the TPU tunnel"
