import os

# Tests run on a virtual CPU mesh: 8 host devices for sharding tests.
# Force CPU: the session environment pins JAX_PLATFORMS=axon (the TPU
# tunnel), which must not be touched by unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)  # f64 navigation parity on CPU
