"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths can be exercised without TPU hardware.

NOTE: the axon TPU plugin in this environment ignores the JAX_PLATFORMS
environment variable; only jax.config.update("jax_platforms", ...) works,
and it must run before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
