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

# persistent compilation cache: reruns skip the big CPU compiles
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The XLA:CPU compiler intermittently segfaults under the
    accumulated in-process compile state of a long suite run (observed
    repeatedly at different tests; each passes in isolation). Dropping
    the jit caches between modules bounds the accumulation."""
    yield
    jax.clear_caches()


_HEAVY_MODULES = ("tests.test_fictdom_structured",
                  "test_fictdom_structured")


@pytest.fixture(autouse=True)
def _clear_jax_caches_heavy(request):
    """The fictdom-structured module alone accumulates enough compiled
    state to reproduce the XLA:CPU segfault (same test crashes after 9
    in-module solves, passes in isolation) — clear per TEST there; the
    persistent cache turns the recompiles into disk loads."""
    yield
    if request.module.__name__ in _HEAVY_MODULES:
        jax.clear_caches()
