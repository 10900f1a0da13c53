"""Global configuration for proton_tpu.

The reference library (ProtoN) is a double-precision CPU code; accuracy parity
(convergence tables in BASELINE.md) requires float64. On TPU, float64 is
emulated and slow, so the benchmark path can run in float32 with HIGHEST
matmul precision instead. Everything downstream takes dtypes from here.

Set the environment variable ``PROTON_TPU_X64=0`` *before* importing
``proton_tpu`` to disable 64-bit mode globally.
"""

from __future__ import annotations

import os

import jax

# Enable 64-bit mode by default: the reference is an f64 code and the
# correctness gate (BASELINE.md) requires matching errors to ~1e-10.
_X64 = os.environ.get("PROTON_TPU_X64", "1") not in ("0", "false", "False")
if _X64:
    jax.config.update("jax_enable_x64", True)

# Backend override. NOTE: the axon TPU plugin ignores the standard
# JAX_PLATFORMS environment variable, so we provide PROTON_TPU_PLATFORM
# and apply it through jax.config (which does work) before any backend
# initialization.
_PLATFORM = os.environ.get("PROTON_TPU_PLATFORM")
if _PLATFORM:
    jax.config.update("jax_platforms", _PLATFORM)

import jax.numpy as jnp  # noqa: E402  (after x64 flag)
import numpy as np  # noqa: E402


def default_real_dtype():
    """Working floating dtype: f64 when x64 mode is on, else f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_int_dtype():
    return jnp.int32


def np_real_dtype():
    return np.float64 if jax.config.jax_enable_x64 else np.float32


# Matmul precision used for all einsum/dot contractions in local operator
# construction. On TPU, "highest" selects the f32-accurate 6-pass bf16
# algorithm; on CPU it is a no-op.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST
