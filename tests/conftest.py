"""Test config: force CPU with 8 virtual devices (the standard JAX
technique for testing sharded code without a pod; SURVEY.md §4 item 4),
and enable x64 so parity tests compare against the float64 NumPy
reference at tight tolerances.

NOTE: the axon TPU tunnel's sitecustomize.py imports jax at interpreter
startup, so env vars set here are too late for jax's config snapshot —
use jax.config.update instead (XLA_FLAGS is still read lazily at backend
init, so setting it here works as long as no backend has been touched).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
