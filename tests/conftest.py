"""Test config: force CPU with 8 virtual devices (the standard JAX
technique for testing sharded code without a pod; SURVEY.md §4 item 4),
and enable x64 so parity tests compare against the float64 NumPy
reference at tight tolerances."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
