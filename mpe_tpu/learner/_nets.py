"""Shared tiny-MLP building blocks for the learners."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_init(key, n_in: int, n_out: int, dtype=jnp.float32, scale=None):
    """He-scaled dense layer params {w, b}; pass ``scale`` to override
    (e.g. 0.01 for near-zero policy heads)."""
    s = jnp.sqrt(2.0 / n_in).astype(dtype) if scale is None else scale
    return {"w": jax.random.normal(key, (n_in, n_out), dtype) * s,
            "b": jnp.zeros((n_out,), dtype)}
