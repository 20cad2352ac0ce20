"""Shared helpers for the study tools in this directory."""

from __future__ import annotations


def select_rows(mask, if_true, if_false):
    """Per-agent parameter mixer: for pytrees whose leaves lead with the
    agent axis [A, ...], take agent i's row from ``if_true`` where
    ``mask[i]`` else from ``if_false`` — the cross-play combiner
    (good-side rows from one trained population, adversary rows from
    another) used by ensemble_exploit.py and ddpg_vs_maddpg.py."""
    import jax
    import jax.numpy as jnp

    m = jnp.asarray(mask)
    return jax.tree.map(
        lambda t, f: jnp.where(
            m.reshape((m.shape[0],) + (1,) * (t.ndim - 1)), t, f),
        if_true, if_false)
