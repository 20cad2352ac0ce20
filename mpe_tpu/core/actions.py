"""Batched action decoding.

Replicates ``MultiAgentEnv._set_action`` (reference environment.py:144-192)
as a single vectorized transform from a **canonical padded action layout**
to physical forces ``u`` [A,P] and comm utterances ``c`` [A,C].

Canonical layouts (one row per agent, every agent padded to the same width
so the whole thing is one static-shape tensor — the gym-style wrapper maps
the reference's ragged per-agent format into this):

  DISCRETE   (discrete_action_space=True, the default; environment.py:29):
      [A, 5 + C] — one-hot-ish move 5-vector followed by comm logits.
      u[0] = a[1] - a[2]; u[1] = a[3] - a[4]   (environment.py:174-175)
  CONTINUOUS (discrete_action_space=False):
      [A, P + C] — raw force vector followed by comm vector
      (environment.py:47,54,177).
  DISCRETE_INDEX (discrete_action_input=True; environment.py:161-167,185-187):
      [A, 2] int32 — (move index, comm index); move 0=noop, 1=-x, 2=+x,
      3=-y, 4=+y (NOTE: this index convention differs from the one-hot
      path, where index 1 is +x — a reference quirk preserved here), comm
      becomes a one-hot.

In every mode the move part is scaled by ``sensitivity = accel or 5.0``
(environment.py:178-181), zeroed for non-movable agents, and the comm part
is zeroed for silent agents (they never receive a comm slice in the
reference; core.py:173-174 then zeroes their state anyway).

``force_discrete_action`` (world.discrete_action; environment.py:169-172)
argmax-quantizes the move part of a continuous-format action before the
one-hot decode.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp

from mpe_tpu.core.state import ScenarioSpec


class ActionMode(enum.Enum):
    DISCRETE = "discrete"             # one-hot vectors (reference default)
    CONTINUOUS = "continuous"         # Box actions
    DISCRETE_INDEX = "discrete_index" # integer actions


def action_width(spec: ScenarioSpec, mode: ActionMode) -> int:
    """Width of one canonical action row."""
    if mode is ActionMode.DISCRETE:
        return 2 * spec.dim_p + 1 + spec.dim_c
    if mode is ActionMode.CONTINUOUS:
        return spec.dim_p + spec.dim_c
    return 2


def decode_actions(
    spec: ScenarioSpec,
    actions: jax.Array,
    mode: ActionMode = ActionMode.DISCRETE,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Canonical [A, W] actions -> (u [A,P], c [A,C])."""
    a, p, dc = spec.n_agents, spec.dim_p, spec.dim_c
    movable = jnp.asarray(spec.movable[:a], dtype)[:, None]
    silent = jnp.asarray(spec.silent, bool)[:, None]
    sensitivity = jnp.asarray(spec.accel, dtype)[:, None]

    if mode is ActionMode.DISCRETE_INDEX:
        actions = actions.astype(jnp.int32)
        move_idx = actions[:, 0]
        # index convention of environment.py:161-167
        ux = jnp.where(move_idx == 1, -1.0, 0.0) + jnp.where(move_idx == 2, 1.0, 0.0)
        uy = jnp.where(move_idx == 3, -1.0, 0.0) + jnp.where(move_idx == 4, 1.0, 0.0)
        u = jnp.stack([ux, uy], axis=-1).astype(dtype)
        c = jax.nn.one_hot(actions[:, 1], dc, dtype=dtype) if dc else jnp.zeros((a, 0), dtype)
    else:
        actions = actions.astype(dtype)
        if mode is ActionMode.DISCRETE:
            move = actions[:, : 2 * p + 1]                    # [A, 5]
            if spec.force_discrete_action:
                move = jax.nn.one_hot(jnp.argmax(move, -1), 2 * p + 1, dtype=dtype)
            # u[k] = a[2k+1] - a[2k+2] (environment.py:174-175)
            u = move[:, 1::2] - move[:, 2::2]                 # [A, P]
            c = actions[:, 2 * p + 1 :]
        else:
            move = actions[:, :p]
            if spec.force_discrete_action:
                move = jax.nn.one_hot(jnp.argmax(move, -1), p, dtype=dtype)
            u = move
            c = actions[:, p:]

    u = u * sensitivity * movable
    c = jnp.where(silent, jnp.zeros((), dtype), c)
    return u, c
