"""Scenario ``simple``: 1 agent, 1 landmark, no collisions, no comm.

Capability parity with reference multiagent/scenarios/simple.py:
  - world: 1 non-colliding silent agent, 1 static landmark (simple.py:6-22)
  - reset: agent & landmark uniform in [-1,1]^2, zero vel (simple.py:33-39)
  - reward: -||agent - landmark||^2 (squared distance; simple.py:41-43)
  - observation: [vel(2), landmark_rel(2)] = 4-d (simple.py:45-50)
"""

from __future__ import annotations

import jax.numpy as jnp

from mpe_tpu.core.state import make_spec
from mpe_tpu.scenarios import _base as B


class SimpleScenario(B.Scenario):
    name = "simple"

    def __init__(self):
        self.spec = make_spec(
            "simple", n_agents=1, n_landmarks=1,
            agent_collide=False, agent_silent=True,
            dim_c=0,
        )
        self.obs_dims = (4,)

    def reset(self, key, dtype=jnp.float32):
        return B.uniform_reset(self.spec, key, dtype)

    def reward(self, state):
        d2 = jnp.sum(jnp.square(state.pos[0] - state.pos[1]))
        return -d2[None]

    def observation(self, state):
        rel = B.landmark_rel(self.spec, state).reshape(1, -1)
        return jnp.concatenate([state.vel[:1], rel], axis=-1)

    def entity_colors(self, state):
        return B.const([[0.25, 0.25, 0.25], [0.75, 0.25, 0.25]], state.dtype)
