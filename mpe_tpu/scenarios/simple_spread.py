"""Scenario ``simple_spread`` (cooperative navigation): 3 agents cover 3
landmarks, penalized for collisions; shared (collaborative) reward.

Capability parity with reference multiagent/scenarios/simple_spread.py:
  - world: 3 colliding silent agents (size 0.15), 3 landmarks, dim_c=2,
    collaborative=True (simple_spread.py:7-29)
  - reward: -sum_l min_a dist(a, l), minus 1 per "collision" — the
    reference loop includes the agent itself and dist 0 < 2*size always
    counts, so every colliding agent carries a -1 self-collision offset
    (simple_spread.py:72-82, 66-70); reproduced exactly.
  - observation: [vel(2), pos(2), 3 landmark_rel(6), 2 other_rel(4),
    2 other_comm(4)] = 18-d (simple_spread.py:84-100; the computed-but-
    unused entity_color list at :89-92 is not concatenated).
  - benchmark_data: (rew, collisions, min_dists, occupied_landmarks<0.1)
    (simple_spread.py:47-63).
"""

from __future__ import annotations

import jax.numpy as jnp

from mpe_tpu.core.state import make_spec
from mpe_tpu.scenarios import _base as B


class SimpleSpreadScenario(B.Scenario):
    per_agent_info = frozenset({"rew", "collisions"})
    name = "simple_spread"

    def __init__(self):
        self.spec = make_spec(
            "simple_spread", n_agents=3, n_landmarks=3,
            agent_collide=True, agent_silent=True, agent_size=0.15,
            dim_c=2, collaborative=True,
        )
        self.obs_dims = (18, 18, 18)

    def reset(self, key, dtype=jnp.float32):
        return B.uniform_reset(self.spec, key, dtype)

    def _min_dist_term(self, state):
        d = B.agent_landmark_dist(self.spec, state)       # [A, L]
        return jnp.min(d, axis=0)                          # [L]

    def reward(self, state):
        a = self.spec.n_agents
        common = -jnp.sum(self._min_dist_term(state))      # shared distance term
        # per-agent collision count over ALL agents incl. self (ref quirk)
        ncol = jnp.sum(B.collisions(self.spec, state), axis=0).astype(state.dtype)
        return jnp.full((a,), common, state.dtype) - ncol

    def observation(self, state):
        spec = self.spec
        a = spec.n_agents
        lrel = B.landmark_rel(spec, state).reshape(a, -1)
        orel = B.other_rel(spec, state).reshape(a, -1)
        ocom = B.other_comm(spec, state).reshape(a, -1)
        return jnp.concatenate(
            [state.vel[:a], state.pos[:a], lrel, orel, ocom], axis=-1
        )

    def benchmark_data(self, state):
        mins = self._min_dist_term(state)                  # [L]
        rew = self.reward(state)                           # [A] (pre-share)
        ncol = jnp.sum(B.collisions(self.spec, state), axis=0)
        return {
            "rew": rew,
            "collisions": ncol,
            "min_dists": jnp.sum(mins),
            "occupied_landmarks": jnp.sum(mins < 0.1),
        }

    def entity_colors(self, state):
        colors = [[0.35, 0.35, 0.85]] * 3 + [[0.25, 0.25, 0.25]] * 3
        return B.const(colors, state.dtype)
