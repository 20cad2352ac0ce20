"""Scenario ``simple_reference``: 2 speaking agents, 3 landmarks; each agent
must guide the *other* to a private goal landmark via a 10-d comm channel.

Capability parity with reference multiagent/scenarios/simple_reference.py:
  - world: 2 non-colliding, non-silent agents, 3 landmarks, dim_c=10,
    collaborative=True (simple_reference.py:6-24)
  - reset: each agent's goal is (other agent, random landmark)
    (simple_reference.py:26-35); stored here as goal[i] = agent i's goal
    landmark index.
  - reward: -||other_agent - goal_landmark||^2 per agent, shared via the
    collaborative sum (simple_reference.py:55-59)
  - observation: [vel(2), 3 landmark_rel(6), goal_b color(3),
    other_comm(10)] = 21-d (simple_reference.py:61-80; the entity_color
    list built at :71-74 is unused)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mpe_tpu.core.state import make_spec
from mpe_tpu.scenarios import _base as B

LANDMARK_COLORS = np.array(
    [[0.75, 0.25, 0.25], [0.25, 0.75, 0.25], [0.25, 0.25, 0.75]]
)  # simple_reference.py:40-42


class SimpleReferenceScenario(B.Scenario):
    name = "simple_reference"

    def __init__(self):
        self.spec = make_spec(
            "simple_reference", n_agents=2, n_landmarks=3,
            agent_collide=False, agent_silent=False,
            dim_c=10, collaborative=True, n_goals=2,
        )
        self.obs_dims = (21, 21)

    def reset(self, key, dtype=jnp.float32):
        return B.uniform_reset(self.spec, key, dtype, n_goal_choices=(3, 3))

    def reward(self, state):
        # agent i is rewarded for the OTHER agent reaching lmk[goal[i]]
        other = state.pos[jnp.asarray([1, 0])]                 # [2, P]
        lpos = B.landmark_pos(self.spec, state)
        # unrolled per-goal one-hot selects (a batched [2,L]@[L,P] matmul
        # lowers to pathologically padded MXU ops under vmap: 7 M vs 42 M
        # steps/s measured; the vector form stays on the VPU)
        goal_pos = jnp.stack([B.take_row(lpos, state.goal[0]),
                              B.take_row(lpos, state.goal[1])])   # [2, P]
        return -jnp.sum(jnp.square(other - goal_pos), axis=-1)

    def observation(self, state):
        spec = self.spec
        a = spec.n_agents
        lrel = B.landmark_rel(spec, state).reshape(a, -1)
        colors = B.const(LANDMARK_COLORS, state.dtype)
        goal_color = jnp.stack([B.take_row(colors, state.goal[0]),
                                B.take_row(colors, state.goal[1])])  # [2,3]
        ocom = B.other_comm(spec, state).reshape(a, -1)
        return jnp.concatenate([state.vel[:a], lrel, goal_color, ocom], axis=-1)

    def entity_colors(self, state):
        lmk = B.const(LANDMARK_COLORS, state.dtype)
        # goal_a.color = goal_b.color (simple_reference.py:44-45):
        # agent1 gets agent0's goal color and vice versa
        agent_colors = lmk[state.goal][jnp.asarray([1, 0])]
        return jnp.concatenate([agent_colors, lmk], axis=0)
