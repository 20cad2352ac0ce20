"""Scenario ``simple_adversary`` (physical deception): two good agents must
cover the goal landmark while an adversary that doesn't know which landmark
is the goal tries to reach it too.

Capability parity with reference multiagent/scenarios/simple_adversary.py:
  - world: 3 agents (agent0 adversary), 2 landmarks; no collisions, all
    silent; agent size 0.15, landmark size 0.08; dim_c=2
    (simple_adversary.py:8-33)
  - reward (shaped variants, the hardcoded shaped_reward=True branch,
    :82-107): good = -min_good dist(a, goal) + sum_adv dist(adv, goal);
    adversary = -||adv - goal||^2 (:109-118)
  - observation: good = [goal_rel(2), 2 landmark_rel(4), 2 other_rel(4)]
    = 10-d; adversary = 8-d without the goal (:121-139; unused
    entity_color at :126-129)
  - benchmark_data: adversary -> squared dist to goal; good -> squared
    dists to (each landmark..., goal) (:57-66)
"""

from __future__ import annotations

import jax.numpy as jnp

from mpe_tpu.core.state import make_spec
from mpe_tpu.scenarios import _base as B


class SimpleAdversaryScenario(B.Scenario):
    per_agent_info = frozenset({"dists"})
    name = "simple_adversary"

    def __init__(self):
        self.spec = make_spec(
            "simple_adversary", n_agents=3, n_landmarks=2,
            agent_collide=False, agent_silent=True, agent_size=0.15,
            adversary=[True, False, False], landmark_size=0.08,
            dim_c=2, n_goals=1,
        )
        self.obs_dims = (8, 10, 10)

    def reset(self, key, dtype=jnp.float32):
        return B.uniform_reset(self.spec, key, dtype, n_goal_choices=(2,))

    def _goal_dists(self, state):
        goal_pos = B.take_row(B.landmark_pos(self.spec, state), state.goal[0])
        return jnp.sqrt(
            jnp.sum(jnp.square(state.pos[:3] - goal_pos), axis=-1)
        )  # [A]

    def reward(self, state):
        d = self._goal_dists(state)
        adv_r = -jnp.square(d[0])                       # squared for adversary
        good_r = -jnp.minimum(d[1], d[2]) + d[0]        # shaped good reward
        return jnp.stack([adv_r, good_r, good_r])

    def observation(self, state):
        spec = self.spec
        a = spec.n_agents
        goal_pos = B.take_row(B.landmark_pos(spec, state), state.goal[0])
        goal_rel = goal_pos[None] - state.pos[:a]        # [A, 2]
        lrel = B.landmark_rel(spec, state).reshape(a, -1)
        orel = B.other_rel(spec, state).reshape(a, -1)
        rows = [jnp.concatenate([lrel[0], orel[0]])]     # adversary: no goal
        for i in (1, 2):
            rows.append(jnp.concatenate([goal_rel[i], lrel[i], orel[i]]))
        return B.pad_stack(rows, self.obs_width)

    def benchmark_data(self, state):
        d2 = jnp.square(B.agent_landmark_dist(self.spec, state))  # [A, L]
        goal_d2 = jnp.square(self._goal_dists(state))             # [A]
        # rows: [d^2 lmk0, d^2 lmk1, d^2 goal]; adversary only uses goal
        dists = jnp.concatenate([d2, goal_d2[:, None]], axis=-1)
        return {"dists": dists, "adversary_goal_sqdist": goal_d2[0]}

    def entity_colors(self, state):
        colors = jnp.broadcast_to(
            B.const([0.15, 0.15, 0.15], state.dtype), (2, 3))
        goal_color = jnp.zeros((2, 3), state.dtype).at[state.goal[0]].set(
            B.const([0.15, 0.65, 0.15], state.dtype))
        lmk = jnp.where(goal_color.sum(-1, keepdims=True) > 0, goal_color, colors)
        agents = B.const(
            [[0.85, 0.35, 0.35], [0.35, 0.35, 0.85], [0.35, 0.35, 0.85]],
            state.dtype)
        return jnp.concatenate([agents, lmk], axis=0)
