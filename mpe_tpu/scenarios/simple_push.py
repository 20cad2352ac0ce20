"""Scenario ``simple_push`` (keep-away): an adversary is rewarded for
pushing the good agent away from its goal landmark.

Capability parity with reference multiagent/scenarios/simple_push.py:
  - world: 2 colliding silent agents (agent0 adversary), 2 landmarks,
    dim_c=2, random goal landmark (simple_push.py:6-56)
  - reward: good = -dist(agent, goal) (:62-64); adversary =
    min_good dist(good, goal) - dist(adv, goal) (:66-74)
  - observation: good = [vel(2), goal_rel(2), own color(3),
    2 landmark_rel(4), 2 landmark colors(6), other_rel(2)] = 19-d;
    adversary = [vel(2), landmark_rel(4), other_rel(2)] = 8-d (:76-96).
    Landmark colors are [0.1,0.1,0.1] with channel i+1 boosted 0.8
    (:35-37); the good agent's own color gets channel goal+1 boosted 0.5
    (:43-48) — both are goal-dependent observation content, computed here
    from the goal index.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mpe_tpu.core.state import make_spec
from mpe_tpu.scenarios import _base as B

LANDMARK_COLORS = np.array([[0.1, 0.9, 0.1], [0.1, 0.1, 0.9]])


class SimplePushScenario(B.Scenario):
    name = "simple_push"

    def __init__(self):
        self.spec = make_spec(
            "simple_push", n_agents=2, n_landmarks=2,
            agent_collide=True, agent_silent=True,
            adversary=[True, False],
            dim_c=2, n_goals=1,
        )
        self.obs_dims = (8, 19)

    def reset(self, key, dtype=jnp.float32):
        return B.uniform_reset(self.spec, key, dtype, n_goal_choices=(2,))

    def _goal_dists(self, state):
        goal_pos = B.take_row(B.landmark_pos(self.spec, state), state.goal[0])
        return jnp.sqrt(jnp.sum(jnp.square(state.pos[:2] - goal_pos), axis=-1))

    def reward(self, state):
        d = self._goal_dists(state)
        return jnp.stack([d[1] - d[0], -d[1]])

    def observation(self, state):
        spec = self.spec
        dtype = state.dtype
        goal_pos = B.take_row(B.landmark_pos(spec, state), state.goal[0])
        lrel = B.landmark_rel(spec, state).reshape(2, -1)
        orel = B.other_rel(spec, state).reshape(2, -1)
        # good agent's own color: [0.25]*3 with channel goal+1 += 0.5
        own_color = B.const([0.25, 0.25, 0.25], dtype) + 0.5 * jax_one_hot3(
            state.goal[0] + 1, dtype)
        lcolors = B.const(LANDMARK_COLORS.ravel(), dtype)
        adv = jnp.concatenate([state.vel[0], lrel[0], orel[0]])
        good = jnp.concatenate(
            [state.vel[1], goal_pos - state.pos[1], own_color,
             lrel[1], lcolors, orel[1]])
        return B.pad_stack([adv, good], self.obs_width)

    def entity_colors(self, state):
        dtype = state.dtype
        good = B.const([0.25, 0.25, 0.25], dtype) + 0.5 * jax_one_hot3(
            state.goal[0] + 1, dtype)
        adv = B.const([0.75, 0.25, 0.25], dtype)
        return jnp.concatenate(
            [adv[None], good[None], B.const(LANDMARK_COLORS, dtype)], axis=0)


def jax_one_hot3(idx, dtype):
    return (jnp.arange(3) == idx).astype(dtype)
