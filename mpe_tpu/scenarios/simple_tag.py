"""Scenario ``simple_tag`` (predator–prey): 3 slower adversaries chase 1
faster good agent around 2 large obstacle landmarks.

Capability parity with reference multiagent/scenarios/simple_tag.py:
  - world: adversaries size 0.075 / accel 3.0 / max_speed 1.0; prey size
    0.05 / accel 4.0 / max_speed 1.3; 2 colliding immovable landmarks size
    0.2 placed uniform(-0.9, 0.9); dim_c=2 (simple_tag.py:7-54)
  - reward (the hardcoded shape=False branches, :92-93/:118): prey = -10
    per adversary collision - screen-exit penalty bound(|x|) per dim
    (:89-113); each predator = +10 per (prey, any-predator) collision
    (:115-129)
  - observation: [vel(2), pos(2), 2 landmark_rel(4), 3 other_pos(6),
    other_vel (prey velocity, predators only)] -> predator 16-d, prey
    14-d (:131-147)
  - benchmark_data: predator -> prey-collision count, prey -> 0 (:57-66)
"""

from __future__ import annotations

import jax.numpy as jnp

from mpe_tpu.core.state import make_spec
from mpe_tpu.scenarios import _base as B


class SimpleTagScenario(B.Scenario):
    per_agent_info = frozenset({"collisions"})
    name = "simple_tag"

    n_adversaries = 3

    def __init__(self):
        adv = [True] * 3 + [False]
        self.spec = make_spec(
            "simple_tag", n_agents=4, n_landmarks=2,
            agent_collide=True, agent_silent=True,
            agent_size=[0.075] * 3 + [0.05],
            agent_accel=[3.0] * 3 + [4.0],
            agent_max_speed=[1.0] * 3 + [1.3],
            adversary=adv,
            landmark_collide=True, landmark_size=0.2,
            dim_c=2,
        )
        self.obs_dims = (16, 16, 16, 14)

    def reset(self, key, dtype=jnp.float32):
        return B.uniform_reset(self.spec, key, dtype, landmark_range=0.9)

    def _prey_collisions(self, state):
        """[n_adv] bool — is each adversary colliding with the prey."""
        col = B.collisions(self.spec, state)          # [A, A]
        return col[:3, 3]

    def reward(self, state):
        dtype = state.dtype
        hits = self._prey_collisions(state).sum().astype(dtype)
        adv_r = 10.0 * hits                            # same for each predator
        prey_r = -10.0 * hits - jnp.sum(
            B.bound_penalty(jnp.abs(state.pos[3])))
        return jnp.concatenate([jnp.full((3,), adv_r, dtype), prey_r[None]])

    def observation(self, state):
        spec = self.spec
        a = spec.n_agents
        lrel = B.landmark_rel(spec, state).reshape(a, -1)
        opos = B.other_rel(spec, state).reshape(a, -1)
        base = jnp.concatenate([state.vel[:a], state.pos[:a], lrel, opos],
                               axis=-1)                # [A, 14]
        prey_vel = state.vel[3]
        rows = [jnp.concatenate([base[i], prey_vel]) for i in range(3)]
        rows.append(base[3])
        return B.pad_stack(rows, self.obs_width)

    def benchmark_data(self, state):
        hits = self._prey_collisions(state).astype(jnp.int32)
        return {"collisions": jnp.concatenate(
            [hits, jnp.zeros((1,), jnp.int32)])}

    def entity_colors(self, state):
        colors = [[0.85, 0.35, 0.35]] * 3 + [[0.35, 0.85, 0.35]] + \
                 [[0.25, 0.25, 0.25]] * 2
        return B.const(colors, state.dtype)
