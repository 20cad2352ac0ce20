"""Scenario ``simple_crypto`` (covert communication): Alice must encrypt a
goal color with a shared key so Bob can reconstruct it but eavesdropper Eve
cannot. All agents are immobile; the game is comm-only.

Capability parity with reference multiagent/scenarios/simple_crypto.py:
  - world: 3 immobile non-colliding agents — eve (idx 0, adversary),
    bob (idx 1), alice (idx 2, speaker, holds a random key); 2 landmarks;
    dim_c=4 (simple_crypto.py:14-44)
  - landmark "colors" are dim_c-wide one-hots (:55-59); the goal color and
    alice's key are each a random landmark's color (:61-63) — stored here
    as goal = [goal_landmark_idx, key_landmark_idx]
  - reward: alice/bob = -||bob.c - goal||^2 + ||eve.c - goal||^2 with
    zero-utterance guards (:97-114); eve = -||eve.c - goal||^2 (:116-121)
  - observation: alice = [goal_color(4), key(4)] = 8; bob =
    [key(4), alice.c(4)] = 8 (only *speaker* agents' comm is observed,
    :137); eve = [alice.c(4)] = 4 (:124-169)
  - benchmark_data: (agent.state.c, goal color) (:78-80)
"""

from __future__ import annotations

import jax.numpy as jnp

from mpe_tpu.core.state import make_spec
from mpe_tpu.scenarios import _base as B


class SimpleCryptoScenario(B.Scenario):
    per_agent_info = frozenset({"comm"})
    name = "simple_crypto"

    def __init__(self):
        self.spec = make_spec(
            "simple_crypto", n_agents=3, n_landmarks=2,
            agent_movable=False, agent_collide=False, agent_silent=False,
            adversary=[True, False, False],
            dim_c=4, n_goals=2,
        )
        self.speaker = (False, False, True)  # simple_crypto.py:34
        self.obs_dims = (4, 8, 8)

    def reset(self, key, dtype=jnp.float32):
        return B.uniform_reset(self.spec, key, dtype, n_goal_choices=(2, 2))

    def _landmark_color(self, idx, dtype):
        """dim_c-wide one-hot color of landmark ``idx`` (:55-59)."""
        return (jnp.arange(self.spec.dim_c) == idx).astype(dtype)

    def reward(self, state):
        dtype = state.dtype
        goal_color = self._landmark_color(state.goal[0], dtype)
        eve_c, bob_c = state.comm[0], state.comm[1]

        def guarded_sqerr(c):
            nonzero = jnp.any(c != 0)
            return jnp.where(nonzero, jnp.sum(jnp.square(c - goal_color)), 0.0)

        good = -guarded_sqerr(bob_c) + guarded_sqerr(eve_c)
        eve = -guarded_sqerr(eve_c)
        return jnp.stack([eve, good, good]).astype(dtype)

    def observation(self, state):
        dtype = state.dtype
        goal_color = self._landmark_color(state.goal[0], dtype)
        key_color = self._landmark_color(state.goal[1], dtype)
        alice_c = state.comm[2]
        rows = [
            alice_c,                                      # eve
            jnp.concatenate([key_color, alice_c]),        # bob
            jnp.concatenate([goal_color, key_color]),     # alice
        ]
        return B.pad_stack(rows, self.obs_width)

    def benchmark_data(self, state):
        return {
            "comm": state.comm,
            "goal_color": self._landmark_color(state.goal[0], state.dtype),
        }

    def entity_colors(self, state):
        dtype = state.dtype
        eve = B.const([0.75, 0.25, 0.25], dtype)
        alice = B.const([0.25, 0.25, 0.25], dtype)
        # bob is painted the goal color (:62); truncate 4-d color to RGB
        bob = self._landmark_color(state.goal[0], dtype)[:3]
        lmk = jnp.stack([self._landmark_color(i, dtype)[:3] for i in range(2)])
        return jnp.concatenate(
            [eve[None], bob[None], alice[None], lmk], axis=0)
