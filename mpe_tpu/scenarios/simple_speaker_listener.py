"""Scenario ``simple_speaker_listener`` (cooperative communication): an
immobile speaker tells a mute listener which landmark to reach.

Capability parity with reference
multiagent/scenarios/simple_speaker_listener.py:
  - world: agent0 speaker (movable=False), agent1 listener (silent=True),
    both size 0.075, 3 landmarks size 0.04, dim_c=3, collaborative
    (simple_speaker_listener.py:6-31)
  - reward: -||listener - goal_landmark||^2 for both agents
    (simple_speaker_listener.py:63-67)
  - observation: speaker = goal landmark color (3-d); listener =
    [vel(2), 3 landmark_rel(6), speaker_comm(3)] = 11-d
    (simple_speaker_listener.py:69-91)
  - the reference's ``benchmark_data`` crashes (passes the bound method
    instead of the world, :59-61); ours returns the reward it *intended*.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mpe_tpu.core.state import make_spec
from mpe_tpu.scenarios import _base as B

LANDMARK_COLORS = np.array(
    [[0.65, 0.15, 0.15], [0.15, 0.65, 0.15], [0.15, 0.15, 0.65]]
)  # simple_speaker_listener.py:45-47


class SimpleSpeakerListenerScenario(B.Scenario):
    per_agent_info = frozenset({"rew"})
    name = "simple_speaker_listener"

    def __init__(self):
        self.spec = make_spec(
            "simple_speaker_listener", n_agents=2, n_landmarks=3,
            agent_collide=False, agent_size=0.075,
            agent_movable=[False, True], agent_silent=[False, True],
            landmark_size=0.04,
            dim_c=3, collaborative=True, n_goals=1,
        )
        self.obs_dims = (3, 11)

    def reset(self, key, dtype=jnp.float32):
        return B.uniform_reset(self.spec, key, dtype, n_goal_choices=(3,))

    def reward(self, state):
        goal_pos = B.take_row(B.landmark_pos(self.spec, state), state.goal[0])
        d2 = jnp.sum(jnp.square(state.pos[1] - goal_pos))
        return jnp.full((2,), -d2, state.dtype)

    def observation(self, state):
        spec = self.spec
        goal_color = B.take_row(B.const(LANDMARK_COLORS, state.dtype), state.goal[0])
        lrel = B.landmark_rel(spec, state)
        listener = jnp.concatenate(
            [state.vel[1], lrel[1].reshape(-1), state.comm[0]]
        )
        return B.pad_stack([goal_color, listener], self.obs_width)

    def benchmark_data(self, state):
        return {"rew": self.reward(state)}

    def entity_colors(self, state):
        lmk = B.const(LANDMARK_COLORS, state.dtype)
        # listener (speaker's goal_a) colored goal color + 0.45 grey
        # (simple_speaker_listener.py:49)
        listener = B.take_row(lmk, state.goal[0]) + 0.45
        speaker = B.const([0.25, 0.25, 0.25], state.dtype)
        return jnp.concatenate([speaker[None], listener[None], lmk], axis=0)
