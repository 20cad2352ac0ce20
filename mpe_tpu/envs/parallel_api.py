"""PettingZoo-style Parallel API adapter.

Modern users consume MPE through PettingZoo's `parallel_env` interface
(agent-name-keyed dicts, terminations/truncations split, `max_cycles`).
This adapter provides that surface over the TPU-native engine so such
code ports directly:

    env = parallel_env("simple_spread", max_cycles=25)
    obs, infos = env.reset(seed=42)
    while env.agents:
        actions = {a: env.action_space(a).sample(key) for a in env.agents}
        obs, rewards, terminations, truncations, infos = env.step(actions)

Semantics follow this repo's reference parity (the original OpenAI repo,
not PettingZoo's fork — e.g. rewards keep the reference's shared-sum
broadcast and self-collision quirk). Terminations are always False (the
reference never terminates, environment.py:132-135); truncations fire at
``max_cycles`` like PettingZoo's time limit.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from mpe_tpu.core.actions import ActionMode
from mpe_tpu.envs.functional import MpeEnv
from mpe_tpu.envs.wrappers import pack_actions


def default_agent_names(spec) -> list[str]:
    """PettingZoo-style names derived from the entity table: leaders ->
    'leadadversary_i', adversaries -> 'adversary_i', others 'agent_i'."""
    names, counts = [], {"leadadversary": 0, "adversary": 0, "agent": 0}
    for i in range(spec.n_agents):
        if spec.leader[i]:
            kind = "leadadversary"
        elif spec.adversary[i]:
            kind = "adversary"
        else:
            kind = "agent"
        names.append(f"{kind}_{counts[kind]}")
        counts[kind] += 1
    return names


# scenarios where PettingZoo uses role names instead of the generic ones
_SPECIAL_NAMES = {
    "simple_speaker_listener": ["speaker_0", "listener_0"],
    "simple_crypto": ["eve_0", "bob_0", "alice_0"],
}


class ParallelEnv:
    """Agent-name-keyed parallel environment (PettingZoo Parallel API)."""

    def __init__(
        self,
        scenario,
        max_cycles: int = 25,
        action_mode: ActionMode = ActionMode.DISCRETE,
        seed: int = 0,
    ):
        if isinstance(scenario, str):
            from mpe_tpu import scenarios as registry

            scenario = registry.load(scenario)
        self.env = MpeEnv(scenario, action_mode=action_mode)
        self.scenario = scenario
        self.max_cycles = max_cycles
        spec = self.env.spec
        self.possible_agents = _SPECIAL_NAMES.get(
            spec.name, default_agent_names(spec))
        self.agents: list[str] = []
        self._action_spaces = dict(
            zip(self.possible_agents, self.env.action_spaces()))
        self._obs_spaces = dict(
            zip(self.possible_agents, self.env.observation_spaces()))
        self._key = jax.random.PRNGKey(seed)
        self._jit_reset = jax.jit(self.env.reset)
        self._jit_step = jax.jit(self.env.step)
        self._state = None
        self._t = 0

    # -- spaces ----------------------------------------------------------
    def action_space(self, agent: str):
        return self._action_spaces[agent]

    def observation_space(self, agent: str):
        return self._obs_spaces[agent]

    @property
    def num_agents(self) -> int:
        return len(self.agents)

    # -- episode ----------------------------------------------------------
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _split_obs(self, obs) -> dict[str, np.ndarray]:
        obs = np.asarray(obs)
        return {
            name: obs[i, :d]
            for i, (name, d) in enumerate(
                zip(self.possible_agents, self.scenario.obs_dims))
        }

    def reset(self, seed: int | None = None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._state, obs = self._jit_reset(self._next_key())
        self._t = 0
        self.agents = list(self.possible_agents)
        infos: dict[str, dict[str, Any]] = {a: {} for a in self.agents}
        return self._split_obs(obs), infos

    def step(self, actions: dict[str, Any]):
        assert self.agents, "step() called on a finished episode; reset()"
        missing = set(self.agents) - set(actions)
        assert not missing, f"missing actions for {sorted(missing)}"
        action_n = [actions[a] for a in self.possible_agents]
        packed = pack_actions(self.env, action_n)
        self._state, obs, reward, done, info = self._jit_step(
            self._state, packed, self._next_key())
        self._t += 1
        reward = np.asarray(reward)
        rewards = {a: float(reward[i])
                   for i, a in enumerate(self.possible_agents)}
        # reference never terminates; PettingZoo-style truncation at the
        # time limit
        trunc = self._t >= self.max_cycles
        terminations = {a: False for a in self.possible_agents}
        truncations = {a: trunc for a in self.possible_agents}
        host_info = {k: np.asarray(v) for k, v in (info or {}).items()}
        infos = {a: {k: (v[i] if v.ndim and v.shape[0] == len(
            self.possible_agents) else v) for k, v in host_info.items()}
            for i, a in enumerate(self.possible_agents)}
        if trunc:
            self.agents = []
        return self._split_obs(obs), rewards, terminations, truncations, infos

    def close(self):
        pass


def parallel_env(scenario, **kwargs) -> ParallelEnv:
    """PettingZoo-style factory: ``parallel_env('simple_tag',
    max_cycles=25)``."""
    return ParallelEnv(scenario, **kwargs)
