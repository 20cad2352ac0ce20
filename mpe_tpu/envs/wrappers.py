"""Stateful gym-style wrappers over the functional core.

``MultiAgentEnv`` is the drop-in ergonomic equivalent of the reference's
class of the same name (reference multiagent/environment.py:9-263):
``step(action_n) -> (obs_n, reward_n, done_n, info_n)`` with per-agent
Python lists and ragged reference-format actions, ``reset() -> obs_n``,
``render(mode)``, ``.n``/``.action_space``/``.observation_space``.

``VecMultiAgentEnv`` replaces ``BatchMultiAgentEnv`` (environment.py:
288-335): instead of a Python loop over sub-envs it is one ``vmap``-ed,
jitted step over an env axis — thousands of lockstep envs per device.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mpe_tpu.core.actions import ActionMode
from mpe_tpu.envs.functional import MpeEnv


def pack_actions(env: MpeEnv, action_n: Sequence[Any]) -> jax.Array:
    """Reference-format per-agent actions -> canonical padded [A, W].

    The reference hands each agent only the segments its action space has
    (movement iff movable, comm iff non-silent; environment.py:44-66) and
    splits MultiDiscrete actions by sub-space size (environment.py:148-155).
    """
    spec, mode = env.spec, env.action_mode
    a = spec.n_agents
    assert len(action_n) == a, f"expected {a} actions, got {len(action_n)}"
    if mode is ActionMode.DISCRETE_INDEX:
        rows = np.zeros((a, 2), np.int32)
        for i, act in enumerate(action_n):
            segs = np.atleast_1d(np.asarray(act, np.int32))
            j = 0
            if spec.movable[i]:
                rows[i, 0] = segs[j]
                j += 1
            if not spec.silent[i]:
                rows[i, 1] = segs[j]
                j += 1
            assert j == len(segs), f"agent {i}: unconsumed action elements"
        return jnp.asarray(rows)

    move_w = 2 * spec.dim_p + 1 if mode is ActionMode.DISCRETE else spec.dim_p
    rows = np.zeros((a, env.action_width), np.float64)
    for i, act in enumerate(action_n):
        act = np.asarray(act, np.float64).ravel()
        expected = (move_w if spec.movable[i] else 0) + (
            0 if spec.silent[i] else spec.dim_c)
        assert len(act) == expected, (
            f"agent {i}: action length {len(act)} != expected {expected}"
        )  # the reference's assert len(action)==0 (environment.py:192)
        j = 0
        if spec.movable[i]:
            rows[i, :move_w] = act[:move_w]
            j = move_w
        if not spec.silent[i]:
            rows[i, move_w:] = act[j : j + spec.dim_c]
    return jnp.asarray(rows, env.dtype)


class MultiAgentEnv:
    """Stateful convenience wrapper; one env instance, host-friendly API."""

    metadata = {"render.modes": ["human", "rgb_array"]}

    def __init__(
        self,
        scenario_or_env,
        *,
        action_mode: ActionMode = ActionMode.DISCRETE,
        max_steps: int | None = None,
        seed: int = 0,
        benchmark: bool = False,
        shared_viewer: bool = True,
        dtype=jnp.float32,
    ):
        if isinstance(scenario_or_env, MpeEnv):
            self.env = scenario_or_env
        else:
            self.env = MpeEnv(
                scenario_or_env, action_mode=action_mode, max_steps=max_steps,
                dtype=dtype,
            )
        self.scenario = self.env.scenario
        self.world_spec = self.env.spec
        self.n = self.env.n_agents
        self.benchmark = benchmark
        self.discrete_action_input = (
            self.env.action_mode is ActionMode.DISCRETE_INDEX)
        self.action_space = self.env.action_spaces()
        self.observation_space = self.env.observation_spaces()
        self.shared_viewer = shared_viewer
        self._key = jax.random.PRNGKey(seed)
        self._jit_reset = jax.jit(self.env.reset)
        self._jit_step = jax.jit(self.env.step)
        self.state = None
        self.time = 0
        self._viewers = [None] * (1 if shared_viewer else self.n)
        self._render_geoms = None
        self._render_xforms = None

    # ------------------------------------------------------------------
    def seed(self, seed: int):
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def reset(self) -> list[np.ndarray]:
        self.state, obs = self._jit_reset(self._next_key())
        self.time = 0
        # drop cached render geoms (reference _reset_render, env.py:195-197)
        self._render_geoms = None
        self._render_xforms = None
        return self._split_obs(obs)

    def step(self, action_n: Sequence[Any]):
        if self.state is None:
            self.reset()
        actions = pack_actions(self.env, action_n)
        self.state, obs, reward, done, info = self._jit_step(
            self.state, actions, self._next_key()
        )
        self.time += 1
        obs_n = self._split_obs(obs)
        reward_n = [float(r) for r in np.asarray(reward)]
        done_n = [bool(d) for d in np.asarray(done)]
        info_n = {"n": self._split_info(info)}
        return obs_n, reward_n, done_n, info_n

    def _split_obs(self, obs) -> list[np.ndarray]:
        obs = np.asarray(obs)
        return [obs[i, :d] for i, d in enumerate(self.scenario.obs_dims)]

    def _split_info(self, info: dict) -> list[dict]:
        """Per-agent info dicts: leaves the scenario DECLARES per-agent
        (``Scenario.per_agent_info``) are split on their leading axis;
        everything else is global and handed to every agent whole — no
        shape heuristics (a global leaf with n_agents rows would be
        silently misattributed by one)."""
        if not self.benchmark or not info:
            return [{} for _ in range(self.n)]
        per_agent = self.scenario.per_agent_info
        host = {k: np.asarray(v) for k, v in info.items()}
        for k in per_agent & host.keys():
            assert host[k].ndim > 0 and host[k].shape[0] == self.n, (
                f"info leaf {k!r} declared per-agent but has shape "
                f"{host[k].shape} (need leading axis {self.n})")
        return [
            {k: (v[i] if k in per_agent else v) for k, v in host.items()}
            for i in range(self.n)
        ]

    # ------------------------------------------------------------------
    def render(self, mode: str = "human"):
        from mpe_tpu.render import render_env

        if self.state is None:
            self.reset()
        return render_env(self, mode)

    def close(self):
        for v in self._viewers:
            if v is not None:
                v.close()
        self._viewers = [None] * len(self._viewers)


class VecMultiAgentEnv:
    """``BatchMultiAgentEnv`` equivalent: N lockstep envs via one vmapped,
    jitted step (vs the reference's sequential Python loop over sub-envs,
    environment.py:309-322). Works directly on canonical batched arrays:
    actions [N, A, W] -> obs [N, A, O], rewards [N, A], dones [N, A]."""

    def __init__(self, env: MpeEnv, n_envs: int, seed: int = 0):
        self.env = env
        self.n_envs = n_envs
        self.n = n_envs * env.n_agents  # reference .n semantics (env.py:297-299)
        self._key = jax.random.PRNGKey(seed)
        self._reset = jax.jit(jax.vmap(env.reset))
        self._step = jax.jit(jax.vmap(env.step))
        self.states = None

    @property
    def action_space(self):
        return self.env.action_spaces()

    @property
    def observation_space(self):
        return self.env.observation_spaces()

    def _next_keys(self):
        self._key, sub = jax.random.split(self._key)
        return jax.random.split(sub, self.n_envs)

    def reset(self):
        self.states, obs = self._reset(self._next_keys())
        return obs

    def step(self, actions: jax.Array):
        if self.states is None:
            self.reset()
        self.states, obs, rew, done, info = self._step(
            self.states, actions, self._next_keys()
        )
        return obs, rew, done, info
