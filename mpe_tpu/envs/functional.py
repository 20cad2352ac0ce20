"""Pure-functional multi-agent environment core.

The TPU-native replacement for the reference's stateful ``MultiAgentEnv``
(reference multiagent/environment.py:9-263). Step ordering matches
environment.py:80-104 exactly: decode all actions -> one ``world.step()``
-> per-agent obs/reward/done/info -> collaborative shared-reward broadcast
(``np.sum(reward_n)`` to every agent, environment.py:99-102).

Differences by design (TPU-first):
  - ``reset``/``step`` are pure functions of ``(state, action, key)`` —
    jit once, ``vmap`` over an env axis, shard over a device mesh.
  - Episode termination/auto-reset exist here (``max_steps`` horizon +
    ``lax``-select auto-reset fully on device); the reference never wires
    ``done_callback`` (make_env.py:41-43) so ``max_steps=None`` reproduces
    its never-done behavior.
  - RNG is explicit (JAX keys) instead of the global ``np.random``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from mpe_tpu.core.actions import ActionMode, action_width, decode_actions
from mpe_tpu.core.physics import step_world
from mpe_tpu.core.state import WorldState
from mpe_tpu.envs import spaces
from mpe_tpu.scenarios._base import Scenario


class MpeEnv:
    """Functional env for one scenario. All methods are pure and traceable.

    Canonical batched action format (see core/actions.py): one padded row
    per agent — ``[A, 5+C]`` one-hots for DISCRETE, ``[A, P+C]`` for
    CONTINUOUS, ``[A, 2]`` ints for DISCRETE_INDEX.
    """

    def __init__(
        self,
        scenario: Scenario,
        action_mode: ActionMode = ActionMode.DISCRETE,
        max_steps: int | None = None,
        auto_reset: bool = False,
        dtype=jnp.float32,
    ):
        self.scenario = scenario
        self.spec = scenario.spec
        self.action_mode = action_mode
        self.max_steps = max_steps
        self.auto_reset = auto_reset and max_steps is not None
        self.dtype = dtype
        self.n_agents = self.spec.n_agents
        self.action_width = action_width(self.spec, action_mode)

    # ------------------------------------------------------------------
    def reset(self, key: jax.Array) -> tuple[WorldState, jax.Array]:
        state = self.scenario.reset(key, self.dtype)
        return state, self.scenario.observation(state)

    def step(
        self,
        state: WorldState,
        actions: jax.Array,
        key: jax.Array | None = None,
    ) -> tuple[WorldState, jax.Array, jax.Array, jax.Array, dict[str, Any]]:
        """-> (state, obs [A,W], reward [A], done [A] bool, info dict)."""
        spec, scn = self.spec, self.scenario
        assert actions.shape == (self.n_agents, self.action_width), (
            f"actions must be [{self.n_agents}, {self.action_width}] "
            f"(canonical {self.action_mode.value} layout; add leading axes "
            f"via vmap), got {actions.shape}")
        if self.auto_reset or spec.u_noise.any() or spec.c_noise.any():
            assert key is not None, "this env config consumes a key per step"
        knoise = kreset = None
        if key is not None:
            knoise, kreset = jax.random.split(key)

        with jax.named_scope("mpe/decode"):
            u, c = decode_actions(spec, actions, self.action_mode, self.dtype)
        scripted = scn.scripted_action(state)
        if scripted is not None:
            # scripted-agent path (reference core.py:117-120: scripted
            # agents get their action from action_callback, not the
            # policy; the mask comes from the scenario hook)
            mask, u_s, c_s = scripted
            m = jnp.asarray(mask, bool)[:, None]
            u = jnp.where(m, u_s.astype(u.dtype), u)
            if spec.dim_c:
                c = jnp.where(m, c_s.astype(c.dtype), c)
        with jax.named_scope("mpe/physics"):
            state = step_world(spec, state, u, c, knoise)

        with jax.named_scope("mpe/observe"):
            obs = scn.observation(state)
        with jax.named_scope("mpe/reward"):
            reward = scn.reward(state)
            if spec.collaborative:
                reward = jnp.full_like(reward, jnp.sum(reward))
        done = scn.done(state)
        if self.max_steps is not None:
            done = done | (state.t >= self.max_steps)
        info = scn.benchmark_data(state) or {}

        if self.auto_reset:
            with jax.named_scope("mpe/auto_reset"):
                fresh = scn.reset(kreset, self.dtype)
                fresh_obs = scn.observation(fresh)
                ep_done = jnp.all(done)
                state = jax.tree.map(
                    lambda n, o: jnp.where(
                        jnp.reshape(ep_done, (1,) * n.ndim), n, o),
                    fresh, state)
                obs = jnp.where(ep_done, fresh_obs, obs)
        return state, obs, reward, done, info

    # ------------------------------------------------------------------
    # space descriptors, assembled exactly like environment.py:38-70
    def action_spaces(self) -> list[spaces.Space]:
        out: list[spaces.Space] = []
        spec = self.spec
        discrete = self.action_mode is not ActionMode.CONTINUOUS
        for i in range(spec.n_agents):
            total: list[spaces.Space] = []
            if spec.movable[i]:
                total.append(
                    spaces.Discrete(spec.dim_p * 2 + 1)
                    if discrete
                    else spaces.Box(-float(spec.u_range[i]),
                                    float(spec.u_range[i]), (spec.dim_p,))
                )
            if not spec.silent[i]:
                total.append(
                    spaces.Discrete(spec.dim_c)
                    if discrete
                    else spaces.Box(0.0, 1.0, (spec.dim_c,))
                )
            if len(total) > 1:
                if all(isinstance(s, spaces.Discrete) for s in total):
                    out.append(spaces.MultiDiscrete.of([(0, s.n - 1) for s in total]))
                else:
                    out.append(spaces.Tuple(tuple(total)))
            else:
                out.append(total[0])
        return out

    def observation_spaces(self) -> list[spaces.Box]:
        return [
            spaces.Box(-jnp.inf, jnp.inf, (d,)) for d in self.scenario.obs_dims
        ]
