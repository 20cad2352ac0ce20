"""Greedy (argmax) policy evaluation with role-aware diagnostics.

The reference repo has no evaluation tooling at all (SURVEY.md §4); the
MADDPG paper's headline scenarios are *competitive*, where the aggregate
reward of a trained population is near zero by construction and the
meaningful read-outs are per-role: the adversary's distance to the goal
it cannot see (simple_adversary), the eavesdropper's reconstruction
error (simple_crypto), predator catch rate with the leader's broadcast
blinded (simple_world_comm).

This module provides the shared machinery:

  - ``build_greedy_policy``: argmax two-head (move + comm) policy over
    MADDPG actor params, with eval-time ablations — ``mute_comm`` zeroes
    the comm head (the speaker ablation), ``obs_mask`` zeroes chosen
    observation columns per agent (key ablation in crypto, leader-comm
    blinding in world_comm).
  - ``greedy_state_rollout``: an on-device rollout that stacks the FULL
    ``WorldState`` per step, so metrics can read positions/utterances/
    goals directly instead of inferring them from rewards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mpe_tpu.envs import MpeEnv
from mpe_tpu.learner.maddpg import actor_logits_i


def build_greedy_policy(env: MpeEnv, params, mute_comm: bool = False,
                        obs_mask=None):
    """Argmax policy ``pol(obs [n, A, O], key) -> actions [n, A, W]``
    (env-leading layout) over stacked-agent MADDPG actor params.

    ``obs_mask`` is an optional ``[A, O]`` 0/1 array multiplied into the
    observation before the actor — the generic eval-time information
    ablation (zeroed inputs are what the reference's obs functions emit
    for hidden entities, e.g. forest-hidden positions in
    simple_world_comm.py:231-261, so masked obs stay in-distribution).
    """
    a = env.n_agents
    mw = 2 * env.spec.dim_p + 1
    if obs_mask is not None:
        obs_mask = jnp.asarray(obs_mask, env.dtype)

    def pol(obs, key):
        del key
        if obs_mask is not None:
            obs = obs * obs_mask
        logits = jax.vmap(
            lambda o: jax.vmap(actor_logits_i)(params["actor"], o))(obs)
        move = jax.nn.one_hot(jnp.argmax(logits[..., :mw], axis=-1), mw,
                              dtype=env.dtype)
        parts = [move]
        cw = logits.shape[-1] - mw
        pad_c = env.action_width - mw
        if cw:
            comm = jax.nn.one_hot(jnp.argmax(logits[..., mw:], axis=-1),
                                  cw, dtype=env.dtype)
            if mute_comm:
                comm = jnp.zeros_like(comm)
            parts.append(comm)
        elif pad_c:
            parts.append(jnp.zeros(move.shape[:-1] + (pad_c,), env.dtype))
        return jnp.concatenate(parts, axis=-1)

    return pol


def greedy_state_rollout(scn, params, n_envs: int = 128,
                         n_steps: int = 25, seed: int = 123,
                         mute_comm: bool = False, obs_mask=None):
    """Roll the argmax policy (uniform-random actions when ``params`` is
    None) and return ``(states, rew)`` where every ``states`` leaf is
    stacked over time — ``pos [T, n, E, P]``, ``comm [T, n, A, C]``,
    ``goal [T, n, G]`` — and ``rew`` is ``[T, n, A]``."""
    from mpe_tpu.parallel.mesh import _uniform_actions

    env = MpeEnv(scn)
    if params is not None:
        pol = build_greedy_policy(env, params, mute_comm=mute_comm,
                                  obs_mask=obs_mask)
    v_reset = jax.vmap(env.reset)
    v_step = jax.vmap(env.step)

    @jax.jit
    def run(key):
        kr, ks = jax.random.split(key)
        states, obs = v_reset(jax.random.split(kr, n_envs))

        def body(carry, k):
            states, obs = carry
            ka, kstep = jax.random.split(k)
            if params is None:
                actions = _uniform_actions(env, ka, n_envs)
            else:
                actions = pol(obs, ka)
            states, obs, rew, done, _ = v_step(
                states, actions, jax.random.split(kstep, n_envs))
            return (states, obs), (states, rew)

        _, (traj, rew) = jax.lax.scan(body, (states, obs),
                                      jax.random.split(ks, n_steps))
        return traj, rew

    traj, rew = run(jax.random.PRNGKey(seed))
    return jax.tree.map(np.asarray, traj), np.asarray(rew)
