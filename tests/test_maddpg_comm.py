"""MADDPG comm-head mechanics: on scenarios with speaking agents the
actor grows a factorized (move, comm) head pair; silent/immobile roles
are handled by the decoder's masking (core/actions.py:94-95), so one
uniform two-head actor serves heterogeneous agents (the paper's
speaker-listener setup). Convergence is exercised on hardware via
examples/train.py; here we pin the widths, the sampled action format,
and that the comm columns actually receive gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpe_tpu import scenarios
from mpe_tpu.envs import MpeEnv

pytest.importorskip("optax")

from mpe_tpu.learner.maddpg import (  # noqa: E402
    build_maddpg, init_buffer, init_maddpg, maddpg_act_dim)


def test_act_dim_widths():
    """Move-only on all-silent scenarios; move+dim_c when anyone speaks."""
    for name, want in (("simple_spread", 5), ("simple_tag", 5),
                       ("simple_speaker_listener", 5 + 3),
                       ("simple_reference", 5 + 10),
                       ("simple_world_comm", 5 + 4)):
        env = MpeEnv(scenarios.load(name), max_steps=25, auto_reset=True)
        assert maddpg_act_dim(env) == want, name


def _setup(name, n_envs=8, batch=16):
    scn = scenarios.load(name)
    env = MpeEnv(scn, max_steps=25, auto_reset=True)
    aw = maddpg_act_dim(env)
    params = init_maddpg(jax.random.PRNGKey(0), scn.obs_width, aw,
                         env.n_agents, hidden=16)
    targets = jax.tree.map(lambda x: x, params)
    fns = build_maddpg(env, n_envs=n_envs, capacity=n_envs * 50,
                       batch=batch)
    buffer = init_buffer(n_envs * 50, env.n_agents, scn.obs_width, aw)
    return env, aw, params, targets, fns, buffer


def test_comm_actions_are_two_onehots():
    """Collected speaker_listener actions are a valid move one-hot next
    to a valid comm one-hot for every agent and env."""
    env, aw, params, targets, fns, buffer = _setup(
        "simple_speaker_listener")
    reset_fn, collect_fn, _, _ = fns
    key = jax.random.PRNGKey(1)
    states, obs = reset_fn(key)
    for i in range(3):
        states, obs, buffer, _ = collect_fn(
            params, states, obs, buffer, jax.random.fold_in(key, i))
    rows = np.asarray(buffer.act[: int(buffer.size)])    # [rows, A, 8]
    move, comm = rows[..., :5], rows[..., 5:]
    for part in (move, comm):
        assert np.allclose(part.sum(-1), 1.0, atol=1e-6)
        assert np.allclose(part.max(-1), 1.0, atol=1e-6)
        assert part.min() >= 0.0


def test_comm_head_receives_gradient():
    """After one update on speaker_listener, the SPEAKER's comm output
    columns moved (the expected-Q objective reaches the comm head) —
    and on an all-silent scenario the actor stays move-only width."""
    env, aw, params, targets, fns, buffer = _setup(
        "simple_speaker_listener")
    reset_fn, collect_fn, update_fn, init_opt = fns
    opt_states = init_opt(params)
    key = jax.random.PRNGKey(2)
    states, obs = reset_fn(key)
    for i in range(5):
        states, obs, buffer, _ = collect_fn(
            params, states, obs, buffer, jax.random.fold_in(key, i))
    before = np.asarray(params["actor"]["out"]["w"])     # [A, H, 8]
    params2, *_ = update_fn(params, targets, opt_states, buffer,
                            jax.random.fold_in(key, 99), True)
    after = np.asarray(params2["actor"]["out"]["w"])
    speaker_comm_delta = np.abs(after[0, :, 5:] - before[0, :, 5:]).max()
    assert speaker_comm_delta > 0.0

    env_s = MpeEnv(scenarios.load("simple_spread"), max_steps=25,
                   auto_reset=True)
    assert maddpg_act_dim(env_s) == 5
