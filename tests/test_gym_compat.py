"""Optional gymnasium interop shim (envs/gym_compat.py): the modern-gym
drop-in the reference only gestured at (its MultiAgentEnv subclasses
gym.Env at environment.py:9, and its two registered ids point at a
nonexistent module, multiagent/__init__.py:9-21 — both work here)."""

import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

from mpe_tpu.envs.gym_compat import (GymnasiumMultiAgentEnv,
                                     register_gymnasium)


def test_env_api_roundtrip():
    env = GymnasiumMultiAgentEnv("simple_spread")
    assert isinstance(env, gymnasium.Env)
    obs_n, info = env.reset(seed=0)
    assert len(obs_n) == 3 and obs_n[0].shape == (18,)
    assert env.observation_space.contains(obs_n)
    act = tuple(np.eye(5, dtype=np.float32)[1] for _ in range(3))
    obs_n, rew_n, term, trunc, info = env.step(act)
    assert len(rew_n) == 3 and not term and not trunc
    # shared reward (collaborative scenario)
    assert rew_n[0] == rew_n[1] == rew_n[2]
    # determinism through the gymnasium seeding path
    env2 = GymnasiumMultiAgentEnv("simple_spread")
    obs2_n, _ = env2.reset(seed=0)
    for a, b in zip(obs_n, env2.step(act)[0]):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_register_and_make_with_time_limit():
    ids = register_gymnasium()
    assert "mpe_tpu/simple_tag-v0" in ids
    assert "mpe_tpu/MultiagentSimple-v0" in ids     # legacy reference id
    env = gymnasium.make("mpe_tpu/simple-v0")
    obs_n, _ = env.reset(seed=1)
    trunc = False
    for _ in range(100):                             # horizon 100
        *_, term, trunc, _ = env.step(env.action_space.sample())
        if trunc:
            break
    assert trunc and not term
    # idempotent re-registration
    assert register_gymnasium() == ids


def test_space_conversion_multidiscrete():
    register_gymnasium()
    env = gymnasium.make("mpe_tpu/simple_reference-v0")
    sp = env.action_space.spaces[0]
    # both agents move AND speak -> reference MultiDiscrete [[0,4],[0,9]]
    assert isinstance(sp, gymnasium.spaces.MultiDiscrete)
    assert list(sp.nvec) == [5, 10]
