"""End-to-end env-API parity vs the GENUINE reference ``MultiAgentEnv``.

The real ``make_env.py`` + ``environment.py`` (reference environment.py:
9-263) run unmodified behind the test-only gym/imp stubs
(tests/_gym_stub.py), so the decode (`_set_action`, environment.py:144-192
incl. MultiDiscrete splitting), the step loop ordering (environment.py:
80-104), the shared-reward ``np.sum`` broadcast (environment.py:99-102) and
the benchmark info channel (environment.py:119-122) are all anchored to
reference code itself — not to a transcription (VERDICT r1 Missing #1).

Parity protocol (reference RNG is global np.random with no seed API): reset
the genuine env under a seed, copy its exact world state into our
functional state, then drive BOTH envs with identical reference-format
ragged actions and compare every output of every step at 1e-9.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpe_tpu import factory
from mpe_tpu.core.actions import ActionMode
from mpe_tpu.envs import spaces
from tests import _oracle as O
from tests._parity import GOAL_EXTRACTORS

ALL_SCENARIOS = [
    "simple", "simple_adversary", "simple_crypto", "simple_push",
    "simple_reference", "simple_speaker_listener", "simple_spread",
    "simple_tag", "simple_world_comm",
]


def _ragged_actions(spec, rng, mode=ActionMode.DISCRETE):
    """Reference-format actions: each agent gets only its own segments."""
    acts = []
    for i in range(spec.n_agents):
        if mode is ActionMode.DISCRETE_INDEX:
            acts.append(int(rng.randint(0, 5)))
            continue
        segs = []
        if spec.movable[i]:
            segs.append(rng.uniform(0, 1, 2 if mode is ActionMode.CONTINUOUS
                                    else 5))
        if not spec.silent[i]:
            segs.append(rng.uniform(0, 1, spec.dim_c))
        acts.append(np.concatenate(segs))
    return acts


def _make_pair(name, seed, benchmark=False, **our_kwargs):
    """-> (genuine env post-reset, our env with the genuine state injected)."""
    np.random.seed(seed)
    ref_env = O.load_ref_env(name, benchmark=benchmark)
    np.random.seed(seed + 100)
    ref_obs_n = ref_env.reset()
    ours = factory.make_env(name, benchmark=benchmark, dtype=jnp.float64,
                            **our_kwargs)
    goal_fn = GOAL_EXTRACTORS.get(name)
    goal = goal_fn(ref_env.world) if goal_fn else None
    ours.state = O.extract_state(ref_env.world, ours.world_spec, goal)
    return ref_env, ref_obs_n, ours


def _assert_step_equal(name, t, ref_out, our_out, n, atol=1e-9):
    ref_obs, ref_rew, ref_done, _ = ref_out
    obs_n, rew_n, done_n, _ = our_out
    for i in range(n):
        np.testing.assert_allclose(
            obs_n[i], np.asarray(ref_obs[i], np.float64), atol=atol,
            rtol=1e-9, err_msg=f"{name} obs agent {i} step {t}")
    np.testing.assert_allclose(
        rew_n, [float(r) for r in ref_rew], atol=atol, rtol=1e-9,
        err_msg=f"{name} reward step {t}")
    assert done_n == [bool(d) for d in ref_done], f"{name} done step {t}"


@pytest.mark.parametrize("name", ALL_SCENARIOS)
@pytest.mark.parametrize("seed", [0, 11])
def test_env_step_parity_genuine(name, seed):
    ref_env, ref_obs_n, ours = _make_pair(name, seed)
    # initial observation parity on the injected state
    our_obs0 = ours._split_obs(ours.scenario.observation(ours.state))
    for i, (o_ref, o_our) in enumerate(zip(ref_obs_n, our_obs0)):
        np.testing.assert_allclose(
            o_our, np.asarray(o_ref, np.float64), atol=1e-9, rtol=1e-9,
            err_msg=f"{name} reset obs agent {i}")

    rng = np.random.RandomState(seed + 1)
    for t in range(30):
        action_n = _ragged_actions(ours.world_spec, rng)
        ref_out = ref_env.step([np.array(a) for a in action_n])
        our_out = ours.step(action_n)
        _assert_step_equal(name, t, ref_out, our_out, ours.n)


def test_env_benchmark_info_parity_spread():
    """info_n['n'] vs the genuine benchmark_data tuple (simple_spread.py:
    47-63): (rew, collisions, min_dists, occupied_landmarks) per agent."""
    ref_env, _, ours = _make_pair("simple_spread", 3, benchmark=True)
    rng = np.random.RandomState(4)
    for t in range(10):
        action_n = _ragged_actions(ours.world_spec, rng)
        *_, ref_info = ref_env.step([np.array(a) for a in action_n])
        *_, our_info = ours.step(action_n)
        for i in range(ours.n):
            rew, col, mind, occ = ref_info["n"][i]
            d = our_info["n"][i]
            np.testing.assert_allclose(float(d["rew"]), rew, atol=1e-9)
            assert int(d["collisions"]) == int(col)
            np.testing.assert_allclose(float(d["min_dists"]), mind, atol=1e-9)
            assert int(d["occupied_landmarks"]) == int(occ)


def test_env_benchmark_info_parity_adversary():
    ref_env, _, ours = _make_pair("simple_adversary", 5, benchmark=True)
    rng = np.random.RandomState(6)
    for t in range(10):
        action_n = _ragged_actions(ours.world_spec, rng)
        *_, ref_info = ref_env.step([np.array(a) for a in action_n])
        *_, our_info = ours.step(action_n)
        for i, agent in enumerate(ref_env.world.agents):
            ref_bd = ref_info["n"][i]
            d = our_info["n"][i]
            if agent.adversary:
                np.testing.assert_allclose(
                    np.asarray(d["adversary_goal_sqdist"]), ref_bd, atol=1e-9)
            else:
                np.testing.assert_allclose(
                    np.asarray(d["dists"]), np.asarray(ref_bd), atol=1e-9)


def test_env_step_parity_discrete_index_mode():
    """discrete_action_input=True (environment.py:161-167, one-hot comm at
    :185-187) — the integer path with its swapped index convention. Only
    valid on single-segment agents (the genuine MultiDiscrete split assumes
    the default mode)."""
    ref_env, _, ours = _make_pair(
        "simple_spread", 7, action_mode=ActionMode.DISCRETE_INDEX)
    ref_env.discrete_action_input = True
    rng = np.random.RandomState(8)
    for t in range(20):
        action_n = _ragged_actions(ours.world_spec, rng,
                                   ActionMode.DISCRETE_INDEX)
        ref_out = ref_env.step(list(action_n))
        our_out = ours.step(action_n)
        _assert_step_equal("spread/index", t, ref_out, our_out, ours.n)


def test_env_step_parity_continuous_mode():
    """discrete_action_space=False (environment.py:176-177 raw Box force).
    Single-segment agents only, as the genuine Tuple-space path is broken
    (SURVEY §2.2 item 1)."""
    ref_env, _, ours = _make_pair(
        "simple_tag", 9, action_mode=ActionMode.CONTINUOUS)
    ref_env.discrete_action_space = False
    rng = np.random.RandomState(10)
    for t in range(20):
        action_n = _ragged_actions(ours.world_spec, rng,
                                   ActionMode.CONTINUOUS)
        ref_out = ref_env.step([np.array(a) for a in action_n])
        our_out = ours.step(action_n)
        _assert_step_equal("tag/continuous", t, ref_out, our_out, ours.n)


@pytest.mark.parametrize("name", ALL_SCENARIOS)
def test_space_assembly_parity_genuine(name):
    """Per-agent action/obs space structure vs the genuine assembly
    (environment.py:38-70)."""
    np.random.seed(0)
    ref_env = O.load_ref_env(name)
    ours = factory.make_env(name)
    import multiagent.multi_discrete as md

    assert len(ref_env.action_space) == ours.n
    for i, (r, s) in enumerate(zip(ref_env.action_space, ours.action_space)):
        if isinstance(r, md.MultiDiscrete):
            assert isinstance(s, spaces.MultiDiscrete), (name, i)
            np.testing.assert_array_equal(s.low, r.low)
            np.testing.assert_array_equal(s.high, r.high)
        else:  # genuine default mode only builds Discrete otherwise
            assert isinstance(s, spaces.Discrete), (name, i)
            assert s.n == r.n, (name, i)
    for i, (r, s) in enumerate(zip(ref_env.observation_space,
                                   ours.observation_space)):
        assert tuple(r.shape) == tuple(s.shape), (name, i)
