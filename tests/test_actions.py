"""Action decoding parity for all three modes (environment.py:144-192)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpe_tpu import scenarios
from mpe_tpu.core.actions import ActionMode, decode_actions
from mpe_tpu.envs.functional import MpeEnv
from mpe_tpu.envs.wrappers import pack_actions
from mpe_tpu.envs import spaces
from tests import _oracle as O


def _ref_world(name):
    ref, world = O.load_ref_scenario(name)
    np.random.seed(0)
    ref.reset_world(world)
    return world


def _ref_decode_all(env, world, action_n, **kw):
    """Decode via the GENUINE environment.py _set_action (tests/_oracle.py
    drives the real class behind the gym stub; ``env`` kept for signature
    compatibility, spaces come from the genuine assembly)."""
    del env
    return O.genuine_decode(O.genuine_env_over(world, **kw), action_n)


@pytest.mark.parametrize("name", ["simple", "simple_spread"])
def test_discrete_onehot_decode(name):
    scn = scenarios.load(name)
    env = MpeEnv(scn, dtype=jnp.float64)
    world = _ref_world(name)
    rng = np.random.RandomState(1)
    for _ in range(5):
        # reference format: each agent gets only its own segments
        action_n = []
        for i in range(scn.spec.n_agents):
            w = 5 if scn.spec.silent[i] else 5 + scn.spec.dim_c
            action_n.append(rng.uniform(0, 1, w))
        canonical = pack_actions(env, action_n)
        u, c = decode_actions(scn.spec, canonical, ActionMode.DISCRETE, jnp.float64)
        u_ref, c_ref = _ref_decode_all(env, world, action_n)
        np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-12)
        np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-12)


def test_continuous_decode():
    scn = scenarios.load("simple_spread")
    env = MpeEnv(scn, action_mode=ActionMode.CONTINUOUS, dtype=jnp.float64)
    world = _ref_world("simple_spread")
    rng = np.random.RandomState(2)
    action_n = [rng.uniform(-1, 1, 2) for _ in range(3)]
    canonical = pack_actions(env, action_n)
    u, c = decode_actions(scn.spec, canonical, ActionMode.CONTINUOUS, jnp.float64)
    u_ref, c_ref = _ref_decode_all(env, world, action_n,
                                   discrete_action_space=False)
    np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-12)


def test_discrete_index_decode():
    scn = scenarios.load("simple_spread")
    env = MpeEnv(scn, action_mode=ActionMode.DISCRETE_INDEX, dtype=jnp.float64)
    world = _ref_world("simple_spread")
    for move in range(5):
        action_n = [move, (move + 1) % 5, 0]
        canonical = pack_actions(env, action_n)
        u, c = decode_actions(scn.spec, canonical, ActionMode.DISCRETE_INDEX,
                              jnp.float64)
        u_ref, c_ref = _ref_decode_all(env, world, action_n,
                                       discrete_action_input=True)
        np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-12)
        np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-12)


def test_force_discrete_action_quantizes():
    import dataclasses
    scn = scenarios.load("simple")
    spec = dataclasses.replace(scn.spec, force_discrete_action=True)
    act = jnp.asarray([[0.1, 0.9, 0.2, 0.3, 0.1]], jnp.float64)
    u, _ = decode_actions(spec, act, ActionMode.DISCRETE, jnp.float64)
    np.testing.assert_allclose(np.asarray(u), [[5.0, 0.0]])  # argmax=1 -> +x * 5


def test_accel_sensitivity_scaling():
    # simple_tag adversaries accel 3.0, prey 4.0 (simple_tag.py:23)
    scn = scenarios.load("simple_tag")
    onehot = np.zeros((4, 5 + 2))
    onehot[:, 1] = 1.0  # +x
    u, _ = decode_actions(scn.spec, jnp.asarray(onehot), ActionMode.DISCRETE,
                          jnp.float64)
    np.testing.assert_allclose(np.asarray(u[:, 0]), [3.0, 3.0, 3.0, 4.0])


def test_space_construction_matches_reference_shapes():
    # per-scenario action space kinds (environment.py:38-66)
    env = MpeEnv(scenarios.load("simple_spread"))
    assert all(isinstance(s, spaces.Discrete) and s.n == 5
               for s in env.action_spaces())
    env = MpeEnv(scenarios.load("simple"))
    [s] = env.action_spaces()
    assert isinstance(s, spaces.Discrete) and s.n == 5
    obs_space = env.observation_spaces()
    assert obs_space[0].shape == (4,)


@pytest.mark.parametrize("seed", range(6))
def test_decode_fuzz_random_configs(seed):
    """Decode parity vs the reference oracle across random agent configs
    (movable/silent mixes, heterogeneous accels, random dim_c) in every
    mode — covers the spec space beyond the 9 fixed scenarios."""
    from mpe_tpu.core.state import make_spec

    rng = np.random.default_rng(seed)
    a = int(rng.integers(1, 5))
    dim_c = int(rng.integers(0, 6))
    movable = [bool(rng.random() < 0.8) for _ in range(a)]
    silent = [dim_c == 0 or bool(rng.random() < 0.5) for _ in range(a)]
    for i in range(a):
        if not movable[i] and silent[i]:
            movable[i] = True   # every agent needs >= 1 action segment
    accel = [float(rng.uniform(1, 6)) if rng.random() < 0.7 else None
             for _ in range(a)]
    spec = make_spec(f"fz{seed}", n_agents=a, n_landmarks=1,
                     agent_movable=movable, agent_silent=silent,
                     agent_accel=accel, dim_c=dim_c)

    # reference-side world with matching agent attrs
    O._ensure_ref_package()
    import multiagent.core as core

    world = core.World()
    world.dim_c = dim_c
    world.agents = []
    for i in range(a):
        ag = core.Agent()
        ag.movable = movable[i]
        ag.silent = bool(spec.silent[i])
        ag.accel = accel[i]
        world.agents.append(ag)
    world.landmarks = []

    class _Scn:
        pass

    scn = _Scn()
    scn.spec = spec
    scn.obs_dims = tuple([4] * a)
    env = MpeEnv(scn)
    canonical = jnp.asarray(
        rng.uniform(0, 1, (a, env.action_width)), jnp.float64)
    u, c = decode_actions(spec, canonical, ActionMode.DISCRETE, jnp.float64)
    flats = []
    for i in range(a):
        segs = []
        if movable[i]:
            segs.append(np.asarray(canonical[i, :5]))
        if not spec.silent[i]:
            segs.append(np.asarray(canonical[i, 5:5 + dim_c]))
        flats.append(np.concatenate(segs))
    u_ref, c_ref = O.genuine_decode(O.genuine_env_over(world), flats)
    np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-12)
