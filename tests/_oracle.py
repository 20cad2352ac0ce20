"""Golden-parity oracle: loads the ORIGINAL reference implementation from
/root/reference at test time (read-only import, not vendored code) and
provides helpers to sync state between a reference ``World`` (list of
mutable objects) and our ``WorldState`` (struct of arrays).

The reference package ``__init__`` imports gym and blocks on input()
(multiagent/__init__.py:23-32), so we install a stub package pointing at
the reference directory and import ``multiagent.core`` / scenario files
directly.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import jax.numpy as jnp
import numpy as np

from mpe_tpu.core.state import ScenarioSpec, WorldState

REF_DIR = "/root/reference/multiagent"


def _load_module(fullname: str, path: str):
    spec = importlib.util.spec_from_file_location(fullname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


def _ensure_ref_package():
    if "multiagent" not in sys.modules:
        pkg = types.ModuleType("multiagent")
        pkg.__path__ = [REF_DIR]
        sys.modules["multiagent"] = pkg
        _load_module("multiagent.core", f"{REF_DIR}/core.py")
        _load_module("multiagent.scenario", f"{REF_DIR}/scenario.py")


def load_ref_scenario(name: str):
    """-> (scenario_instance, world) built by the reference make_world."""
    _ensure_ref_package()
    mod = _load_module(f"ref_scenarios.{name}", f"{REF_DIR}/scenarios/{name}.py")
    scn = mod.Scenario()
    world = scn.make_world()
    return scn, world


def load_ref_env(name: str, benchmark: bool = False):
    """Build the GENUINE reference env end-to-end: the real ``make_env.py``
    driving the real ``MultiAgentEnv`` (environment.py:9-263) behind the
    test-only gym/imp stubs (tests/_gym_stub.py). All decode/step/reward
    logic exercised is the reference's own code.

    -> the genuine MultiAgentEnv instance.
    """
    from tests import _gym_stub

    _gym_stub.install()
    _ensure_ref_package()
    if "multiagent.environment" not in sys.modules:
        _load_module("multiagent.multi_discrete", f"{REF_DIR}/multi_discrete.py")
        _load_module("multiagent.environment", f"{REF_DIR}/environment.py")
        _load_module("multiagent.scenarios", f"{REF_DIR}/scenarios/__init__.py")
    mk = _load_module("ref_make_env", "/root/reference/make_env.py")
    return mk.make_env(name, benchmark=benchmark)


def ref_env_class():
    """The genuine ``MultiAgentEnv`` class (for ad-hoc construction)."""
    from tests import _gym_stub

    _gym_stub.install()
    _ensure_ref_package()
    if "multiagent.environment" not in sys.modules:
        _load_module("multiagent.multi_discrete", f"{REF_DIR}/multi_discrete.py")
        _load_module("multiagent.environment", f"{REF_DIR}/environment.py")
        _load_module("multiagent.scenarios", f"{REF_DIR}/scenarios/__init__.py")
    return sys.modules["multiagent.environment"].MultiAgentEnv


# ---------------------------------------------------------------------------
# state sync
# ---------------------------------------------------------------------------

def extract_state(world, spec: ScenarioSpec, goal: np.ndarray | None = None) -> WorldState:
    """Read a reference World's dynamic state into a float64 WorldState."""
    pos = np.stack([np.asarray(e.state.p_pos, np.float64) for e in world.entities])
    vel = np.stack([np.asarray(e.state.p_vel, np.float64) for e in world.entities])
    comm = np.zeros((spec.n_agents, spec.dim_c), np.float64)
    for i, a in enumerate(world.agents):
        if a.state.c is not None:
            comm[i] = np.asarray(a.state.c, np.float64)
    if goal is None:
        goal = np.zeros((spec.n_goals,), np.int32)
    return WorldState(
        pos=jnp.asarray(pos),
        vel=jnp.asarray(vel),
        comm=jnp.asarray(comm),
        goal=jnp.asarray(goal, jnp.int32),
        t=jnp.zeros((), jnp.int32),
    )


def landmark_index(world, landmark) -> int:
    """Index of a landmark object within world.landmarks (identity)."""
    for i, l in enumerate(world.landmarks):
        if l is landmark:
            return i
    raise ValueError("landmark not found")


def set_ref_actions(world, u: np.ndarray, c: np.ndarray):
    """Inject decoded forces/comm directly into reference Action structs."""
    for i, agent in enumerate(world.agents):
        agent.action.u = np.asarray(u[i], np.float64).copy()
        agent.action.c = np.asarray(c[i], np.float64).copy()


def ref_rewards(scn, world) -> np.ndarray:
    rew = np.array([scn.reward(a, world) for a in world.agents], np.float64)
    if getattr(world, "collaborative", False):
        rew = np.full_like(rew, np.sum(rew))  # environment.py:99-102
    return rew


def ref_obs(scn, world) -> list[np.ndarray]:
    return [np.asarray(scn.observation(a, world), np.float64) for a in world.agents]


def assert_state_close(state: WorldState, world, atol=1e-9):
    pos = np.stack([e.state.p_pos for e in world.entities])
    vel = np.stack([e.state.p_vel for e in world.entities])
    np.testing.assert_allclose(np.asarray(state.pos), pos, atol=atol, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(state.vel), vel, atol=atol, rtol=1e-9)
    for i, a in enumerate(world.agents):
        if a.state.c is not None and np.size(a.state.c):
            np.testing.assert_allclose(
                np.asarray(state.comm[i]), a.state.c, atol=atol, rtol=1e-9
            )


def assert_obs_close(obs_padded, obs_dims, ref_obs_list, atol=1e-9):
    obs = np.asarray(obs_padded)
    for i, (d, ref) in enumerate(zip(obs_dims, ref_obs_list)):
        assert d == len(ref), f"agent {i}: obs dim {d} != reference {len(ref)}"
        np.testing.assert_allclose(obs[i, :d], ref, atol=atol, rtol=1e-9)
        np.testing.assert_array_equal(obs[i, d:], 0.0)


# ---------------------------------------------------------------------------
# genuine-code action decode (replaces the former transcribed oracle: the
# reference's own _set_action, environment.py:144-192, via ref_env_class)
# ---------------------------------------------------------------------------

def genuine_env_over(world, discrete_action_space=True,
                     discrete_action_input=False, force_discrete_action=False):
    """Genuine ``MultiAgentEnv`` over an existing world, obs stubbed.

    Spaces are assembled by the genuine environment.py:38-70 (under the
    default discrete flags); the mode flags are then overridden for the
    decode path. Note the reference itself only supports non-default modes
    on single-segment agents (its MultiDiscrete split and Tuple handling
    assume the default mode), so callers restrict accordingly.
    """
    cls = ref_env_class()
    env = cls(world, observation_callback=lambda a, w: np.zeros(1))
    env.discrete_action_space = discrete_action_space
    env.discrete_action_input = discrete_action_input
    env.force_discrete_action = force_discrete_action
    return env


def genuine_decode(env, action_n):
    """Run the GENUINE ``_set_action`` (environment.py:144-192) per agent;
    -> (u [A,2], c [A,dim_c]) float64 arrays read back from Action structs."""
    world = env.world
    us, cs = [], []
    for i, agent in enumerate(env.agents):
        act = action_n[i]
        if not isinstance(act, (int, np.integer)):
            act = np.asarray(act, np.float64)
        env._set_action(act, agent, env.action_space[i])
        us.append(np.array(agent.action.u, np.float64)
                  if agent.movable else np.zeros(world.dim_p))
        cs.append(np.array(agent.action.c, np.float64)
                  if not agent.silent else np.zeros(world.dim_c))
    return np.stack(us), np.stack(cs)
