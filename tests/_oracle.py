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
# reference action decode oracle (test-only reimplementation of
# environment.py:144-192 — environment.py itself needs gym, unavailable here)
# ---------------------------------------------------------------------------

def oracle_set_action(action, agent, world, sub_sizes=None,
                      discrete_action_space=True, discrete_action_input=False,
                      force_discrete_action=False):
    """Returns (u, c) for one agent given a reference-format action."""
    u = np.zeros(world.dim_p)
    c = np.zeros(world.dim_c)
    if sub_sizes is not None:  # MultiDiscrete split
        segs, idx = [], 0
        for s in sub_sizes:
            segs.append(np.asarray(action[idx:idx + s], np.float64))
            idx += s
        action = segs
    else:
        action = [action]
    if agent.movable:
        if discrete_action_input:
            if action[0] == 1: u[0] = -1.0
            if action[0] == 2: u[0] = +1.0
            if action[0] == 3: u[1] = -1.0
            if action[0] == 4: u[1] = +1.0
        else:
            a0 = np.asarray(action[0], np.float64).copy()
            if force_discrete_action:
                d = np.argmax(a0)
                a0[:] = 0.0
                a0[d] = 1.0
            if discrete_action_space:
                u[0] += a0[1] - a0[2]
                u[1] += a0[3] - a0[4]
            else:
                u = a0
        sensitivity = 5.0 if agent.accel is None else agent.accel
        u = u * sensitivity
        action = action[1:]
    if not agent.silent:
        if discrete_action_input:
            c = np.zeros(world.dim_c)
            c[int(action[0])] = 1.0
        else:
            c = np.asarray(action[0], np.float64)
        action = action[1:]
    assert len(action) == 0
    return u, c
