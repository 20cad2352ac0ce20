"""Shared golden-parity trajectory driver.

For each scenario: reset the reference world under seeded np.random,
extract its exact state into a WorldState, then step BOTH engines for N
steps with identical injected decoded actions (the reference's randomness
is global np.random with no seed API — SURVEY.md §2.2 item 7 — so parity
is defined as: same initial state + same actions => same trajectory,
rewards, observations). Compared at float64, atol 1e-9.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mpe_tpu.core.physics import step_world
from tests import _oracle as O


# ---------------------------------------------------------------------------
# per-scenario goal extraction (reference stores goals as object references
# on agents; our WorldState carries them as landmark indices)
# ---------------------------------------------------------------------------

def _goal_b_both_agents(world):
    return np.array(
        [O.landmark_index(world, world.agents[0].goal_b),
         O.landmark_index(world, world.agents[1].goal_b)], np.int32)


def _goal_b_agent0(world):
    return np.array([O.landmark_index(world, world.agents[0].goal_b)], np.int32)


def _goal_a_agent0(world):
    return np.array([O.landmark_index(world, world.agents[0].goal_a)], np.int32)


def _crypto_goals(world):
    goal = O.landmark_index(world, world.agents[0].goal_a)
    key = next(
        i for i, l in enumerate(world.landmarks)
        if np.array_equal(l.color, world.agents[2].key)
    )
    return np.array([goal, key], np.int32)


GOAL_EXTRACTORS = {
    "simple_reference": _goal_b_both_agents,
    "simple_speaker_listener": _goal_b_agent0,
    "simple_adversary": _goal_a_agent0,
    "simple_push": _goal_a_agent0,
    "simple_crypto": _crypto_goals,
}


def run_parity(
    name: str,
    our_scn,
    n_steps: int = 25,
    seed: int = 0,
    extract_goal=None,
    check_benchmark=None,
    atol: float = 1e-9,
    u_scale: float = 1.0,
):
    ref_scn, world = O.load_ref_scenario(name)
    np.random.seed(seed)
    ref_scn.reset_world(world)
    spec = our_scn.spec

    # static table parity
    assert spec.n_agents == len(world.agents)
    assert spec.n_entities == len(world.entities)
    assert spec.dim_c == world.dim_c
    for i, e in enumerate(world.entities):
        assert spec.movable[i] == e.movable, (name, i)
        assert spec.collide[i] == e.collide, (name, i)
        assert spec.size[i] == e.size, (name, i)
    for i, a in enumerate(world.agents):
        assert spec.silent[i] == a.silent
        exp_ms = np.inf if a.max_speed is None else a.max_speed
        assert spec.max_speed[i] == exp_ms
        exp_acc = 5.0 if a.accel is None else a.accel
        assert spec.accel[i] == exp_acc
    assert spec.collaborative == getattr(world, "collaborative", False)

    goal = extract_goal(world) if extract_goal else None
    state = O.extract_state(world, spec, goal)

    def check(step_i):
        O.assert_state_close(state, world, atol)
        ours_r = np.asarray(our_scn.reward(state))
        if spec.collaborative:
            ours_r = np.full_like(ours_r, ours_r.sum())
        np.testing.assert_allclose(
            ours_r, O.ref_rewards(ref_scn, world), atol=atol, rtol=1e-9,
            err_msg=f"{name} reward mismatch at step {step_i}")
        O.assert_obs_close(
            our_scn.observation(state), our_scn.obs_dims,
            O.ref_obs(ref_scn, world), atol)
        if check_benchmark is not None:
            check_benchmark(our_scn, state, ref_scn, world, atol)

    # initial observation parity (reward at t=0 too — it's a pure fn of state)
    check(-1)

    rng = np.random.RandomState(seed + 1)
    a, dc = spec.n_agents, spec.dim_c
    for step_i in range(n_steps):
        u = rng.uniform(-1.0, 1.0, (a, 2)) * u_scale
        c = rng.uniform(0.0, 1.0, (a, dc))
        # zero u for non-movable agents on the ref side the way decode would
        u_ref = u * spec.movable[:a, None]
        O.set_ref_actions(world, u_ref, c)
        world.step()
        state = step_world(spec, state, jnp.asarray(u_ref), jnp.asarray(c))
        check(step_i)
    return state, world
