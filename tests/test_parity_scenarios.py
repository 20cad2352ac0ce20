"""Golden trajectory parity vs the reference for every remaining scenario.

Goal landmarks are chosen by the reference's seeded reset and extracted by
object identity, so both engines observe the identical goal assignment.
"""

import numpy as np
import pytest

from mpe_tpu import scenarios
from tests import _oracle as O
from tests._parity import (
    run_parity, _goal_b_both_agents, _goal_b_agent0, _goal_a_agent0,
    _crypto_goals)


@pytest.mark.parametrize("seed", [0, 7, 11, 23, 42])
def test_simple_reference_parity(seed):
    run_parity("simple_reference", scenarios.load("simple_reference"),
               n_steps=200, seed=seed, extract_goal=_goal_b_both_agents)


@pytest.mark.parametrize("seed", [0, 7, 11, 23, 42])
def test_simple_speaker_listener_parity(seed):
    run_parity("simple_speaker_listener",
               scenarios.load("simple_speaker_listener"),
               n_steps=200, seed=seed, extract_goal=_goal_b_agent0)


@pytest.mark.parametrize("seed", [0, 7, 11, 23, 42])
def test_simple_adversary_parity(seed):
    def check_benchmark(our, state, ref, world, atol):
        ours = our.benchmark_data(state)
        dists = np.asarray(ours["dists"])
        for i, agent in enumerate(world.agents):
            ref_bd = ref.benchmark_data(agent, world)
            if agent.adversary:
                np.testing.assert_allclose(
                    np.asarray(ours["adversary_goal_sqdist"]), ref_bd, atol=atol)
            else:
                np.testing.assert_allclose(dists[i], np.asarray(ref_bd), atol=atol)

    run_parity("simple_adversary", scenarios.load("simple_adversary"),
               n_steps=200, seed=seed, extract_goal=_goal_a_agent0,
               check_benchmark=check_benchmark)


@pytest.mark.parametrize("seed", [0, 7, 11, 23, 42])
def test_simple_push_parity(seed):
    run_parity("simple_push", scenarios.load("simple_push"),
               n_steps=200, seed=seed, extract_goal=_goal_a_agent0)


@pytest.mark.parametrize("seed", [0, 7, 11, 23, 42])
def test_simple_tag_parity(seed):
    def check_benchmark(our, state, ref, world, atol):
        ours = np.asarray(our.benchmark_data(state)["collisions"])
        for i, agent in enumerate(world.agents):
            assert ours[i] == ref.benchmark_data(agent, world)

    run_parity("simple_tag", scenarios.load("simple_tag"),
               n_steps=200, seed=seed, check_benchmark=check_benchmark,
               u_scale=2.0)


@pytest.mark.parametrize("seed", [0, 7, 11, 23, 42])
def test_simple_crypto_parity(seed):
    def check_benchmark(our, state, ref, world, atol):
        ours = our.benchmark_data(state)
        for i, agent in enumerate(world.agents):
            c_ref, goal_ref = ref.benchmark_data(agent, world)
            np.testing.assert_allclose(
                np.asarray(ours["comm"][i]), c_ref, atol=atol)
            np.testing.assert_allclose(
                np.asarray(ours["goal_color"]), goal_ref, atol=atol)

    run_parity("simple_crypto", scenarios.load("simple_crypto"),
               n_steps=200, seed=seed, extract_goal=_crypto_goals,
               check_benchmark=check_benchmark)


@pytest.mark.parametrize("seed", [0, 7, 11, 23, 42])
def test_simple_world_comm_parity(seed):
    def check_benchmark(our, state, ref, world, atol):
        ours = np.asarray(our.benchmark_data(state)["collisions"])
        for i, agent in enumerate(world.agents):
            assert ours[i] == ref.benchmark_data(agent, world)

    run_parity("simple_world_comm", scenarios.load("simple_world_comm"),
               n_steps=200, seed=seed, check_benchmark=check_benchmark,
               u_scale=2.0)


def test_tag_prey_bound_penalty_offscreen():
    """Drive the prey off screen so the exit penalty's three pieces all
    trigger (simple_tag.py:103-108)."""
    import jax.numpy as jnp
    from mpe_tpu.core.physics import step_world

    scn = scenarios.load("simple_tag")
    ref, world = O.load_ref_scenario("simple_tag")
    np.random.seed(2)
    ref.reset_world(world)
    state = O.extract_state(world, scn.spec)
    u = np.zeros((4, 2))
    u[3] = [1.0, 1.0]  # prey accelerates toward +x+y every step
    c = np.zeros((4, 2))
    for _ in range(40):
        O.set_ref_actions(world, u * 4.0, c)
        world.step()
        state = step_world(scn.spec, state, jnp.asarray(u * 4.0), jnp.asarray(c))
        r_ref = np.array([ref.reward(a, world) for a in world.agents])
        np.testing.assert_allclose(
            np.asarray(scn.reward(state)), r_ref, atol=1e-8)
    assert abs(world.agents[3].state.p_pos[0]) > 1.0  # actually exited
