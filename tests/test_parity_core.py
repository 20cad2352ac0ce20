"""Golden trajectory parity vs the reference for the first scenarios."""

import numpy as np
import pytest

from mpe_tpu import scenarios
from tests._parity import run_parity


@pytest.mark.parametrize("seed", [0, 7, 11, 23, 42])
def test_simple_parity(seed):
    run_parity("simple", scenarios.load("simple"), n_steps=200, seed=seed,
               u_scale=1.0)


@pytest.mark.parametrize("seed", [0, 7, 11, 23, 42])
def test_simple_spread_parity(seed):
    def check_benchmark(our, state, ref, world, atol):
        ours = {k: np.asarray(v) for k, v in our.benchmark_data(state).items()}
        for i, agent in enumerate(world.agents):
            rew, col, mind, occ = ref.benchmark_data(agent, world)
            np.testing.assert_allclose(ours["rew"][i], rew, atol=atol)
            assert ours["collisions"][i] == col
            np.testing.assert_allclose(ours["min_dists"], mind, atol=atol)
            assert ours["occupied_landmarks"] == occ

    run_parity("simple_spread", scenarios.load("simple_spread"),
               n_steps=200, seed=seed, check_benchmark=check_benchmark,
               u_scale=1.0)


def test_simple_spread_parity_long_colliding():
    # drive agents toward the origin so collisions definitely occur
    import jax.numpy as jnp
    from tests import _oracle as O
    from mpe_tpu.core.physics import step_world

    scn = scenarios.load("simple_spread")
    ref, world = O.load_ref_scenario("simple_spread")
    np.random.seed(3)
    ref.reset_world(world)
    state = O.extract_state(world, scn.spec)
    saw_collision = False
    for _ in range(60):
        # pull every agent toward the origin
        u = -np.stack([a.state.p_pos for a in world.agents]) * 2.0
        c = np.zeros((3, 2))
        O.set_ref_actions(world, u, c)
        world.step()
        state = step_world(scn.spec, state, jnp.asarray(u), jnp.asarray(c))
        O.assert_state_close(state, world, atol=1e-8)
        r_ours = np.asarray(scn.reward(state)).sum()
        r_ref = sum(ref.reward(a, world) for a in world.agents)
        np.testing.assert_allclose(r_ours, r_ref, atol=1e-8)
        d = np.stack([a.state.p_pos for a in world.agents])
        if np.linalg.norm(d[0] - d[1]) < 0.3:
            saw_collision = True
    assert saw_collision


def test_simple_spread_parity_long_horizon():
    """200-step golden parity for the benchmark scenario — long-run
    trajectory agreement (collisions compound any divergence fast)."""
    from tests._parity import run_parity

    run_parity("simple_spread", scenarios.load("simple_spread"),
               n_steps=200, seed=5, u_scale=1.5)
