"""Reference-noise parity: u_noise / c_noise with IDENTICAL injected normals.

No built-in scenario enables noise, so this is the least-exercised reference
semantic (VERDICT r1 Missing #3). The reference draws global-``np.random``
normals in a fixed order inside ``World.step``:

  - per movable agent with truthy ``u_noise``: ``randn(dim_p) * u_noise``
    added to the action force (core.py:134-140),
  - per NON-silent agent with truthy ``c_noise``: ``randn(dim_c) * c_noise``
    added to the comm state (core.py:171-177; silent agents draw nothing).

Protocol: seed global np.random before the reference ``world.step()``;
reproduce the exact same draw sequence with a same-seeded RandomState and
feed ``u + noise_u`` / ``c + noise_c`` into our ``step_world`` (key=None),
which is algebraically identical to the reference's in-step application.
Also asserts our key-driven path *gates* exactly like the reference
(noise-free agents stay bit-identical).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpe_tpu.core.physics import step_world
from mpe_tpu.core.state import make_spec
from tests import _oracle as O


def _noisy_pair(u_noise, c_noise, dim_c=3):
    """Matching (spec, reference world): 3 agents — noisy movable talker,
    noise-free mover, non-movable noisy talker — plus a colliding landmark."""
    movable = [True, True, False]
    silent = [False, True, False]
    spec = make_spec(
        "noisy", n_agents=3, n_landmarks=1,
        agent_movable=movable, agent_silent=silent,
        agent_u_noise=[u_noise, None, u_noise],
        agent_c_noise=[c_noise, None, c_noise],
        landmark_collide=True, dim_c=dim_c)

    O._ensure_ref_package()
    import multiagent.core as core

    world = core.World()
    world.dim_c = dim_c
    world.agents = []
    for i in range(3):
        ag = core.Agent()
        ag.movable = movable[i]
        ag.silent = silent[i]
        ag.u_noise = u_noise if i != 1 else None
        ag.c_noise = c_noise if i != 1 else None
        world.agents.append(ag)
    lm = core.Landmark()
    lm.collide = True
    world.landmarks = [lm]
    rng = np.random.RandomState(99)
    for e in world.entities:
        e.state.p_pos = rng.uniform(-1, 1, 2)
        e.state.p_vel = rng.uniform(-0.5, 0.5, 2) * (1.0 if e.movable else 0.0)
    for ag in world.agents:
        ag.state.c = np.zeros(dim_c)
    return spec, world


def _expected_draws(seed, world, dim_c):
    """Replicate the reference's global-np.random draw order for one step."""
    rs = np.random.RandomState(seed)
    nu = np.zeros((len(world.agents), 2))
    nc = np.zeros((len(world.agents), dim_c))
    # apply_action_force loop (core.py:136-140): movable agents, in order
    for i, ag in enumerate(world.agents):
        if ag.movable and ag.u_noise:
            nu[i] = rs.randn(2) * ag.u_noise
    # update_agent_state loop (core.py:130-131 -> 171-177): non-silent only
    for i, ag in enumerate(world.agents):
        if not ag.silent and ag.c_noise:
            nc[i] = rs.randn(dim_c) * ag.c_noise
    return nu, nc


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_noise_parity_injected_normals(seed):
    u_noise, c_noise = 0.3, 0.7
    spec, world = _noisy_pair(u_noise, c_noise)
    state = O.extract_state(world, spec)

    rng = np.random.RandomState(seed + 50)
    for t in range(20):
        u = rng.uniform(-1, 1, (3, 2)) * np.array(
            [[1.0], [1.0], [0.0]])  # decode zeroes u for non-movable
        c = rng.uniform(0, 1, (3, 3))
        O.set_ref_actions(world, u, c)
        np.random.seed(seed * 1000 + t)
        world.step()
        nu, nc = _expected_draws(seed * 1000 + t, world, 3)
        state = step_world(spec, state, jnp.asarray(u + nu), jnp.asarray(c + nc))
        O.assert_state_close(state, world, atol=1e-9)


def test_noise_gating_matches_reference():
    """Key-driven path: agents with zero/unset noise must evolve
    bit-identically to a no-key step; noisy movable agents must differ."""
    spec, world = _noisy_pair(0.5, 0.5)
    state = O.extract_state(world, spec)
    u = jnp.asarray(np.full((3, 2), 0.2))
    c = jnp.asarray(np.full((3, 3), 0.4))
    out_nokey = step_world(spec, state, u, c)
    out_key = step_world(spec, state, u, c, key=jax.random.PRNGKey(7))
    nk_vel, k_vel = np.asarray(out_nokey.vel), np.asarray(out_key.vel)
    assert not np.allclose(nk_vel[0], k_vel[0])        # noisy mover perturbed
    np.testing.assert_array_equal(nk_vel[3], k_vel[3])  # landmark unaffected
    nk_c, k_c = np.asarray(out_nokey.comm), np.asarray(out_key.comm)
    assert not np.allclose(nk_c[0], k_c[0])            # noisy talker perturbed
    np.testing.assert_array_equal(nk_c[1], k_c[1])     # silent agent: zeros
    assert not np.allclose(nk_c[2], k_c[2])            # non-movable talker

    # agent 1 (no noise): dynamics must be bit-identical given the same
    # state — but collisions couple entities, so compare in a collision-free
    # configuration instead
    spec2, world2 = _noisy_pair(0.5, 0.5)
    far = state.replace(pos=jnp.asarray(
        [[0.0, 0.0], [10.0, 0.0], [20.0, 0.0], [30.0, 0.0]], jnp.float64))
    a = step_world(spec2, far, u, c)
    b = step_world(spec2, far, u, c, key=jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(a.vel)[1], np.asarray(b.vel)[1])
