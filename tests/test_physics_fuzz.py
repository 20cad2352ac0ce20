"""Property-style physics fuzz: random ScenarioSpecs (random counts,
sizes, masses, accelerations, max-speed clamps, collide/movable masks,
noise settings) driven through the GENUINE reference ``World`` vs our
vectorized physics, step by step at float64.

The scenario parity suites pin the nine fixed specs; this covers the rest
of the spec space the engine claims to support (core.py:27-99 attribute
combinations)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpe_tpu.core.physics import step_world
from mpe_tpu.core.state import make_spec
from tests import _oracle as O


def _random_spec(rng: np.random.Generator):
    a = int(rng.integers(1, 5))
    l = int(rng.integers(0, 4))
    maybe = lambda v: None if rng.random() < 0.3 else v

    def per_agent(lo, hi, none_p=0.3):
        return [None if rng.random() < none_p else float(rng.uniform(lo, hi))
                for _ in range(a)]

    return make_spec(
        f"fuzz_{rng.integers(1e9)}", n_agents=a, n_landmarks=l,
        agent_movable=[bool(rng.random() < 0.85) for _ in range(a)],
        agent_collide=[bool(rng.random() < 0.7) for _ in range(a)],
        agent_silent=True,
        agent_size=[float(rng.uniform(0.02, 0.3)) for _ in range(a)],
        agent_accel=per_agent(1.0, 6.0),
        agent_max_speed=per_agent(0.3, 2.0),
        mass=[float(rng.uniform(0.5, 3.0)) for _ in range(a + l)],
        landmark_collide=[bool(rng.random() < 0.5) for _ in range(l)],
        landmark_size=[float(rng.uniform(0.02, 0.4)) for _ in range(l)],
        dim_c=0,
    )


def _build_ref_world(spec):
    """Construct a reference World matching the spec's entity table."""
    O._ensure_ref_package()
    import multiagent.core as core

    world = core.World()
    world.dim_c = spec.dim_c
    agents, landmarks = [], []
    for i in range(spec.n_agents):
        ag = core.Agent()
        ag.movable = bool(spec.movable[i])
        ag.collide = bool(spec.collide[i])
        ag.silent = True
        ag.size = float(spec.size[i])
        ag.accel = float(spec.accel[i])
        ms = float(spec.max_speed[i])
        ag.max_speed = None if np.isinf(ms) else ms
        ag.initial_mass = float(spec.initial_mass[i])
        agents.append(ag)
    for j in range(spec.n_landmarks):
        e = spec.n_agents + j
        lm = core.Landmark()
        lm.movable = bool(spec.movable[e])
        lm.collide = bool(spec.collide[e])
        lm.size = float(spec.size[e])
        lm.initial_mass = float(spec.initial_mass[e])
        landmarks.append(lm)
    world.agents = agents
    world.landmarks = landmarks
    return world


@pytest.mark.parametrize("seed", range(12))
def test_random_spec_physics_matches_reference(seed):
    rng = np.random.default_rng(seed)
    spec = _random_spec(rng)
    world = _build_ref_world(spec)

    # random initial state (tight enough that collisions actually occur)
    e, p = spec.n_entities, spec.dim_p
    pos = rng.uniform(-0.5, 0.5, (e, p))
    vel = rng.uniform(-0.5, 0.5, (e, p)) * spec.movable[:, None]
    for i, ent in enumerate(world.entities):
        ent.state.p_pos = pos[i].copy()
        ent.state.p_vel = vel[i].copy()
        if hasattr(ent.state, "c"):
            ent.state.c = np.zeros(spec.dim_c)

    state = O.extract_state(world, spec)
    c = np.zeros((spec.n_agents, spec.dim_c))
    for t in range(10):
        u = rng.uniform(-3.0, 3.0, (spec.n_agents, p))
        O.set_ref_actions(world, u, c)
        world.step()
        state = step_world(spec, state, jnp.asarray(u), jnp.asarray(c))
        O.assert_state_close(state, world, atol=1e-9)
