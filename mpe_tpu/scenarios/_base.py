"""Scenario contract + shared vectorized building blocks.

The reference expresses scenarios as subclasses mutating ``World`` objects
(reference multiagent/scenario.py:4-10 ``make_world``/``reset_world``, plus
per-scenario ``reward``/``observation``/``benchmark_data`` callbacks wired
by make_env.py:36-43). Here a scenario is a *static* ``ScenarioSpec`` plus
pure functions of ``WorldState``:

    reset(key)        -> WorldState            (reset_world equivalent)
    reward(state)     -> f[A]                  (per-agent rewards, batched)
    observation(state)-> f[A, max(obs_dims)]   (rows zero-padded to a common
                                                width; true widths in
                                                ``obs_dims`` — per-agent obs
                                                dims are heterogeneous, e.g.
                                                speaker 3 vs listener 11)
    benchmark_data(state) -> dict[str, Array]  (info channel equivalents)
    done(state)       -> bool[A]               (reference has none;
                                                environment.py:132-135)

Everything is jit/vmap-safe: no data-dependent shapes, agent loops only at
trace time over tiny static counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mpe_tpu.core.state import ScenarioSpec, WorldState


class Scenario:
    """Base scenario: subclasses set ``self.spec`` and override hooks."""

    spec: ScenarioSpec
    obs_dims: tuple[int, ...]
    #: ``benchmark_data`` keys whose leading axis is the agent axis; the
    #: stateful wrapper splits exactly these per agent and hands every
    #: other leaf to all agents whole (the reference computes
    #: benchmark_data per agent, make_env.py:40-41 + environment.py:
    #: 119-122 — an explicit declaration instead of a shape heuristic,
    #: which would misattribute any global leaf that happens to have
    #: n_agents rows).
    per_agent_info: frozenset[str] = frozenset()

    # -- required hooks -------------------------------------------------
    def reset(self, key: jax.Array, dtype=jnp.float32) -> WorldState:
        raise NotImplementedError

    def reward(self, state: WorldState) -> jax.Array:
        raise NotImplementedError

    def observation(self, state: WorldState) -> jax.Array:
        raise NotImplementedError

    # -- optional hooks --------------------------------------------------
    def benchmark_data(self, state: WorldState):
        return None

    def scripted_action(self, state: WorldState):
        """Scripted-agent hook (the reference's ``action_callback`` path,
        core.py:79 and 117-120 — defined there but unused by every
        built-in scenario). Return ``None`` (no scripted agents) or
        ``(mask bool[A], u [A,P], c [A,C])``; masked agents' physical and
        comm actions come from here instead of the policy."""
        return None

    def done(self, state: WorldState) -> jax.Array:
        return jnp.zeros((self.spec.n_agents,), bool)

    def entity_colors(self, state: WorldState) -> jax.Array:
        """[E, 3] render colors (reference stores these on entities)."""
        e = self.spec.n_entities
        return jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5]), (e, 3))

    # -- conveniences ----------------------------------------------------
    @property
    def obs_width(self) -> int:
        return max(self.obs_dims)

    def observation_shapes(self):
        """Per-agent true obs shapes, derived like the reference derives
        space dims by probing the obs callback (environment.py:68) — here
        via ``jax.eval_shape`` so no compute runs."""
        out = jax.eval_shape(self.observation, jax.eval_shape(
            self.reset, jax.ShapeDtypeStruct((2,), jnp.uint32)))
        assert out.shape == (self.spec.n_agents, self.obs_width)
        return tuple((d,) for d in self.obs_dims)


# ---------------------------------------------------------------------------
# shared vectorized helpers
# ---------------------------------------------------------------------------

def uniform_reset(
    spec: ScenarioSpec,
    key: jax.Array,
    dtype=jnp.float32,
    *,
    agent_range: float = 1.0,
    landmark_range: float = 1.0,
    n_goal_choices: int | tuple[int, ...] = (),
) -> WorldState:
    """The standard reset pattern shared by every scenario: agents uniform
    in [-1,1]^P, landmarks uniform in [-r,r]^P, zero velocities and comm
    (e.g. simple_spread.py:39-45), plus uniform landmark-goal sampling for
    scenarios that need it (``np.random.choice(world.landmarks)``)."""
    ka, kl, kg = jax.random.split(key, 3)
    a, l, p = spec.n_agents, spec.n_landmarks, spec.dim_p
    apos = jax.random.uniform(ka, (a, p), dtype, -agent_range, agent_range)
    lpos = jax.random.uniform(kl, (l, p), dtype, -landmark_range, landmark_range)
    if isinstance(n_goal_choices, int):
        n_goal_choices = (n_goal_choices,)
    goals = []
    for i, n in enumerate(n_goal_choices):
        kg, sub = jax.random.split(kg)
        goals.append(jax.random.randint(sub, (), 0, n, jnp.int32))
    goal = jnp.stack(goals) if goals else jnp.zeros((0,), jnp.int32)
    assert goal.shape == (spec.n_goals,)
    return WorldState(
        pos=jnp.concatenate([apos, lpos], axis=0),
        vel=jnp.zeros((spec.n_entities, p), dtype),
        comm=jnp.zeros((a, spec.dim_c), dtype),
        goal=goal,
        t=jnp.zeros((), jnp.int32),
    )


def agent_pos(spec: ScenarioSpec, state: WorldState) -> jax.Array:
    return state.pos[: spec.n_agents]


def landmark_pos(spec: ScenarioSpec, state: WorldState) -> jax.Array:
    return state.pos[spec.n_agents :]


def landmark_rel(spec: ScenarioSpec, state: WorldState) -> jax.Array:
    """[A, L, P] landmark positions in each agent's frame
    (``entity.state.p_pos - agent.state.p_pos``, e.g. simple.py:47-49)."""
    return landmark_pos(spec, state)[None] - agent_pos(spec, state)[:, None]


def other_rel(spec: ScenarioSpec, state: WorldState) -> jax.Array:
    """[A, A-1, P] other agents' positions in each agent's frame, in world
    order excluding self (simple_spread.py:96-99)."""
    ap = agent_pos(spec, state)
    return ap[spec.others_idx] - ap[:, None]


def other_vel(spec: ScenarioSpec, state: WorldState) -> jax.Array:
    """[A, A-1, P] other agents' velocities."""
    return state.vel[: spec.n_agents][spec.others_idx]


def other_comm(spec: ScenarioSpec, state: WorldState) -> jax.Array:
    """[A, A-1, C] other agents' comm utterances."""
    return state.comm[spec.others_idx]


def pairwise_dist(x: jax.Array, y: jax.Array) -> jax.Array:
    """[N, M] Euclidean distances between row sets."""
    d = x[:, None, :] - y[None, :, :]
    return jnp.sqrt(jnp.sum(jnp.square(d), axis=-1))


def agent_landmark_dist(spec: ScenarioSpec, state: WorldState) -> jax.Array:
    """[A, L] distances from each agent to each landmark."""
    return pairwise_dist(agent_pos(spec, state), landmark_pos(spec, state))


def collisions(spec: ScenarioSpec, state: WorldState) -> jax.Array:
    """[A, A] bool — ``is_collision`` between every agent pair, **including
    the diagonal** (dist 0 < 2*size counts as a collision — the reference's
    self-collision quirk, simple_spread.py:66-70 with the ``a is agent``
    loop at :78-81 reproduced faithfully by callers that keep the diag)."""
    ap = agent_pos(spec, state)
    d = pairwise_dist(ap, ap)
    smin = spec.size[: spec.n_agents, None] + spec.size[None, : spec.n_agents]
    return d < smin


def bound_penalty(x: jax.Array) -> jax.Array:
    """The screen-exit penalty of simple_tag.py:103-108: 0 below 0.9,
    linear (x-0.9)*10 to 1.0, then min(exp(2x-2), 10)."""
    return jnp.where(
        x < 0.9,
        0.0,
        jnp.where(x < 1.0, (x - 0.9) * 10.0, jnp.minimum(jnp.exp(2 * x - 2), 10.0)),
    ).astype(x.dtype)


def pad_stack(rows: list[jax.Array], width: int) -> jax.Array:
    """Stack heterogeneous per-agent obs rows, zero-padding to ``width``."""
    return jnp.stack(
        [jnp.concatenate([r, jnp.zeros((width - r.shape[0],), r.dtype)])
         if r.shape[0] < width else r for r in rows]
    )


def const(v, dtype) -> jax.Array:
    return jnp.asarray(np.asarray(v), dtype)


def take_row(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` as a one-hot contraction instead of a gather.

    Under ``vmap`` a dynamic row gather lowers to a per-lane gather op
    that is ~10x slower than a tiny matmul on TPU (measured: the XLA-path
    goal scenarios ran at 12-13M steps/s with gathers vs 90M+ without).
    One-hot times table is numerically identical (exact 1.0/0.0 weights).
    table: [L, ...rows]; idx: scalar int -> [...rows]."""
    onehot = jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype)
    # HIGHEST precision: default TPU matmul precision could round the
    # selected row through bf16 and break reference parity
    return jnp.tensordot(onehot, table, axes=1,
                         precision=jax.lax.Precision.HIGHEST)
