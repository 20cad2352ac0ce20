"""Struct-of-arrays world state + static per-scenario entity table.

TPU-first re-design of the reference's object-oriented entity model
(reference multiagent/core.py:4-99: ``EntityState``/``AgentState``/``Action``
structs and ``Entity``/``Agent``/``Landmark`` classes holding mutable numpy
attributes). Instead of a Python list of objects, the world is:

  - ``WorldState``  — a flat pytree of arrays over a **unified entity axis**
    (agents first, then landmarks). Pure data; every step produces a new one.
    A leading batch axis is added by ``vmap``, a device axis by sharding.
  - ``ScenarioSpec`` — the *static* entity table (masks and physical
    parameters that the reference stores as per-object attributes, e.g.
    ``movable``/``collide``/``size``/``accel``; core.py:27-79). It is plain
    numpy, closed over by the jitted step functions, so every mask and
    constant is baked into the compiled program — no dynamic shapes, no
    per-entity Python control flow on the hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class WorldState:
    """Dynamic world state (a pytree; all leaves are arrays).

    Shapes below are for a single env; ``vmap`` adds a leading env axis.

    Attributes:
      pos:  [E, P] float — entity positions (reference ``state.p_pos``).
      vel:  [E, P] float — entity velocities (reference ``state.p_vel``).
      comm: [A, C] float — agent communication utterances (``state.c``).
      goal: [G] int32 — scenario-specific goal landmark indices (the
        reference stores goals as object references on agents, e.g.
        ``agent.goal_b = np.random.choice(world.landmarks)`` in
        simple_reference.py:33; here they are indices into the landmark
        block of the entity axis). G == 0 for scenarios without goals.
      t:    [] int32 — step counter (used for horizon / auto-reset; the
        reference has no built-in termination, environment.py:132-135).
    """

    pos: jax.Array
    vel: jax.Array
    comm: jax.Array
    goal: jax.Array
    t: jax.Array

    @property
    def dtype(self):
        return self.pos.dtype


def _np(x, dtype=np.float64) -> np.ndarray:
    a = np.asarray(x, dtype=dtype)
    a.setflags(write=False)
    return a


@dataclasses.dataclass(frozen=True)
class ScenarioSpec:
    """Static per-scenario entity table + physics constants.

    Mirrors every per-entity attribute of the reference's ``Entity``/
    ``Agent`` classes (core.py:27-79) and the ``World`` physics constants
    (core.py:83-99) as dense arrays over the entity axis (agents first,
    landmarks after). All arrays are read-only numpy: they are trace-time
    constants, not traced values.
    """

    name: str
    n_agents: int
    n_landmarks: int

    # --- per-entity tables, length E = n_agents + n_landmarks ---
    movable: np.ndarray       # bool[E]   (core.py:34)
    collide: np.ndarray       # bool[E]   (core.py:36)
    size: np.ndarray          # f64[E]    (core.py:32)
    initial_mass: np.ndarray  # f64[E]    (core.py:47; ``mass`` == initial_mass, core.py:49-51)
    max_speed: np.ndarray     # f64[E], np.inf where reference has None (core.py:42)

    # --- per-agent tables, length A = n_agents ---
    silent: np.ndarray        # bool[A]   (core.py:65)
    adversary: np.ndarray     # bool[A]   (scenario attr, e.g. simple_tag.py:21)
    leader: np.ndarray        # bool[A]   (simple_world_comm.py:23)
    accel: np.ndarray         # f64[A] action sensitivity; 5.0 where reference
                              # has None (environment.py:178-181)
    u_range: np.ndarray       # f64[A]    (core.py:73)
    u_noise: np.ndarray       # f64[A]; 0.0 where reference has None (core.py:69)
    c_noise: np.ndarray       # f64[A]; 0.0 where None (core.py:71)

    # --- world constants (core.py:83-99) ---
    dim_p: int = 2
    dim_c: int = 0
    dim_color: int = 3
    dt: float = 0.1
    damping: float = 0.25
    contact_force: float = 1e2
    contact_margin: float = 1e-3
    collaborative: bool = False        # environment.py:35 shared-reward flag
    force_discrete_action: bool = False  # world.discrete_action (environment.py:33)
    n_goals: int = 0                   # width of WorldState.goal

    def __post_init__(self):
        a, e = self.n_agents, self.n_entities
        assert self.movable.shape == (e,) and self.collide.shape == (e,)
        assert self.size.shape == (e,) and self.max_speed.shape == (e,)
        assert self.silent.shape == (a,) and self.accel.shape == (a,)

    # ---- derived static helpers ----

    @property
    def n_entities(self) -> int:
        return self.n_agents + self.n_landmarks

    @property
    def others_idx(self) -> np.ndarray:
        """[A, A-1] int — for each agent, the indices of all other agents in
        world order (the ``for other in world.agents: if other is agent:
        continue`` pattern, e.g. simple_spread.py:96-99)."""
        a = self.n_agents
        return np.array(
            [[j for j in range(a) if j != i] for i in range(a)], dtype=np.int32
        ).reshape(a, max(a - 1, 0))

    @property
    def landmark_idx(self) -> np.ndarray:
        """[L] int — entity indices of the landmark block."""
        return np.arange(self.n_agents, self.n_entities, dtype=np.int32)

    def zeros_state(self, dtype=jnp.float32) -> WorldState:
        """An all-zeros WorldState with this spec's shapes."""
        return WorldState(
            pos=jnp.zeros((self.n_entities, self.dim_p), dtype),
            vel=jnp.zeros((self.n_entities, self.dim_p), dtype),
            comm=jnp.zeros((self.n_agents, self.dim_c), dtype),
            goal=jnp.zeros((self.n_goals,), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )


def make_spec(
    name: str,
    n_agents: int,
    n_landmarks: int,
    *,
    agent_movable: Any = True,
    agent_collide: Any = True,
    agent_silent: Any = True,
    agent_size: Any = 0.05,
    agent_accel: Any = None,
    agent_max_speed: Any = None,
    agent_u_range: Any = 1.0,
    agent_u_noise: Any = None,
    agent_c_noise: Any = None,
    adversary: Any = False,
    leader: Any = False,
    landmark_collide: Any = False,
    landmark_size: Any = 0.05,
    mass: Any = 1.0,
    **world_kwargs,
) -> ScenarioSpec:
    """Build a ScenarioSpec from per-group scalars or per-entity sequences.

    Scalars broadcast; ``None`` for accel/max_speed/noise maps to the
    reference's "unset" semantics (sensitivity 5.0, no clamp, no noise).
    """

    def bcast(v, n, none_to, dtype=np.float64):
        if v is None:
            v = none_to
        v = np.asarray(v, dtype=dtype)
        out = np.broadcast_to(v, (n,)).copy()
        if dtype == np.float64 and none_to is not None:
            out[np.isnan(out)] = none_to
        out.setflags(write=False)
        return out

    def seq(v, n, none_to, dtype=np.float64):
        # allow element-wise None in sequences
        if isinstance(v, (list, tuple)):
            v = [none_to if x is None else x for x in v]
        elif v is None:
            v = none_to
        return bcast(v, n, none_to, dtype)

    a, l = n_agents, n_landmarks
    movable = np.concatenate([bcast(agent_movable, a, None, bool),
                              np.zeros(l, bool)])
    collide = np.concatenate([bcast(agent_collide, a, None, bool),
                              bcast(landmark_collide, l, None, bool)])
    size = np.concatenate([seq(agent_size, a, 0.05), seq(landmark_size, l, 0.05)])
    max_speed = np.concatenate([seq(agent_max_speed, a, np.inf),
                                np.full(l, np.inf)])
    for arr in (movable, collide, size, max_speed):
        arr.setflags(write=False)
    return ScenarioSpec(
        name=name,
        n_agents=a,
        n_landmarks=l,
        movable=movable,
        collide=collide,
        size=size,
        initial_mass=(
            seq(mass, a + l, 1.0)
            if isinstance(mass, (list, tuple, np.ndarray)) and len(mass) == a + l
            else np.concatenate([seq(mass, a, 1.0), seq(mass, l, 1.0)])),
        max_speed=max_speed,
        silent=bcast(agent_silent, a, None, bool),
        adversary=bcast(adversary, a, None, bool),
        leader=bcast(leader, a, None, bool),
        accel=seq(agent_accel, a, 5.0),
        u_range=seq(agent_u_range, a, 1.0),
        u_noise=seq(agent_u_noise, a, 0.0),
        c_noise=seq(agent_c_noise, a, 0.0),
        **world_kwargs,
    )
