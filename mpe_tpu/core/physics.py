"""Vectorized point-mass physics step.

Replicates the semantics of the reference's ``World.step`` pipeline
(reference multiagent/core.py:117-196) as one fused tensor program:

  reference (per-object Python loops)        here (tensor ops over [E, ...])
  ---------------------------------------    --------------------------------
  apply_action_force   (core.py:134-140)  -> masked add of [A,P] action force
  apply_environment_force (O(E^2) pair     -> one [E,E,P] pairwise soft-collision
    loop, core.py:143-155)                    tensor, masked + summed over axis 1
  integrate_state      (core.py:158-169)  -> damping, F/m*dt, speed clamp,
                                              x += v*dt — all elementwise
  update_agent_state   (core.py:171-177)  -> masked comm write

Semantic notes for parity:
  - The reference tracks "no force" as ``None`` and skips ``v += F/m*dt``
    for force-less entities (core.py:162-163). Adding an exact zero force is
    numerically identical, so we use dense zeros instead of a None-mask.
  - The collision force divides by pairwise distance with no epsilon
    (core.py:193), producing NaN on exact overlap. We guard the *masked-out*
    diagonal (dist==0 against itself) so NaNs never enter the sum; a genuine
    exact overlap of two distinct colliders is measure-zero and would NaN in
    the reference too — we instead return a zero force there (documented
    divergence, strictly better-defined).
  - Noise is gated per-agent by truthiness of ``u_noise``/``c_noise``
    (core.py:138, 176); spec stores 0.0 for "unset" so the gate is
    ``noise_scale > 0``. No built-in scenario enables noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpe_tpu.core.state import ScenarioSpec, WorldState


def collision_forces(spec: ScenarioSpec, pos: jax.Array) -> jax.Array:
    """Pairwise soft-collision forces summed per entity: [E, P].

    Soft penetration response (core.py:180-196):
      penetration = logaddexp(0, -(dist - dist_min)/k) * k
      force_ab    = contact_force * delta/dist * penetration
    applied +f to a and -f to b for every unordered collider pair; here the
    full antisymmetric [E,E,P] matrix is built and summed over partners,
    which accumulates exactly the same per-entity totals.
    """
    dtype = pos.dtype
    e = spec.n_entities
    delta = pos[:, None, :] - pos[None, :, :]               # [E,E,P], a - b
    dist2 = jnp.sum(jnp.square(delta), axis=-1)             # [E,E]
    pair_mask = (
        spec.collide[:, None]
        & spec.collide[None, :]
        & ~jnp.eye(e, dtype=bool)
    )
    safe_dist = jnp.sqrt(jnp.where(dist2 > 0, dist2, 1))    # guard masked diag
    dist_min = jnp.asarray(spec.size[:, None] + spec.size[None, :], dtype)
    k = jnp.asarray(spec.contact_margin, dtype)
    # logaddexp(0, x) == softplus(x); matches np.logaddexp at core.py:192
    penetration = jnp.logaddexp(jnp.zeros((), dtype), -(safe_dist - dist_min) / k) * k
    coeff = jnp.where(pair_mask & (dist2 > 0),
                      spec.contact_force * penetration / safe_dist,
                      jnp.zeros((), dtype))
    return jnp.sum(delta * coeff[..., None], axis=1)        # [E,P]


def step_world(
    spec: ScenarioSpec,
    state: WorldState,
    u: jax.Array,
    c: jax.Array,
    key: jax.Array | None = None,
) -> WorldState:
    """One physics step: decoded action forces ``u`` [A,P] and comm ``c``
    [A,C] in, next WorldState out. Pure; jit/vmap/grad-safe.

    Ordering matches ``World.step`` (core.py:117-131): action forces, then
    collision forces, then integration (damping *before* force application,
    position after velocity), then comm update.
    """
    dtype = state.pos.dtype
    a, e = spec.n_agents, spec.n_entities
    u = u.astype(dtype)
    c = c.astype(dtype)

    if key is not None and (spec.u_noise > 0).any():
        ku, _ = jax.random.split(key)
        gate = jnp.asarray(spec.u_noise, dtype)[:, None]
        u = u + jax.random.normal(ku, u.shape, dtype) * gate
    # action force applies only to movable agents (core.py:136-139)
    agent_movable = jnp.asarray(spec.movable[:a], dtype)[:, None]
    force = jnp.zeros((e, spec.dim_p), dtype).at[:a].set(u * agent_movable)

    force = force + collision_forces(spec, state.pos)

    # integrate (core.py:158-169); non-movable entities are frozen entirely
    mass = jnp.asarray(spec.initial_mass, dtype)[:, None]
    dt = jnp.asarray(spec.dt, dtype)
    vel = state.vel * (1 - jnp.asarray(spec.damping, dtype))
    vel = vel + force / mass * dt
    speed = jnp.sqrt(jnp.sum(jnp.square(vel), axis=-1, keepdims=True))
    max_speed = jnp.asarray(spec.max_speed, dtype)[:, None]
    over = speed > max_speed                                 # inf => never
    vel = jnp.where(over, vel / jnp.where(speed > 0, speed, 1) * max_speed, vel)
    movable = jnp.asarray(spec.movable, bool)[:, None]
    vel = jnp.where(movable, vel, state.vel)
    pos = jnp.where(movable, state.pos + vel * dt, state.pos)

    # comm state (core.py:171-177): zeros for silent agents, else c (+ noise)
    if key is not None and (spec.c_noise > 0).any():
        _, kc = jax.random.split(key)
        gate = jnp.asarray(spec.c_noise, dtype)[:, None]
        c = c + jax.random.normal(kc, c.shape, dtype) * gate
    silent = jnp.asarray(spec.silent, bool)[:, None]
    comm = jnp.where(silent, jnp.zeros((), dtype), c)

    return state.replace(pos=pos, vel=vel, comm=comm, t=state.t + 1)
