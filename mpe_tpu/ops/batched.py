"""Env-minor batched step math, written to lower cleanly inside Pallas.

These functions compute the same semantics as ``core.physics.step_world``
+ the simple_spread scenario callbacks (reference core.py:117-196 and
scenarios/simple_spread.py:72-100), but:

  - operate on **env-minor blocks** (``pos [E, P, N]`` with the env axis
    last, filling the TPU's 128-wide vector lanes);
  - use only elementwise ops, reductions, broadcasts and *static* slices
    (no gathers — Mosaic-friendly), with tiny entity loops unrolled at
    trace time;
  - are pure jnp, so the identical code runs (a) inside the Pallas fused
    rollout kernel with every intermediate in VMEM and (b) as a plain
    XLA program for unit testing against the vmapped reference path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mpe_tpu.core.state import ScenarioSpec


def batched_physics_step(spec: ScenarioSpec, pos, vel, u):
    """One collision+integration step on an env-minor block.

    pos/vel: [E, P, N]; u: [A, P, N] decoded action forces (already
    scaled by sensitivity). Returns (pos, vel). Matches
    core.py:117-169 semantics (damping before force, speed clamp,
    position after velocity). Comm is handled by the caller (zeros for
    silent agents, core.py:171-177).
    """
    dt = spec.dt
    a, e = spec.n_agents, spec.n_entities
    dtype = pos.dtype

    # action force on movable agents (core.py:134-140)
    agent_mov = jnp.asarray(spec.movable[:a], dtype)[:, None, None]
    force = jnp.concatenate(
        [u * agent_mov, jnp.zeros((e - a,) + u.shape[1:], dtype)], axis=0)

    # pairwise soft collisions (core.py:143-155, 180-196): [E, E, P, N]
    delta = pos[:, None] - pos[None, :]
    dist2 = jnp.sum(jnp.square(delta), axis=2)              # [E, E, N]
    pair = (spec.collide[:, None] & spec.collide[None, :]
            & ~np.eye(e, dtype=bool))
    dist = jnp.sqrt(jnp.where(dist2 > 0, dist2, 1))
    dmin = jnp.asarray((spec.size[:, None] + spec.size[None, :]), dtype)
    pen = jnp.logaddexp(jnp.zeros((), dtype),
                        -(dist - dmin[..., None]) / spec.contact_margin)
    pen = pen * spec.contact_margin
    coeff = jnp.where(jnp.asarray(pair)[..., None] & (dist2 > 0),
                      spec.contact_force * pen / dist,
                      jnp.zeros((), dtype))
    force = force + jnp.sum(delta * coeff[:, :, None, :], axis=1)

    # integrate (core.py:158-169)
    mass = jnp.asarray(spec.initial_mass, dtype)[:, None, None]
    vel_new = vel * (1 - spec.damping) + force / mass * dt
    speed = jnp.sqrt(jnp.sum(jnp.square(vel_new), axis=1, keepdims=True))
    vmax = jnp.asarray(spec.max_speed, dtype)[:, None, None]
    finite = np.isfinite(spec.max_speed)
    if finite.any():
        over = speed > vmax
        vel_new = jnp.where(over,
                            vel_new / jnp.where(speed > 0, speed, 1) * vmax,
                            vel_new)
    movable = jnp.asarray(spec.movable, bool)[:, None, None]
    vel_new = jnp.where(movable, vel_new, vel)
    pos_new = jnp.where(movable, pos + vel_new * dt, pos)
    return pos_new, vel_new


def decode_onehot_block(spec: ScenarioSpec, move, dtype):
    """DISCRETE decode on an env-minor block: move [A, 5, N] one-hots ->
    u [A, P, N] (u[k] = a[2k+1]-a[2k+2], scaled by accel; reference
    environment.py:174-181)."""
    u = move[:, 1::2] - move[:, 2::2]
    sens = jnp.asarray(spec.accel, dtype)[:, None, None]
    mov = jnp.asarray(spec.movable[: spec.n_agents], dtype)[:, None, None]
    return u * sens * mov


def spread_reward_obs(spec: ScenarioSpec, pos, vel):
    """simple_spread shared reward + observations on an env-minor block.

    pos/vel: [E, P, N]. Returns (reward [A, N] post-collaborative-
    broadcast, obs [A, 18, N]). Matches simple_spread.py:72-100 incl. the
    self-collision quirk (every agent collides with itself each step) and
    environment.py:99-102's np.sum shared-reward broadcast.
    """
    a = spec.n_agents
    ap, lp = pos[:a], pos[a:]
    av = vel[:a]
    dtype = pos.dtype

    # [A, L, N] agent-landmark dists
    d = jnp.sqrt(jnp.sum(jnp.square(ap[:, None] - lp[None, :]), axis=2))
    min_d = jnp.min(d, axis=0)                               # [L, N]
    base = -jnp.sum(min_d, axis=0)                           # [N]

    # collisions among agents incl. self (simple_spread.py:78-81)
    ad2 = jnp.sum(jnp.square(ap[:, None] - ap[None, :]), axis=2)  # [A, A, N]
    thresh = jnp.asarray(
        (spec.size[:a, None] + spec.size[None, :a]) ** 2, dtype)[..., None]
    coll = (ad2 < thresh).astype(dtype)
    per_agent = base[None, :] - jnp.sum(coll, axis=1)        # [A, N]
    shared = jnp.sum(per_agent, axis=0, keepdims=True)       # collaborative
    reward = jnp.broadcast_to(shared, (a,) + shared.shape[1:])

    # obs rows (simple_spread.py:84-100): vel, pos, L rel, others rel, comm
    lrel = lp[None, :] - ap[:, None]                         # [A, L, P, N]
    n = pos.shape[-1]
    rows = [av, ap]                                          # [A, P, N] each
    rows.append(lrel.reshape(a, -1, n))
    # other agents in world order excluding self — static concat, no gather
    others = []
    for i in range(a):
        rel = [ap[j] - ap[i] for j in range(a) if j != i]    # [(P, N)] * A-1
        others.append(jnp.stack(rel).reshape(-1, n))
    rows.append(jnp.stack(others))                           # [A, 2(A-1), N]
    rows.append(jnp.zeros((a, (a - 1) * spec.dim_c, n), dtype))  # silent comm
    obs = jnp.concatenate(rows, axis=1)
    return reward, obs


def batched_spread_step(spec: ScenarioSpec, pos, vel, move):
    """Full env-minor simple_spread step: one-hot moves [A, 5, N] in,
    (pos, vel, reward [A,N], obs [A,18,N]) out. The unit that the Pallas
    fused rollout iterates in VMEM."""
    u = decode_onehot_block(spec, move, pos.dtype)
    pos, vel = batched_physics_step(spec, pos, vel, u)
    reward, obs = spread_reward_obs(spec, pos, vel)
    return pos, vel, reward, obs
