"""Kernel-dialect scenario blocks for the fused Pallas rollouts.

Each scenario here is the Mosaic-safe, env-minor, scalar-specialized
counterpart of its mpe_tpu.scenarios implementation (which is itself
golden-parity-tested against the reference): no array constants, no
gathers, unrolled entity loops, everything >=2D. The vmapped scenario
path stays the source of truth; interpret-mode tests pin these blocks to
it (tests/test_fused.py).

``generic_physics_block`` implements core.py:117-169 semantics for ANY
``ScenarioSpec``: per-entity scalars (size/mass/accel/max_speed) are
baked at trace time, collide pairs — including agent↔landmark-obstacle
pairs — are unrolled, forces apply only to movable participants, and
non-movable entities pass through untouched.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mpe_tpu.core.state import ScenarioSpec
from mpe_tpu.ops.fused_rollout import spread_reward_obs_block


def decode_move_block(spec: ScenarioSpec, move):
    """[A, 5, N] one-hots -> scaled force [A, P, N]
    (environment.py:174-181)."""
    a = spec.n_agents
    u = jnp.stack([move[:, 1] - move[:, 2], move[:, 3] - move[:, 4]],
                  axis=1)
    accel = [float(x) for x in spec.accel]
    mov = [bool(m) for m in spec.movable[:a]]
    if len(set(accel)) == 1 and all(mov):
        return u * accel[0]
    return jnp.stack([u[i] * (accel[i] if mov[i] else 0.0)
                      for i in range(a)])


def generic_physics_block(spec: ScenarioSpec, pos, vel, move):
    """One core.py:117-169 step for any spec: pos/vel [E, P, N],
    move [A, 5, N] -> (pos, vel)."""
    a, e = spec.n_agents, spec.n_entities
    dtype = pos.dtype
    k = float(spec.contact_margin)
    cf = float(spec.contact_force)
    damping = float(spec.damping)
    dt = float(spec.dt)

    u = decode_move_block(spec, move)
    # per-entity force rows; only movable entities accumulate
    rows = [u[i] if spec.movable[i] else None for i in range(a)]
    rows += [None] * (e - a)
    for i in range(e):
        for j in range(i + 1, e):
            if not (spec.collide[i] and spec.collide[j]):
                continue
            if not (spec.movable[i] or spec.movable[j]):
                continue
            delta = pos[i] - pos[j]                          # [P, N]
            dist = jnp.sqrt(jnp.sum(jnp.square(delta), axis=0,
                                    keepdims=True))
            dmin = float(spec.size[i] + spec.size[j])
            pen = jnp.logaddexp(jnp.zeros((), dtype), -(dist - dmin) / k) * k
            f = (cf * pen / jnp.maximum(dist, 1e-30)) * delta
            if spec.movable[i]:
                rows[i] = f if rows[i] is None else rows[i] + f
            if spec.movable[j]:
                rows[j] = -f if rows[j] is None else rows[j] - f

    # integrate movable entities (damping before force, clamp, then pos)
    new_pos, new_vel = [], []
    for i in range(e):
        if not spec.movable[i]:
            new_pos.append(pos[i])
            new_vel.append(vel[i])
            continue
        force = rows[i]
        v = vel[i] * (1.0 - damping)
        if force is not None:
            v = v + force * (dt / float(spec.initial_mass[i]))
        ms = float(spec.max_speed[i])
        if np.isfinite(ms):
            speed = jnp.sqrt(jnp.sum(jnp.square(v), axis=0, keepdims=True))
            v = jnp.where(speed > ms,
                          v / jnp.maximum(speed, 1e-30) * ms, v)
        new_vel.append(v)
        new_pos.append(pos[i] + v * dt)
    return jnp.stack(new_pos), jnp.stack(new_vel)


class KernelScenario:
    """Blocks consumed by the generic fused rollout. ``reward_obs``
    returns (reward rows [R, N] — R=1 for shared-reward scenarios, else
    A — and obs [A, obs_w, N])."""

    spec: ScenarioSpec
    obs_w: int
    reward_rows: int

    def reset_ranges(self) -> tuple[float, float]:
        """(agent_range, landmark_range) for uniform position sampling."""
        return 1.0, 1.0

    def physics(self, pos, vel, move):
        return generic_physics_block(self.spec, pos, vel, move)

    def reward_obs(self, pos, vel):
        raise NotImplementedError


class KernelSimple(KernelScenario):
    """simple: reward -dist^2 to the landmark; obs [vel, landmark_rel]
    (reference simple.py:41-50)."""

    def __init__(self, spec: ScenarioSpec):
        self.spec = spec
        self.obs_w = 4
        self.reward_rows = 1

    def reward_obs(self, pos, vel):
        rel = pos[1] - pos[0]                                # [P, N]
        rew = -jnp.sum(jnp.square(rel), axis=0, keepdims=True)
        obs = jnp.concatenate([vel[0], rel], axis=0)[None]   # [1, 4, N]
        return rew, obs


class KernelSpread(KernelScenario):
    """simple_spread (see fused_rollout.spread_reward_obs_block)."""

    def __init__(self, spec: ScenarioSpec):
        self.spec = spec
        self.obs_w = 18
        self.reward_rows = 1

    def reward_obs(self, pos, vel):
        a = self.spec.n_agents
        return spread_reward_obs_block(self.spec, pos[:a], vel[:a], pos[a:])


class KernelTag(KernelScenario):
    """simple_tag: 3 predators + 1 prey, collide obstacle landmarks,
    bound penalty (reference simple_tag.py:89-147)."""

    def __init__(self, spec: ScenarioSpec):
        self.spec = spec
        self.obs_w = 16
        self.reward_rows = spec.n_agents

    def reset_ranges(self):
        return 1.0, 0.9                                      # simple_tag.py:47-52

    def reward_obs(self, pos, vel):
        spec = self.spec
        a, l = spec.n_agents, spec.n_landmarks
        dtype = pos.dtype
        n = pos.shape[-1]
        prey = a - 1

        # predator-prey collisions (post-step positions)
        hits = jnp.zeros((1, n), dtype)
        for i in range(prey):
            d2 = jnp.sum(jnp.square(pos[i] - pos[prey]), axis=0,
                         keepdims=True)
            thresh2 = float(spec.size[i] + spec.size[prey]) ** 2
            hits = hits + (d2 < thresh2).astype(dtype)
        adv_r = 10.0 * hits                                  # [1, N]

        # prey: -10/hit - bound penalty per dim (simple_tag.py:103-113)
        bound = jnp.zeros((1, n), dtype)
        for d in range(spec.dim_p):
            x = jnp.abs(pos[prey, d : d + 1])
            pen = jnp.where(
                x < 0.9, jnp.zeros((), dtype),
                jnp.where(x < 1.0, (x - 0.9) * 10.0,
                          jnp.minimum(jnp.exp(2.0 * x - 2.0), 10.0)))
            bound = bound + pen
        prey_r = -10.0 * hits - bound
        rew = jnp.concatenate([adv_r, adv_r, adv_r, prey_r], axis=0)

        # obs: [vel(2), pos(2), L rel(4), others rel(6), prey vel(2 or pad)]
        obs_rows = []
        for i in range(a):
            parts = [vel[i], pos[i]]
            for j in range(l):
                parts.append(pos[a + j] - pos[i])
            for j in range(a):
                if j != i:
                    parts.append(pos[j] - pos[i])
            if i != prey:
                parts.append(vel[prey])
            else:
                parts.append(jnp.zeros((2, n), dtype))       # pad to 16
            obs_rows.append(jnp.concatenate(parts, axis=0))
        return rew, jnp.stack(obs_rows)


_KERNEL_SCENARIOS = {
    "simple": KernelSimple,
    "simple_spread": KernelSpread,
    "simple_tag": KernelTag,
}


def kernel_scenario(name_or_scenario) -> KernelScenario:
    """Kernel blocks for a scenario (by name or scenario instance)."""
    if isinstance(name_or_scenario, str):
        from mpe_tpu import scenarios as registry

        scn = registry.load(name_or_scenario)
    else:
        scn = name_or_scenario
    name = scn.spec.name
    if name not in _KERNEL_SCENARIOS:
        raise KeyError(
            f"no fused kernel for {name!r}; available: "
            f"{sorted(_KERNEL_SCENARIOS)} (the vmapped XLA path in "
            f"mpe_tpu.parallel supports every scenario)")
    return _KERNEL_SCENARIOS[name](scn.spec)
