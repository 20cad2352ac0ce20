"""Pallas fused multi-step rollout kernel.

Why: the XLA scan path moves ~22 MB of HBM traffic per vmapped step
(measured cost analysis) against ~0.5 MB of live state — intermediates
(the [E,E,P,N] pairwise tensor, fresh auto-reset states, RNG blocks)
round-trip through HBM every step, so the rollout is bandwidth-bound at
~34 µs/step for 4096 envs. This kernel runs the whole rollout with state
resident in VMEM: the only HBM traffic is the seed in and the final
state + reward accumulator out, independent of step count.

Design (per /opt/skills/guides/pallas_guide.md):
  - grid over env blocks: each program owns ``block_envs`` lanes of the
    env axis (env-minor layout ``[..., N]`` filling the 128-wide lanes).
  - ``jax.lax.fori_loop`` over steps inside the kernel.
  - every ScenarioSpec table is **baked in at trace time as Python
    scalars** (sizes, accel, damping, contact force) with the tiny
    pairwise loops unrolled — Pallas kernels cannot capture array
    constants, and scalar specialization is faster anyway (no runtime
    masking at all; landmarks never move in simple_spread so they are
    never integrated).
  - on-chip PRNG (pltpu.prng_seed / prng_random_bits) for uniform-random
    actions and episode auto-reset resampling, seeded per (block,
    rollout). RNG *streams* therefore differ from the jax.random path —
    distributionally identical, not bitwise (documented divergence;
    parity tests run the plain path).
  - auto-reset via per-lane masks after ``horizon`` steps, fully on-chip
    (the reference has no termination, environment.py:132-135; horizon
    matches ``MpeEnv(max_steps=..., auto_reset=True)``).

Scope: simple_spread — the benchmark scenario (BASELINE.json metric).
``spread_step_block`` is importable plain-jnp math, unit-tested against
the vmapped reference path; only the RNG + loop shell is Pallas-specific.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpe_tpu.core.state import ScenarioSpec


def spread_step_block(spec: ScenarioSpec, apos, avel, lpos, move):
    """One simple_spread step on an env-minor block, array-constant-free.

    apos/avel: [A, P, N] agent pos/vel; lpos: [L, P, N] landmark pos
    (landmarks are non-movable in spread — core.py integration skips
    them); move: [A, 5, N] one-hot-ish moves. Returns (apos, avel,
    reward [1, N] shared, obs [A, 18, N]). Semantics: core.py:117-196 +
    simple_spread.py:72-100 + environment.py:99-102 shared reward.
    """
    apos, avel = spread_physics_block(spec, apos, avel, move)
    reward, obs = spread_reward_obs_block(spec, apos, avel, lpos)
    return apos, avel, reward, obs


def spread_physics_block(spec: ScenarioSpec, apos, avel, move):
    """Decode + forces + integration only (core.py:117-169 semantics);
    -> (apos, avel)."""
    a = spec.n_agents
    dtype = apos.dtype

    # ---- decode (environment.py:174-181): per-agent scalar sensitivity
    # u[k] = a[2k+1] - a[2k+2]; static column picks (strided slices lower
    # as >2D gathers, which Mosaic rejects)
    u = jnp.stack([move[:, 2 * k + 1] - move[:, 2 * k + 2]
                   for k in range(spec.dim_p)], axis=1)      # [A, P, N]
    accel = [float(x) for x in spec.accel]
    if len(set(accel)) == 1:
        u = u * accel[0]
    else:
        u = jnp.stack([u[i] * accel[i] for i in range(a)])

    # ---- pairwise agent-agent soft collisions, unrolled i<j
    # (core.py:143-155, 180-196; only agents collide in spread)
    k = float(spec.contact_margin)
    cf = float(spec.contact_force)
    rows = [u[i] for i in range(a)]
    for i in range(a):
        for j in range(i + 1, a):
            if not (spec.collide[i] and spec.collide[j]):
                continue
            delta = apos[i] - apos[j]                        # [P, N]
            d2 = jnp.sum(jnp.square(delta), axis=0, keepdims=True)
            # rsqrt + multiplies instead of sqrt + divide: one slow VPU
            # op per pair instead of two (dist = d2*rsqrt(d2))
            inv = jax.lax.rsqrt(jnp.maximum(d2, float(jnp.finfo(dtype).tiny)))
            dist = d2 * inv
            dmin = float(spec.size[i] + spec.size[j])
            pen = jnp.logaddexp(jnp.zeros((), dtype), -(dist - dmin) / k) * k
            f = (cf * pen) * inv * delta
            rows[i] = rows[i] + f
            rows[j] = rows[j] - f
    force = jnp.stack(rows)                                  # [A, P, N]

    # ---- integrate (core.py:158-169); spread agents: mass 1, no clamp
    damping = float(spec.damping)
    dt = float(spec.dt)
    masses = [float(m) for m in spec.initial_mass[:a]]
    if len(set(masses)) == 1 and masses[0] == 1.0:
        avel = avel * (1.0 - damping) + force * dt
    else:
        inv = jnp.stack([force[i] / masses[i] for i in range(a)])
        avel = avel * (1.0 - damping) + inv * dt
    if np.isfinite(spec.max_speed[:a]).any():
        speed = jnp.sqrt(jnp.sum(jnp.square(avel), axis=1, keepdims=True))
        clamped = []
        for i in range(a):
            ms = float(spec.max_speed[i])
            if np.isfinite(ms):
                over = speed[i] > ms
                clamped.append(jnp.where(
                    over, avel[i] / jnp.maximum(speed[i], 1e-30) * ms,
                    avel[i]))
            else:
                clamped.append(avel[i])
        avel = jnp.stack(clamped)
    apos = apos + avel * dt
    return apos, avel


def spread_reward_obs_block(spec: ScenarioSpec, apos, avel, lpos):
    """simple_spread reward + obs of a (post-step) state;
    -> (reward [1, N] shared, obs [A, 18, N])."""
    a, l = spec.n_agents, spec.n_landmarks
    dtype = apos.dtype
    n = apos.shape[-1]

    # ---- reward (simple_spread.py:72-82 + shared sum env.py:99-102)
    # -sum_L min_A dist, unrolled over the tiny static counts
    # (jnp.min over the leading axis of [A, L, N] trips a Mosaic
    # "invalid relayout" bug on v5e; the unrolled form is also faster —
    # no [A, L, N] materialization)
    base = jnp.zeros((1, n), dtype)
    for j in range(l):
        dj = None
        for i in range(a):
            d = jnp.sqrt(jnp.sum(jnp.square(apos[i] - lpos[j]), axis=0,
                                 keepdims=True))             # [1, N]
            dj = d if dj is None else jnp.minimum(dj, d)
        base = base - dj
    # collisions incl. the self-collision quirk: self always collides
    # (dist 0 < 2*size), contributing a constant -1 per agent. Distances
    # are recomputed on the POST-step positions — the reference rewards
    # after world.step() (environment.py:90-94)
    coll_total = jnp.zeros((1, n), dtype)
    for i in range(a):
        for j in range(i + 1, a):
            if spec.collide[i] and spec.collide[j]:
                d2 = jnp.sum(jnp.square(apos[i] - apos[j]), axis=0,
                             keepdims=True)
                thresh2 = float(spec.size[i] + spec.size[j]) ** 2
                coll_total = coll_total + 2.0 * (d2 < thresh2).astype(dtype)
    # shared reward is identical across agents — keep it [1, N] (a
    # broadcast to [A, N] here trips a Mosaic relayout bug; callers that
    # need per-agent rows broadcast outside the kernel)
    reward = a * base - coll_total - float(a)                # [1, N]

    # ---- obs (simple_spread.py:84-100): [vel, pos, L rel, others, comm]
    obs_rows = []
    for i in range(a):
        parts = [avel[i], apos[i]]
        for j in range(l):
            parts.append(lpos[j] - apos[i])
        for j in range(a):
            if j != i:
                parts.append(apos[j] - apos[i])
        parts.append(jnp.zeros(((a - 1) * spec.dim_c, n), dtype))
        obs_rows.append(jnp.concatenate(parts, axis=0))
    obs = jnp.stack(obs_rows)                                # [A, 18, N]
    return reward, obs


def _uniform(shape, dtype=jnp.float32):
    """U[0,1) from on-chip PRNG bits (24-bit mantissa path)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # values < 2^24 after the shift, so an int32 view casts losslessly
    # (Mosaic has no uint32 -> float32 cast)
    top24 = pltpu.bitcast(
        jax.lax.shift_right_logical(bits, jnp.uint32(8)), jnp.int32)
    return top24.astype(dtype) * dtype(2.0 ** -24)


def _hash_uniform(salt, shape, dtype=jnp.float32):
    """Deterministic stand-in for the hardware PRNG: a stateless
    murmur-style hash of (salt, element index). Used when
    ``interpret=True`` (CPU has no lowering for prng_seed/_random_bits)
    and by the ``hash_rng`` parity mode of the trajectory kernels, where
    the same Mosaic-compiled kernel must reproduce the interpret run
    exactly (tools/tpu_train_parity.py). All arithmetic stays in int32
    (wrapping multiplies == the uint32 bit pattern; logical shifts) so
    Mosaic can lower it — uint32->f32 casts are unsupported on TPU and
    the final value fits 24 bits, so the int32->f32 cast is exact."""
    x = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    for d in range(1, len(shape)):
        x = x * shape[d] + jax.lax.broadcasted_iota(jnp.int32, shape, d)
    i32 = lambda c: jnp.int32(np.int32(np.uint32(c)))
    h = x + salt.astype(jnp.int32) * i32(2654435761)
    for c in (0x85EBCA6B, 0xC2B2AE35):
        h = h ^ jax.lax.shift_right_logical(h, jnp.int32(16))
        h = h * i32(c)
    h = h ^ jax.lax.shift_right_logical(h, jnp.int32(16))
    return (jax.lax.shift_right_logical(h, jnp.int32(8)).astype(dtype)
            * dtype(2.0 ** -24))


def make_uniform(seed_ref, interpret: bool, *extra_salts):
    """Shared kernel RNG scaffold: returns ``(uniform, seed_hw)`` where
    ``uniform(shape, step, call_id)`` draws U[0,1) and ``seed_hw()`` must
    be called once (hardware path) before the first draw — directly, or
    under ``pl.when`` for grid kernels that seed only on a block's first
    chunk. Hardware path: seeds the per-core PRNG with multiplicatively
    mixed (seed, global block, *extra) so consecutive seeds and
    neighboring blocks never share a stream (an additive ``seed + block``
    scheme would make block b of seed s identical to block b-1 of seed
    s+1; 7919 and 104729 are coprime, so the first (seed, block) stream
    collision needs a seed delta of 104729). Interpret path: stateless
    hash salted by the same terms plus (step, call_id); ``seed_hw`` is a
    no-op.

    ``seed_ref`` is ``[seed, block_offset]``: the GLOBAL block id is
    ``program_id(0) + block_offset``, so a device running blocks
    [d*B, (d+1)*B) of a sharded rollout draws the exact streams the
    single-device run draws for those blocks — results are invariant to
    how the env axis is sharded (see ``sharded_fused_rollout``)."""
    mixed = (seed_ref[0] * jnp.int32(7919)
             + (pl.program_id(0) + seed_ref[1]) * jnp.int32(104729))
    for i, s in enumerate(extra_salts):
        mixed = mixed + s * jnp.int32(15485863 + 2 * i)
    if interpret:
        def uniform(shape, step, call_id):
            salt = mixed + step * jnp.int32(64) + jnp.int32(call_id)
            return _hash_uniform(salt, shape)

        def seed_hw():
            pass
    else:
        def uniform(shape, step, call_id):
            return _uniform(shape)

        def seed_hw():
            pltpu.prng_seed(mixed)
    return uniform, seed_hw


def fused_spread_rollout(
    spec: ScenarioSpec,
    n_envs: int,
    n_steps: int,
    horizon: int | None = 100,
    block_envs: int = 1024,
    interpret: bool = False,
):
    """Fused rollout for simple_spread (the benchmark scenario): a thin
    wrapper over the generic ``fused_rollout`` with the spread kernel
    blocks. ``run(seed) -> (pos, vel, rew_sum [1, N], obs_checksum)``
    with pos/vel env-minor ``[E, P, n_envs]``.

    The obs checksum output keeps observation assembly live (it would
    otherwise be dead code under a random policy) so the bench measures
    the full step: decode + physics + reward + obs.
    """
    from mpe_tpu.ops.kernel_scenarios import KernelSpread

    return fused_rollout(KernelSpread(spec), n_envs, n_steps,
                         horizon=horizon, block_envs=block_envs,
                         interpret=interpret)


# ---------------------------------------------------------------------------
# generic fused rollout over kernel-scenario blocks (ops/kernel_scenarios)
# ---------------------------------------------------------------------------

def make_samplers(kscn, uniform):
    """Shared reset-sampling closures for the fused kernels: returns
    ``(sample_state, sample_goal, sample_comm)`` drawing uniform entity
    positions in the scenario's reset ranges, per-lane goal indices, and
    silent-masked comm utterances (None-returning where the scenario has
    no goals/comm)."""
    spec = kscn.spec
    a, l, p = spec.n_agents, spec.n_landmarks, spec.dim_p
    goal_choices = tuple(getattr(kscn, "goal_choices", ()) or ())
    dim_c = spec.dim_c if getattr(kscn, "uses_comm", False) else 0
    ar, lr = kscn.reset_ranges()

    def sample_state(step, call_id, n):
        apos = uniform((a, p, n), step, call_id) * (2.0 * ar) - ar
        lpos = uniform((l, p, n), step, call_id + 1) * (2.0 * lr) - lr
        return jnp.concatenate([apos, lpos], axis=0)

    def sample_goal(step, call_id, n):
        if not goal_choices:
            return None
        rows = []
        for gi, k in enumerate(goal_choices):
            u = uniform((1, n), step, call_id + 2 + gi)
            rows.append(jnp.floor(u * float(k)).astype(jnp.int32))
        return jnp.concatenate(rows, axis=0)

    def sample_comm(step, call_id, n):
        if not dim_c:
            return None
        c = uniform((a, dim_c, n), step, call_id)
        keep = [0.0 if spec.silent[i] else 1.0 for i in range(a)]
        if all(x == 1.0 for x in keep):
            return c
        return jnp.stack([c[i] * keep[i] for i in range(a)])

    return sample_state, sample_goal, sample_comm


def make_lane_reset(kscn, uniform, n, prep):
    """Shared block-init / per-lane auto-reset sampling for the
    stateful fused kernels (policy rollout/trajectory, MADDPG
    collection): returns ``(init, fresh)``.

    ``init()`` draws the block's initial state on RNG call ids 0/8
    (zero velocity and comm) and returns
    ``(pos0, vel0, obs0, goal0, comm0)``; ``fresh(step, vel)`` draws
    per-lane reset candidates on ids 3/24 and returns
    ``(pos_f, obs_f, goal_f)`` with observations recomputed for the
    fresh state. Keeping this in one place pins the reset convention
    (zero comm at episode start, goal resample per lane) across every
    kernel that persists state."""
    spec = kscn.spec
    sample_state, sample_goal, _ = make_samplers(kscn, uniform)
    e, p, a = spec.n_entities, spec.dim_p, spec.n_agents
    dim_c = spec.dim_c if getattr(kscn, "uses_comm", False) else 0
    f32 = jnp.float32
    zero = jnp.zeros((), jnp.int32)

    def zero_comm():
        return jnp.zeros((a, dim_c, n), f32) if dim_c else None

    def init():
        pos0 = sample_state(zero, 0, n)
        vel0 = jnp.zeros((e, p, n), f32)
        goal0 = sample_goal(zero, 8, n)
        comm0 = zero_comm()
        _, obs0 = kscn.reward_obs(pos0, vel0, comm0, goal0, prep=prep)
        return pos0, vel0, obs0, goal0, comm0

    def fresh(step, vel):
        pos_f = sample_state(step, 3, n)
        goal_f = sample_goal(step, 24, n)
        _, obs_f = kscn.reward_obs(pos_f, jnp.zeros_like(vel),
                                   zero_comm(), goal_f, prep=prep)
        return pos_f, obs_f, goal_f

    return init, fresh



def _generic_rollout_kernel(
    seed_ref, pos_out, vel_out, rew_out, obs_sum_out,
    *, kscn, n_steps: int, horizon: int, block_envs: int,
    interpret: bool = False,
):
    spec = kscn.spec
    a, l, e, p = (spec.n_agents, spec.n_landmarks, spec.n_entities,
                  spec.dim_p)
    n = block_envs
    f32 = jnp.float32

    uniform, seed_hw = make_uniform(seed_ref, interpret)
    seed_hw()
    sample_state, sample_goal, sample_comm = make_samplers(kscn, uniform)
    n_goals = len(tuple(getattr(kscn, "goal_choices", ()) or ()))
    has_comm = bool(spec.dim_c) and getattr(kscn, "uses_comm", False)

    zero = jnp.zeros((), jnp.int32)
    # loop-invariant gather/scatter matrices, built ONCE (Mosaic does
    # not hoist the iota/where chains out of fori_loop)
    prep = kscn.prepare(f32)
    carry0 = [
        sample_state(zero, 0, n),
        jnp.zeros((e, p, n), f32),
        jnp.zeros((1, n), jnp.int32),
        jnp.zeros((kscn.reward_rows, n), f32),
        jnp.zeros((1, n), f32),
    ]
    if n_goals:
        carry0.append(sample_goal(zero, 8, n))
    carry0 = tuple(carry0)

    def body(step, carry):
        pos, vel, t, rew_acc, obs_acc, *extra = carry
        goal = extra[0] if n_goals else None
        move = uniform((a, 2 * p + 1, n), step, 2)
        pos, vel = kscn.physics(pos, vel, move, prep=prep)
        comm = sample_comm(step, 16, n) if has_comm else None
        rew, obs = kscn.reward_obs(pos, vel, comm, goal, prep=prep)
        rew_acc = rew_acc + rew
        obs_acc = obs_acc + jnp.sum(jnp.sum(obs, axis=0), axis=0,
                                    keepdims=True)
        t = t + 1
        if horizon is not None:  # horizon=None: never reset (reference
            done = t >= horizon  # has no termination, env.py:132-135)
            pos = jnp.where(done[None], sample_state(step, 3, n), pos)
            vel = jnp.where(done[None], jnp.zeros_like(vel), vel)
            t = jnp.where(done, 0, t)
        out = [pos, vel, t, rew_acc, obs_acc]
        if n_goals:
            if horizon is not None:
                goal = jnp.where(done, sample_goal(step, 24, n), goal)
            out.append(goal)
        return tuple(out)

    final = jax.lax.fori_loop(0, n_steps, body, carry0)
    pos, vel, t, rew_acc, obs_acc = final[:5]
    pos_out[:] = pos
    vel_out[:] = vel
    rew_out[:] = rew_acc
    obs_sum_out[:] = obs_acc


def pick_block_envs(n_envs: int, requested: int = 1024) -> int:
    """Largest divisor of ``n_envs`` not exceeding ``requested`` (1024 is
    the measured sweet spot — PERF.md); lets any env count work."""
    b = max(1, min(requested, n_envs))
    while n_envs % b:
        b -= 1
    return b


def fused_rollout(
    scenario,
    n_envs: int,
    n_steps: int,
    horizon: int | None = 100,
    block_envs: int = 1024,
    interpret: bool = False,
):
    """Generic fused rollout for any scenario with kernel blocks
    (ops/kernel_scenarios.py): ``run(seed) -> (pos [E,P,N], vel,
    rew_sum [R,N], obs_checksum [1,N])``."""
    from mpe_tpu.ops.kernel_scenarios import KernelScenario, kernel_scenario

    kscn = (scenario if isinstance(scenario, KernelScenario)
            else kernel_scenario(scenario))
    spec = kscn.spec
    block_envs = pick_block_envs(n_envs, block_envs)
    n_blocks = n_envs // block_envs
    e, p = spec.n_entities, spec.dim_p

    kernel = functools.partial(
        _generic_rollout_kernel, kscn=kscn, n_steps=n_steps,
        horizon=horizon, block_envs=block_envs, interpret=interpret)

    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((e, p, block_envs), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e, p, block_envs), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kscn.reward_rows, block_envs), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_envs), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((e, p, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((e, p, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((kscn.reward_rows, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((1, n_envs), jnp.float32),
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(seed, block_offset=0):
        return call(jnp.stack([jnp.asarray(seed, jnp.int32),
                               jnp.asarray(block_offset, jnp.int32)]))

    run.n_blocks = n_blocks
    run.block_envs = block_envs
    return run


def sharded_fused_rollout(
    scenario,
    n_envs: int,
    n_steps: int,
    mesh=None,
    horizon: int | None = 100,
    block_envs: int = 1024,
    interpret: bool = False,
    axis_name: str = "env",
):
    """Multi-device fused rollout: the Pallas kernel runs per-device under
    ``shard_map`` with the env axis sharded over the mesh; each device
    fuses its local blocks. Envs never communicate, so the program stays
    collective-free — this is the fused engine's scale-out path (same
    sharding model as mpe_tpu.parallel.sharded_rollout).

    Device d passes block offset ``d * local_n_blocks`` into the kernel's
    (seed, global block) PRNG mixing, so every lane draws the exact
    stream it would draw in a single-device run of the same total env
    count and block size: **sharded == single-fused per lane** (asserted
    by tests/test_fused.py), and results are reproducible across any
    device count."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from mpe_tpu.parallel import env_mesh

    mesh = mesh if mesh is not None else env_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    assert n_envs % n_dev == 0, (n_envs, n_dev)
    local_envs = n_envs // n_dev
    local_block_envs = pick_block_envs(local_envs, block_envs)
    local_run = fused_rollout(scenario, local_envs, n_steps, horizon=horizon,
                              block_envs=local_block_envs,
                              interpret=interpret)
    local_n_blocks = local_envs // local_block_envs

    # env-minor outputs: env axis is last on every leaf
    out_spec = P(*([None] * 2), axis_name)
    rew_spec = P(None, axis_name)

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P(),
             out_specs=(out_spec, out_spec, rew_spec, rew_spec),
             check_vma=False)
    def run(seed):
        my = jax.lax.axis_index(axis_name)
        return local_run(seed, my * jnp.int32(local_n_blocks))

    run.block_envs = local_block_envs
    return run
