"""Deterministic fused-vs-XLA rollouts: on-chip value parity for the
Pallas kernels.

Interpret-mode tests pin the kernel scenario blocks to the vmapped
implementations on CPU (tests/test_fused.py), but they cannot catch a
Mosaic *lowering* bug that produces wrong-but-finite numbers on real
hardware — and the production kernels are not directly comparable on
hardware because they draw from the on-chip PRNG. This module builds a
deterministic twin of the fused rollout so its values can be compared
element-for-element against the SAME step math compiled by regular XLA
on the same chip (tools/tpu_parity.py drives both on the real TPU):

  - initial state (pos/vel), per-lane goals and a fixed comm table are
    kernel INPUTS instead of PRNG draws;
  - per-step actions come from a stateless int32 hash of
    (step, agent, element) — pure jnp, identical ops under Mosaic and
    XLA (int32 only: the TPU has no uint32->f32 cast, and the hash must
    trace to the same HLO on both paths);
  - no auto-reset, matching the reference's never-terminating semantics
    (reference multiagent/environment.py:132-135).

The physics/reward/obs math is the exact code the production kernels
run (ops/kernel_scenarios.py blocks), so a pass here certifies those
kernels' Mosaic lowering end to end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def hash_uniform_2d(salt, shape, dtype=jnp.float32):
    """U[0,1) from a murmur-style int32 hash of (salt, element index).

    int32 end to end (wrapping multiplies, logical shifts) — no uint32,
    no bitcasts — so Mosaic and XLA lower the identical op sequence and
    produce bit-identical values. 2-D shapes only (>=3-D iota is not
    Mosaic-safe everywhere); callers stack rows for higher ranks."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    h = r * jnp.int32(shape[1]) + c + salt * jnp.int32(-1640531527)
    for cst in (0x85EBCA6B - (1 << 32), 0xC2B2AE35 - (1 << 32)):
        h = h ^ jax.lax.shift_right_logical(h, jnp.int32(16))
        h = h * jnp.int32(cst)
    h = h ^ jax.lax.shift_right_logical(h, jnp.int32(16))
    # top 24 bits are a non-negative int32 -> exact f32 cast
    return (jax.lax.shift_right_logical(h, jnp.int32(8)).astype(dtype)
            * dtype(2.0 ** -24))


def det_moves(spec, step, n, dtype=jnp.float32):
    """Deterministic per-step action one-hot-ish moves [A, 2P+1, N]:
    a pure function of (step, agent, element) via the shared hash."""
    mw = 2 * spec.dim_p + 1
    rows = [
        hash_uniform_2d(step * jnp.int32(131071) + jnp.int32(7 * i + 3),
                        (mw, n), dtype)
        for i in range(spec.n_agents)
    ]
    return jnp.stack(rows)


def make_det_rollout(kscn, n_steps: int):
    """Pure-jnp deterministic rollout over the kernel scenario blocks:
    ``(pos0, vel0, comm0, goal0) -> (pos, vel, rew_sum, rew_last,
    obs_last)``. This exact function body runs inside the Pallas kernel
    AND under plain jit — one code path, two compilers."""
    spec = kscn.spec
    has_goal = len(tuple(kscn.goal_choices or ())) > 0
    has_comm = bool(kscn.uses_comm and spec.dim_c)

    def rollout(pos0, vel0, comm0, goal0):
        n = pos0.shape[-1]
        f32 = jnp.float32
        rew0 = jnp.zeros((kscn.reward_rows, n), f32)
        obs0 = jnp.zeros((spec.n_agents, kscn.obs_w, n), f32)
        comm = comm0 if has_comm else None
        goal = goal0 if has_goal else None
        prep = kscn.prepare(pos0.dtype)

        def body(step, carry):
            pos, vel, rew_sum, _, _ = carry
            move = det_moves(spec, step, n)
            pos, vel = kscn.physics(pos, vel, move, prep=prep)
            rew, obs = kscn.reward_obs(pos, vel, comm, goal, prep=prep)
            return (pos, vel, rew_sum + rew, rew, obs)

        return jax.lax.fori_loop(
            0, n_steps, body, (pos0, vel0, rew0, rew0, obs0))

    return rollout


def _det_kernel(pos_ref, vel_ref, comm_ref, goal_ref,
                pos_out, vel_out, rew_sum_out, rew_out, obs_out,
                *, kscn, n_steps: int):
    rollout = make_det_rollout(kscn, n_steps)
    pos, vel, rew_sum, rew, obs = rollout(
        pos_ref[:], vel_ref[:], comm_ref[:], goal_ref[:])
    pos_out[:] = pos
    vel_out[:] = vel
    rew_sum_out[:] = rew_sum
    rew_out[:] = rew
    obs_out[:] = obs


def _resolve(scenario):
    from mpe_tpu.ops.kernel_scenarios import KernelScenario, kernel_scenario

    return (scenario if isinstance(scenario, KernelScenario)
            else kernel_scenario(scenario))


def det_input_shapes(kscn, n_envs: int):
    """Canonical input shapes (dummies of width 1 where a scenario has
    no comm/goals, so the kernel signature is uniform)."""
    spec = kscn.spec
    a, e, p = spec.n_agents, spec.n_entities, spec.dim_p
    dim_c = spec.dim_c if kscn.uses_comm else 0
    n_goals = len(tuple(kscn.goal_choices or ()))
    return (
        (e, p, n_envs),                      # pos0
        (e, p, n_envs),                      # vel0
        (a, max(dim_c, 1), n_envs),          # comm0
        (max(n_goals, 1), n_envs),           # goal0 (int32)
    )


def make_det_inputs(scenario, n_envs: int, seed: int = 0):
    """Host-side deterministic inputs: positions uniform in the
    scenario's reset ranges, small random velocities (exercises the
    max-speed clamp), silent-masked comm utterances, valid goal
    indices."""
    kscn = _resolve(scenario)
    spec = kscn.spec
    a = spec.n_agents
    sp, sv, sc, sg = det_input_shapes(kscn, n_envs)
    kp, kv, kc, kg = jax.random.split(jax.random.PRNGKey(seed), 4)
    ar, lr = kscn.reset_ranges()
    scale = jnp.concatenate([
        jnp.full((a, 1, 1), ar, jnp.float32),
        jnp.full((spec.n_landmarks, 1, 1), lr, jnp.float32)])
    pos0 = jax.random.uniform(kp, sp, jnp.float32, -1.0, 1.0) * scale
    vel0 = jax.random.uniform(kv, sv, jnp.float32, -0.5, 0.5)
    # non-movable entities have zero velocity in any reachable state
    mov = jnp.asarray(spec.movable, jnp.float32).reshape(-1, 1, 1)
    vel0 = vel0 * mov
    comm0 = jax.random.uniform(kc, sc, jnp.float32)
    silent = jnp.asarray(spec.silent[:a], jnp.float32).reshape(-1, 1, 1)
    comm0 = comm0 * (1.0 - silent)
    choices = tuple(kscn.goal_choices or ()) or (1,)
    cols = [jax.random.randint(jax.random.fold_in(kg, i), (1, n_envs), 0, k,
                               jnp.int32)
            for i, k in enumerate(choices)]
    goal0 = jnp.concatenate(cols, axis=0)
    return pos0, vel0, comm0, goal0


def fused_det_rollout(scenario, n_envs: int, n_steps: int,
                      block_envs: int = 1024, interpret: bool = False):
    """The Pallas (Mosaic-compiled) side: ``run(pos0, vel0, comm0,
    goal0) -> (pos, vel, rew_sum, rew_last, obs_last)``, gridded over
    env blocks like the production kernels."""
    from mpe_tpu.ops.fused_rollout import pick_block_envs

    kscn = _resolve(scenario)
    spec = kscn.spec
    block_envs = pick_block_envs(n_envs, block_envs)
    n_blocks = n_envs // block_envs
    a, e, p = spec.n_agents, spec.n_entities, spec.dim_p
    sp, sv, sc, sg = det_input_shapes(kscn, block_envs)

    kernel = functools.partial(_det_kernel, kscn=kscn, n_steps=n_steps)

    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(sp, lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(sv, lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(sc, lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(sg, lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((e, p, block_envs), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e, p, block_envs), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kscn.reward_rows, block_envs), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kscn.reward_rows, block_envs), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a, kscn.obs_w, block_envs), lambda i: (0, 0, i),
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
            jax.ShapeDtypeStruct((kscn.reward_rows, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((a, kscn.obs_w, n_envs), jnp.float32),
        ),
        interpret=interpret,
    )
    return jax.jit(call)


def xla_det_rollout(scenario, n_steps: int):
    """The XLA-compiled side: the identical rollout body under plain
    jit. On the same chip, any value divergence from
    ``fused_det_rollout`` is a Mosaic-vs-XLA compilation difference."""
    kscn = _resolve(scenario)
    return jax.jit(make_det_rollout(kscn, n_steps))


def xla_det_rollout_blocked(scenario, n_steps: int, block_envs: int):
    """XLA side evaluated per env block and re-concatenated: the action
    hash indexes lanes *within* a block, so a multi-block fused grid
    must be compared against the XLA body applied to the same block
    slices (identical per-lane streams)."""
    kscn = _resolve(scenario)
    roll = make_det_rollout(kscn, n_steps)

    def run(pos0, vel0, comm0, goal0):
        n = pos0.shape[-1]
        assert n % block_envs == 0
        outs = [
            roll(pos0[..., i : i + block_envs],
                 vel0[..., i : i + block_envs],
                 comm0[..., i : i + block_envs],
                 goal0[..., i : i + block_envs])
            for i in range(0, n, block_envs)
        ]
        return tuple(jnp.concatenate(parts, axis=-1)
                     for parts in zip(*outs))

    return jax.jit(run)
