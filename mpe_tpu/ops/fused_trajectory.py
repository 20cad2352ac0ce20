"""Pallas fused rollout with trajectory emission — any scenario.

Extends the VMEM-resident rollout (mpe_tpu/ops/fused_rollout.py) to
stream ``(obs, actions, rewards)`` per step back to HBM — the batch a
learner consumes — while the simulation state itself never leaves VMEM.

Shape of the computation:
  - grid = (env blocks, time chunks); TPU iterates the last grid dim
    fastest, so each env block processes all of its time chunks
    consecutively.
  - world state (pos/vel/t, plus per-lane goal indices for goal
    scenarios) lives in VMEM **scratch**, which persists across grid
    steps: it is (re)initialized when a block's first chunk starts and
    carried through that block's remaining chunks.
  - each grid step runs ``t_chunk`` env steps with a ``fori_loop`` and
    writes rows of its [t_chunk, ...] VMEM output block; Pallas's output
    pipeline overlaps the block's HBM writeback with the next chunk's
    compute (double buffering per pallas_guide.md).
  - HBM traffic is exactly the trajectory (what the learner must read
    anyway) — none of the step's intermediates ever leave the chip.
  - emitted actions are the full reference-format width: move one-hots
    [A, 5, N] plus raw comm utterances [A, C, N] for comm scenarios.

Scenario physics/reward/obs come from ops/kernel_scenarios.py (pinned to
the parity-tested vmapped implementations by tests/test_fused.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpe_tpu.ops.fused_rollout import make_samplers, make_uniform


def _traj_kernel(
    seed_ref, obs_out, act_out, rew_out, pos_out, vel_out,
    pos_s, vel_s, t_s, *maybe_goal_s,
    kscn, t_chunk: int, horizon: int, block_envs: int, interpret: bool,
):
    spec = kscn.spec
    a, l, e, p = (spec.n_agents, spec.n_landmarks, spec.n_entities,
                  spec.dim_p)
    n = block_envs
    f32 = jnp.float32
    chunk_j = pl.program_id(1)
    goal_choices = tuple(kscn.goal_choices or ())
    n_goals = len(goal_choices)
    dim_c = spec.dim_c if kscn.uses_comm else 0
    goal_s = maybe_goal_s[0] if n_goals else None

    # interpret path needs per-chunk salt (stateless hash); the hardware
    # PRNG is stateful, so it is seeded once per block (chunk 0) and the
    # stream carries across that block's consecutive chunks
    uniform, seed_hw = make_uniform(
        seed_ref, interpret, *((chunk_j,) if interpret else ()))
    sample_state, sample_goal, sample_comm = make_samplers(kscn, uniform)

    zero = jnp.zeros((), jnp.int32)
    prep = kscn.prepare(f32)

    @pl.when(chunk_j == 0)
    def _init_block():
        seed_hw()
        pos_s[:] = sample_state(zero, 0, n)
        vel_s[:] = jnp.zeros((e, p, n), f32)
        t_s[:] = jnp.zeros((1, n), jnp.int32)
        if n_goals:
            goal_s[:] = sample_goal(zero, 8, n)

    def body(step, _):
        pos, vel, t = pos_s[:], vel_s[:], t_s[:]
        goal = goal_s[:] if n_goals else None
        move = uniform((a, 2 * p + 1, n), step, 2)
        pos, vel = kscn.physics(pos, vel, move, prep=prep)
        comm = sample_comm(step, 16, n) if dim_c else None
        rew, obs = kscn.reward_obs(pos, vel, comm, goal, prep=prep)
        obs_out[pl.ds(step, 1)] = obs[None]
        act = (jnp.concatenate([move, comm], axis=1) if dim_c else move)
        act_out[pl.ds(step, 1)] = act[None]
        rew_out[pl.ds(step, 1)] = rew[None]
        # per-lane horizon auto-reset
        t = t + 1
        done = t >= horizon
        pos_s[:] = jnp.where(done[None], sample_state(step, 3, n), pos)
        vel_s[:] = jnp.where(done[None], jnp.zeros_like(vel), vel)
        t_s[:] = jnp.where(done, 0, t)
        if n_goals:
            goal_s[:] = jnp.where(done, sample_goal(step, 24, n), goal)
        return 0

    jax.lax.fori_loop(0, t_chunk, body, 0)
    pos_out[:] = pos_s[:]
    vel_out[:] = vel_s[:]


def fused_trajectory(
    scenario,
    n_envs: int,
    n_steps: int,
    horizon: int = 100,
    block_envs: int = 1024,
    t_chunk: int = 8,
    interpret: bool = False,
):
    """Build ``run(seed) -> (obs [T,A,OW,N], actions [T,A,5+C,N],
    rewards [T,R,N], pos [E,P,N], vel [E,P,N])`` — env-minor trajectory
    batches streamed from the fused rollout, for any kernel scenario."""
    from mpe_tpu.ops.kernel_scenarios import KernelScenario, kernel_scenario

    kscn = (scenario if isinstance(scenario, KernelScenario)
            else kernel_scenario(scenario))
    spec = kscn.spec
    from mpe_tpu.ops.fused_rollout import pick_block_envs

    block_envs = pick_block_envs(n_envs, block_envs)
    assert n_steps % t_chunk == 0
    n_blocks = n_envs // block_envs
    n_chunks = n_steps // t_chunk
    a, e, p = spec.n_agents, spec.n_entities, spec.dim_p
    dim_c = spec.dim_c if kscn.uses_comm else 0
    act_w = 2 * p + 1 + dim_c
    obs_w = kscn.obs_w
    rr = kscn.reward_rows
    n_goals = len(tuple(kscn.goal_choices or ()))

    kernel = functools.partial(
        _traj_kernel, kscn=kscn, t_chunk=t_chunk, horizon=horizon,
        block_envs=block_envs, interpret=interpret)

    scratch = [
        pltpu.VMEM((e, p, block_envs), jnp.float32),   # pos
        pltpu.VMEM((e, p, block_envs), jnp.float32),   # vel
        pltpu.VMEM((1, block_envs), jnp.int32),        # per-lane t
    ]
    if n_goals:
        scratch.append(pltpu.VMEM((n_goals, block_envs), jnp.int32))

    grid_spec = pl.GridSpec(
        grid=(n_blocks, n_chunks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((t_chunk, a, obs_w, block_envs),
                         lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, a, act_w, block_envs),
                         lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, rr, block_envs),
                         lambda i, j: (j, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, p, block_envs),
                         lambda i, j: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, p, block_envs),
                         lambda i, j: (0, 0, i), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, a, obs_w, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, a, act_w, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, rr, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((e, p, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((e, p, n_envs), jnp.float32),
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


def fused_spread_trajectory(spec, n_envs, n_steps, horizon=100,
                            block_envs=1024, t_chunk=8, interpret=False):
    """Back-compat wrapper: the spread instance of ``fused_trajectory``."""
    from mpe_tpu.ops.kernel_scenarios import KernelSpread

    return fused_trajectory(KernelSpread(spec), n_envs, n_steps,
                            horizon=horizon, block_envs=block_envs,
                            t_chunk=t_chunk, interpret=interpret)
