"""Pallas fused rollout with trajectory emission.

Extends the VMEM-resident rollout (mpe_tpu/ops/fused_rollout.py) to
stream ``(obs, actions, rewards)`` per step back to HBM — the batch a
learner consumes — while the simulation state itself never leaves VMEM.

Shape of the computation:
  - grid = (env blocks, time chunks); TPU iterates the last grid dim
    fastest, so each env block processes all of its time chunks
    consecutively.
  - world state lives in VMEM **scratch**, which persists across grid
    steps: it is (re)initialized when a block's first chunk starts and
    carried through that block's remaining chunks.
  - each grid step runs ``t_chunk`` env steps with a ``fori_loop`` and
    writes rows of its [t_chunk, ...] VMEM output block; Pallas's output
    pipeline overlaps the block's HBM writeback with the next chunk's
    compute (double buffering per pallas_guide.md).
  - HBM traffic is exactly the trajectory (what the learner must read
    anyway) — none of the step's intermediates ever leave the chip.

Same scalar-specialization rules as fused_rollout.py (no array constants,
unrolled entity loops, >=2D values everywhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpe_tpu.core.state import ScenarioSpec
from mpe_tpu.ops.fused_rollout import make_uniform, spread_step_block


def _traj_kernel(
    seed_ref, obs_out, act_out, rew_out, pos_out, vel_out,
    apos_s, avel_s, lpos_s, t_s,
    *, spec: ScenarioSpec, t_chunk: int, horizon: int, block_envs: int,
    interpret: bool,
):
    a, l, p = spec.n_agents, spec.n_landmarks, spec.dim_p
    n = block_envs
    f32 = jnp.float32
    chunk_j = pl.program_id(1)

    # interpret path needs per-chunk salt (stateless hash); the hardware
    # PRNG is stateful, so it is seeded once per block (chunk 0) and the
    # stream carries across that block's consecutive chunks
    uniform, seed_hw = make_uniform(
        seed_ref, interpret, *( (chunk_j,) if interpret else () ))

    def sample_pos(rows, step, call_id):
        return uniform((rows, p, n), step, call_id) * 2.0 - 1.0

    zero = jnp.zeros((), jnp.int32)

    @pl.when(chunk_j == 0)
    def _init_block():
        seed_hw()
        apos_s[:] = sample_pos(a, zero, 0)
        avel_s[:] = jnp.zeros((a, p, n), f32)
        lpos_s[:] = sample_pos(l, zero, 1)
        t_s[:] = jnp.zeros((1, n), jnp.int32)

    def body(step, _):
        apos, avel, lpos, t = apos_s[:], avel_s[:], lpos_s[:], t_s[:]
        move = uniform((a, 2 * p + 1, n), step, 2)
        apos, avel, rew, obs = spread_step_block(spec, apos, avel, lpos, move)
        obs_out[pl.ds(step, 1)] = obs[None]
        act_out[pl.ds(step, 1)] = move[None]
        rew_out[pl.ds(step, 1)] = rew[None]
        # per-lane horizon auto-reset
        t = t + 1
        done = t >= horizon
        apos_s[:] = jnp.where(done[None], sample_pos(a, step, 3), apos)
        lpos_s[:] = jnp.where(done[None], sample_pos(l, step, 4), lpos)
        avel_s[:] = jnp.where(done[None], jnp.zeros_like(avel), avel)
        t_s[:] = jnp.where(done, 0, t)
        return 0

    jax.lax.fori_loop(0, t_chunk, body, 0)
    pos_out[:] = jnp.concatenate([apos_s[:], lpos_s[:]], axis=0)
    vel_out[:] = jnp.concatenate([avel_s[:], jnp.zeros((l, p, n), f32)],
                                 axis=0)


def fused_spread_trajectory(
    spec: ScenarioSpec,
    n_envs: int,
    n_steps: int,
    horizon: int = 100,
    block_envs: int = 1024,
    t_chunk: int = 8,
    interpret: bool = False,
):
    """Build ``run(seed) -> (obs [T,A,W,N], actions [T,A,5,N],
    rewards [T,1,N], pos [E,P,N], vel [E,P,N])`` — env-minor trajectory
    batches streamed from the fused rollout."""
    assert n_envs % block_envs == 0
    assert n_steps % t_chunk == 0
    n_blocks = n_envs // block_envs
    n_chunks = n_steps // t_chunk
    a, l, e, p = (spec.n_agents, spec.n_landmarks, spec.n_entities,
                  spec.dim_p)
    obs_w = 2 * p + l * p + (a - 1) * p + (a - 1) * spec.dim_c
    mw = 2 * p + 1

    kernel = functools.partial(
        _traj_kernel, spec=spec, t_chunk=t_chunk, horizon=horizon,
        block_envs=block_envs, interpret=interpret)

    grid_spec = pl.GridSpec(
        grid=(n_blocks, n_chunks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((t_chunk, a, obs_w, block_envs),
                         lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, a, mw, block_envs),
                         lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, 1, block_envs),
                         lambda i, j: (j, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, p, block_envs),
                         lambda i, j: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, p, block_envs),
                         lambda i, j: (0, 0, i), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((a, p, block_envs), jnp.float32),   # agent pos
            pltpu.VMEM((a, p, block_envs), jnp.float32),   # agent vel
            pltpu.VMEM((l, p, block_envs), jnp.float32),   # landmark pos
            pltpu.VMEM((1, block_envs), jnp.int32),        # per-lane t
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, a, obs_w, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, a, mw, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, 1, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((e, p, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((e, p, n_envs), jnp.float32),
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(seed):
        return call(jnp.asarray([seed], jnp.int32))

    return run
