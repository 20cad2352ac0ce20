"""Fused replay collection for MADDPG: per-agent actor networks, ε-greedy
Gumbel-max exploration, and (s, a, r, s') emission — all inside one
Pallas kernel.

MADDPG (learner/maddpg.py) trains off-policy from a replay buffer of
transitions ``(obs, action one-hots, rewards, true pre-reset next obs)``
(maddpg.py collect_fn; bootstrap-through-time-limit semantics). The XLA
collector steps ONE env step per host dispatch — through the tunneled
TPU that is ~100 ms per transition batch. This kernel collects
``n_steps`` transitions per dispatch with world state resident in VMEM,
exactly like ops/fused_policy.fused_policy_trajectory, with two
differences required by MADDPG:

  - every agent has its OWN network (the paper's heterogeneous setup),
    so the layers are per-agent matmuls on the MXU (weights carry a
    leading [A] axis; lane-concatenation across agents needs shared
    weights and does not apply);
  - exploration matches learner/maddpg.act: per factorized head (move,
    and comm when the scenario speaks), a Gumbel-max categorical draw
    from the actor logits (identical in distribution to the
    straight-through Gumbel-softmax's hard forward sample — argmax of
    (logits+g)/tau is argmax of (logits+g) for any tau), ε-mixed with a
    uniform random one-hot.

Comm scenarios (speaker_listener, reference, world_comm, crypto): the
actor rows are ``[move one-hot | comm one-hot]`` (width
``5 + dim_c``, learner.maddpg.maddpg_act_dim); the RAW sampled comm is
stored in the replay rows (what the XLA collect_fn stores) while the
comm fed to the world dynamics has silent agents zeroed — the decoder
semantics of core/actions.py:94-95. Goal-conditioned scenarios carry
their goal stream in VMEM scratch and resample it on lane reset, like
ops/fused_policy; goals reach the learner through the observation
encoding, so the buffer layout is unchanged.

``obs2[t]`` is the TRUE next observation before any horizon reset (the
stored s' used for TD bootstrapping through truncation); lanes then
auto-reset. For non-boundary steps ``obs2[t] == obs[t+1]`` exactly —
asserted by tests/test_fused_maddpg.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpe_tpu.ops.fused_policy import _gumbel_onehot
from mpe_tpu.ops.fused_rollout import make_lane_reset, make_uniform


def _peragent_sample(kscn, w1, b1, w2, b2, w3, b3, obs, uniform, step,
                     eps_greedy):
    """obs [A, OW, N] -> (raw actions [A, AW, N], dynamics comm
    [A, C, N] or None) via per-agent MLPs + per-head Gumbel-max,
    ε-mixed with uniform one-hots. AW = 5 (+ dim_c when the scenario
    speaks); dynamics comm has silent agents zeroed, the stored rows
    keep the raw sample (matching learner/maddpg collect_fn)."""
    spec = kscn.spec
    a = spec.n_agents
    mw = 2 * spec.dim_p + 1
    dim_c = spec.dim_c if kscn.uses_comm else 0
    n = obs.shape[-1]
    f32 = jnp.float32

    # interpret-mode draws are salted per (step, call_id) with a 64-id
    # window per step (make_uniform); ids 0-27 are taken by the state /
    # goal samplers, so the agents get a compact 6-id block each in
    # [28, 64): 3 ids per head (gumbel, eps one-hot, eps coin)
    assert 28 + 6 * a <= 64, (
        f"{a} agents need {6 * a} RNG call ids; the 64-id salt window "
        "only fits 6 agents of two 3-id heads")

    def head(logits, width, salt):
        samp = _gumbel_onehot(logits, uniform((width, n), step, salt))
        if eps_greedy > 0.0:
            rand = _gumbel_onehot(jnp.zeros_like(logits),
                                  uniform((width, n), step, salt + 1))
            take = (uniform((1, n), step, salt + 2)
                    < eps_greedy).astype(f32)
            samp = take * rand + (1.0 - take) * samp
        return samp

    rows, comm_rows = [], []
    for i in range(a):
        h = jnp.tanh(jnp.dot(w1[i], obs[i], preferred_element_type=f32)
                     + b1[i])
        h = jnp.tanh(jnp.dot(w2[i], h, preferred_element_type=f32)
                     + b2[i])
        logits = jnp.dot(w3[i], h, preferred_element_type=f32) + b3[i]
        base = 28 + 6 * i
        parts = [head(logits[:mw], mw, base)]
        if dim_c:
            comm = head(logits[mw:], dim_c, base + 3)
            parts.append(comm)
            comm_rows.append(jnp.zeros_like(comm) if spec.silent[i]
                             else comm)
        rows.append(jnp.concatenate(parts, axis=0) if dim_c else parts[0])
    return (jnp.stack(rows),
            jnp.stack(comm_rows) if dim_c else None)    # [A, AW, N]


def _maddpg_traj_kernel(
    seed_ref, w1, b1, w2, b2, w3, b3,
    *outs_and_scratch,
    kscn, t_chunk: int, horizon: int, block_envs: int,
    eps_greedy: float, interpret: bool, emit_rows: bool = False,
):
    if emit_rows:
        # ONE replay-row output [t_chunk, N, W]: the kernel transposes
        # each step's [W, N] column stack in VMEM, so the XLA-side
        # rowize relayout (moveaxis+reshape+concat over the whole 85MB
        # chunk at 4096 envs) disappears from the collect path
        (rows_out, pos_s, vel_s, obs_s, t_s,
         *maybe_goal_s) = outs_and_scratch
        obs_out = act_out = rew_out = obs2_out = None
    else:
        (obs_out, act_out, rew_out, obs2_out, pos_s, vel_s, obs_s, t_s,
         *maybe_goal_s) = outs_and_scratch
    spec = kscn.spec
    a, e, p = spec.n_agents, spec.n_entities, spec.dim_p
    n = block_envs
    f32 = jnp.float32
    chunk_j = pl.program_id(1)
    n_goals = len(tuple(kscn.goal_choices or ()))
    goal_s = maybe_goal_s[0] if n_goals else None

    uniform, seed_hw = make_uniform(
        seed_ref, interpret, *((chunk_j,) if interpret else ()))
    prep = kscn.prepare(f32)
    lane_init, lane_fresh = make_lane_reset(kscn, uniform, n, prep)

    @pl.when(chunk_j == 0)
    def _init_block():
        seed_hw()
        pos0, vel0, obs0, goal0, _ = lane_init()
        pos_s[:] = pos0
        vel_s[:] = vel0
        obs_s[:] = obs0
        t_s[:] = jnp.zeros((1, n), jnp.int32)
        if n_goals:
            goal_s[:] = goal0

    def body(step, _):
        pos, vel, t, obs = pos_s[:], vel_s[:], t_s[:], obs_s[:]
        goal = goal_s[:] if n_goals else None
        action, comm = _peragent_sample(kscn, w1, b1, w2, b2, w3, b3, obs,
                                        uniform, step, eps_greedy)
        move = action[:, : 2 * p + 1]
        pos, vel = kscn.physics(pos, vel, move, prep=prep)
        rew, obs_next = kscn.reward_obs(pos, vel, comm, goal, prep=prep)
        if emit_rows:
            # per-agent rewards like learner.fused_ppo._agent_rewards
            # (concat instead of broadcast_to — the [1,N]->[A,N]
            # broadcast trips a Mosaic relayout, CLAUDE.md)
            rew_a = (rew if rew.shape[0] == a
                     else jnp.concatenate([rew] * a, axis=0))
            cols = jnp.concatenate(
                [obs.reshape(-1, n), action.reshape(-1, n), rew_a,
                 obs_next.reshape(-1, n)], axis=0)          # [W, N]
            rows_out[pl.ds(step, 1)] = jnp.transpose(cols)[None]
        else:
            obs_out[pl.ds(step, 1)] = obs[None]
            act_out[pl.ds(step, 1)] = action[None]
            rew_out[pl.ds(step, 1)] = rew[None]
            obs2_out[pl.ds(step, 1)] = obs_next[None]   # TRUE s'
        t = t + 1
        done = t >= horizon
        pos_f, obs_f, goal_f = lane_fresh(step, vel)
        pos_s[:] = jnp.where(done[None], pos_f, pos)
        vel_s[:] = jnp.where(done[None], jnp.zeros_like(vel), vel)
        obs_s[:] = jnp.where(done[None], obs_f, obs_next)
        t_s[:] = jnp.where(done, 0, t)
        if n_goals:
            goal_s[:] = jnp.where(done, goal_f, goal)
        return 0

    jax.lax.fori_loop(0, t_chunk, body, 0)


def _kernel_weights(actor_params):
    """learner.init_maddpg actor pytree (leading [A] axis, [in, out]
    weights) -> MXU-layout kernel inputs ([A, out, in] + [A, out, 1])."""
    t = lambda w: jnp.transpose(w, (0, 2, 1))
    return (t(actor_params["l1"]["w"]), actor_params["l1"]["b"][..., None],
            t(actor_params["l2"]["w"]), actor_params["l2"]["b"][..., None],
            t(actor_params["out"]["w"]), actor_params["out"]["b"][..., None])


def fused_maddpg_trajectory(
    scenario,
    actor_params,
    n_envs: int,
    n_steps: int,
    horizon: int = 25,
    eps_greedy: float = 0.1,
    block_envs: int = 1024,
    t_chunk: int = 8,
    interpret: bool = False,
    hash_rng: bool = False,
    emit_rows: bool = False,
):
    """Build ``run(seed, actor_params) -> (obs [T, A, OW, N],
    act [T, A, AW, N] one-hot f32, rew [T, R, N], obs2 [T, A, OW, N])``
    — a chunk of MADDPG replay transitions collected on-chip.
    ``actor_params`` is the ``params['actor']`` pytree of
    learner.init_maddpg (only shapes used at build time; its output
    width must be 5 + dim_c on comm scenarios —
    learner.maddpg.maddpg_act_dim). Lanes start at t=0 and reset every
    ``horizon`` steps, so collect in horizon-multiples for whole
    episodes.

    ``emit_rows=True`` returns ONE tensor of fused replay-buffer rows
    [T, N, W] (W = A*(2*OW + AW + 1), layout [obs | act | rew_per_agent
    | obs2] — exactly learner.maddpg.Buffer's row layout, with shared
    rewards already broadcast per agent): the kernel transposes each
    step block in VMEM, so ``reshape(T*N, W)`` is the finished insert
    payload and the XLA-side rowize relayout disappears."""
    from mpe_tpu.ops.fused_rollout import pick_block_envs
    from mpe_tpu.ops.kernel_scenarios import KernelScenario, kernel_scenario

    kscn = (scenario if isinstance(scenario, KernelScenario)
            else kernel_scenario(scenario))
    spec = kscn.spec
    block_envs = pick_block_envs(n_envs, block_envs)
    assert n_steps % t_chunk == 0, (n_steps, t_chunk)
    n_blocks = n_envs // block_envs
    n_chunks = n_steps // t_chunk
    a, e, p = spec.n_agents, spec.n_entities, spec.dim_p
    aw = 2 * p + 1 + (spec.dim_c if kscn.uses_comm else 0)
    got = actor_params["out"]["b"].shape[-1]
    assert got == aw, (
        f"actor output width {got} != expected {aw} "
        "(use learner.maddpg.maddpg_act_dim for this scenario)")
    obs_w = kscn.obs_w
    rr = kscn.reward_rows
    n_goals = len(tuple(kscn.goal_choices or ()))

    # hash_rng: Mosaic-compiled kernel drawing from the deterministic
    # hash PRNG (the interpret path's), for on-chip value parity runs
    kernel = functools.partial(
        _maddpg_traj_kernel, kscn=kscn, t_chunk=t_chunk, horizon=horizon,
        block_envs=block_envs, eps_greedy=float(eps_greedy),
        interpret=interpret or hash_rng, emit_rows=emit_rows)

    scratch = [
        pltpu.VMEM((e, p, block_envs), jnp.float32),
        pltpu.VMEM((e, p, block_envs), jnp.float32),
        pltpu.VMEM((a, obs_w, block_envs), jnp.float32),
        pltpu.VMEM((1, block_envs), jnp.int32),
    ]
    if n_goals:
        scratch.append(pltpu.VMEM((n_goals, block_envs), jnp.int32))
    if emit_rows:
        row_w = a * (2 * obs_w + aw + 1)
        out_specs = (
            pl.BlockSpec((t_chunk, block_envs, row_w),
                         lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shapes = (
            jax.ShapeDtypeStruct((n_steps, n_envs, row_w), jnp.float32),
        )
    else:
        out_specs = (
            pl.BlockSpec((t_chunk, a, obs_w, block_envs),
                         lambda i, j: (j, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, a, aw, block_envs),
                         lambda i, j: (j, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, rr, block_envs),
                         lambda i, j: (j, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, a, obs_w, block_envs),
                         lambda i, j: (j, 0, 0, i),
                         memory_space=pltpu.VMEM),
        )
        out_shapes = (
            jax.ShapeDtypeStruct((n_steps, a, obs_w, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, a, aw, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, rr, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, a, obs_w, n_envs), jnp.float32),
        )

    grid_spec = pl.GridSpec(
        grid=(n_blocks, n_chunks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    call = pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=out_shapes, interpret=interpret)

    @jax.jit
    def run(seed, actor_params, block_offset=0):
        seeds = jnp.stack([jnp.asarray(seed, jnp.int32),
                           jnp.asarray(block_offset, jnp.int32)])
        out = call(seeds, *_kernel_weights(actor_params))
        return out[0] if emit_rows else out

    run.n_blocks = n_blocks
    run.block_envs = block_envs
    run.act_width = aw
    return run


def sharded_fused_maddpg_trajectory(
    scenario,
    actor_params,
    n_envs: int,
    n_steps: int,
    mesh=None,
    horizon: int = 25,
    eps_greedy: float = 0.1,
    block_envs: int = 1024,
    t_chunk: int = 8,
    interpret: bool = False,
    axis_name: str = "env",
):
    """Multi-device fused MADDPG collection: the per-agent-network
    kernel runs per device under ``shard_map`` with the env axis sharded
    over the mesh and the actor weights replicated. Envs never
    communicate, so the program is collective-free. Device d passes
    block offset ``d * local_n_blocks`` into the kernel's (seed, global
    block) PRNG mixing, so sharded == single-device per lane for the
    same total env count and block size (asserted by
    tests/test_fused_maddpg.py) — the same scale-out contract as
    ops/fused_rollout.sharded_fused_rollout."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from mpe_tpu.ops.fused_rollout import pick_block_envs
    from mpe_tpu.parallel import env_mesh

    mesh = mesh if mesh is not None else env_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    assert n_envs % n_dev == 0, (n_envs, n_dev)
    local_envs = n_envs // n_dev
    local_block_envs = pick_block_envs(local_envs, block_envs)
    local_run = fused_maddpg_trajectory(
        scenario, actor_params, n_envs=local_envs, n_steps=n_steps,
        horizon=horizon, eps_greedy=eps_greedy,
        block_envs=local_block_envs, t_chunk=t_chunk, interpret=interpret)
    local_n_blocks = local_envs // local_block_envs

    out4 = P(*([None] * 3), axis_name)     # [T, A, W, N] env-minor
    rew_spec = P(None, None, axis_name)    # [T, R, N]

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P(),
             out_specs=(out4, out4, rew_spec, out4),
             check_vma=False)
    def run(seed, actor_params):
        my = jax.lax.axis_index(axis_name)
        return local_run(seed, actor_params,
                         my * jnp.int32(local_n_blocks))

    run.block_envs = local_block_envs
    run.act_width = local_run.act_width
    return run
