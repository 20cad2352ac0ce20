"""Pallas fused policy-in-the-loop rollout: env + MLP inference in one
kernel, for any kernel scenario.

The serving-shaped hot path: a trained (or candidate) policy is evaluated
by rolling out thousands of envs — obs -> MLP -> sample -> step — with
*everything* on-chip: world state in VMEM, the policy's matmuls on the
MXU, categorical sampling via on-chip PRNG Gumbel-max, per-lane horizon
auto-reset. HBM traffic per call is just the weights in (once) and the
per-env return accumulators out, independent of rollout length. Use
cases: policy evaluation, population-based search, league play.

Policy: the parameter-shared 2-hidden-layer tanh MLP of
mpe_tpu.learner.pg (init_policy format) over the padded observation rows;
output width is 5 (move logits) plus dim_c (comm logits) for comm
scenarios — the same layout the reference's Discrete/MultiDiscrete
action spaces imply. Weights are kernel *inputs* (Pallas kernels cannot
capture array constants); the builder transposes them to MXU-friendly
[out, in] layout. All A agents' observations are concatenated along the
lane axis so each layer is ONE [H, in] @ [in, A*N] matmul.

Sampling: Gumbel-max — argmax_k(logit_k + g_k), g = -log(-log(U)) —
exactly a categorical draw from softmax(logits), computed with unrolled
row comparisons (no argmax-over-leading-axis, which Mosaic dislikes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpe_tpu.ops.fused_rollout import make_lane_reset, make_uniform


def _argmax_onehot(z, f32=jnp.float32):
    """[K, M] scores -> first-max one-hot [K, M] (the ``jnp.argmax``
    tie-break, kernel dialect: unrolled row max + cumulative mask)."""
    k = z.shape[0]
    zmax = z[0:1]                                             # stay 2-D
    for r in range(1, k):
        zmax = jnp.maximum(zmax, z[r : r + 1])
    onehot = (z >= zmax).astype(f32)
    taken = jnp.zeros_like(onehot[0:1])
    rows = []
    for r in range(k):
        row = onehot[r : r + 1] * (1.0 - taken)
        taken = jnp.minimum(taken + row, 1.0)
        rows.append(row)
    return jnp.concatenate(rows, axis=0)


def _gumbel_onehot(logits, u, f32=jnp.float32):
    """[K, M] logits + U[0,1) -> one-hot categorical sample [K, M].
    Ties are measure-zero under continuous gumbel noise; first-max
    tie-break keeps it deterministic anyway."""
    return _argmax_onehot(logits - jnp.log(-jnp.log(u + 1e-12) + 1e-12),
                          f32)


def _policy_sample(kscn, w1, b1, w2, b2, w3, b3, obs, uniform, step):
    """obs [A, OW, N] -> (move one-hots [A, 5, N], comm one-hots
    [A, C, N] or None) via MXU MLP + Gumbel-max."""
    spec = kscn.spec
    a = spec.n_agents
    mw = 2 * spec.dim_p + 1
    dim_c = spec.dim_c if kscn.uses_comm else 0
    n = obs.shape[-1]
    f32 = jnp.float32
    # concat agents along lanes: [OW, A*N] — one matmul per layer
    x = jnp.concatenate([obs[i] for i in range(a)], axis=1)
    h = jnp.tanh(jnp.dot(w1, x, preferred_element_type=f32) + b1)
    h = jnp.tanh(jnp.dot(w2, h, preferred_element_type=f32) + b2)
    logits = jnp.dot(w3, h, preferred_element_type=f32) + b3  # [5+C, A*N]

    move = _gumbel_onehot(logits[:mw], uniform((mw, a * n), step, 7))
    move = jnp.stack([move[:, i * n:(i + 1) * n] for i in range(a)])
    if not dim_c:
        return move, None
    comm = _gumbel_onehot(logits[mw:], uniform((dim_c, a * n), step, 9))
    comm_rows = []
    for i in range(a):
        c = comm[:, i * n:(i + 1) * n]
        comm_rows.append(jnp.zeros_like(c) if spec.silent[i] else c)
    return move, jnp.stack(comm_rows)


def _policy_rollout_kernel(
    seed_ref, w1, b1, w2, b2, w3, b3,
    ret_out, pos_out, len_out,
    *, kscn, n_steps: int, horizon: int, block_envs: int,
    interpret: bool,
):
    spec = kscn.spec
    a, l, e, p = (spec.n_agents, spec.n_landmarks, spec.n_entities,
                  spec.dim_p)
    n = block_envs
    f32 = jnp.float32
    goal_choices = tuple(kscn.goal_choices or ())
    n_goals = len(goal_choices)
    uniform, seed_hw = make_uniform(seed_ref, interpret)
    seed_hw()
    prep = kscn.prepare(f32)
    lane_init, lane_fresh = make_lane_reset(kscn, uniform, n, prep)
    pos0, vel0, obs0, goal0, _ = lane_init()

    carry0 = [
        pos0, vel0, obs0,
        jnp.zeros((1, n), jnp.int32),     # per-lane t
        jnp.zeros((kscn.reward_rows, n), f32),  # return accumulator
        jnp.zeros((1, n), f32),           # episodes completed per lane
    ]
    if n_goals:
        carry0.append(goal0)
    carry0 = tuple(carry0)

    def body(step, carry):
        pos, vel, obs, t, ret_acc, eps, *extra = carry
        goal = extra[0] if n_goals else None
        move, comm = _policy_sample(
            kscn, w1[:], b1[:], w2[:], b2[:], w3[:], b3[:], obs, uniform,
            step)
        pos, vel = kscn.physics(pos, vel, move, prep=prep)
        rew, obs = kscn.reward_obs(pos, vel, comm, goal, prep=prep)
        ret_acc = ret_acc + rew
        t = t + 1
        done = t >= horizon
        eps = eps + done.astype(f32)
        # auto-reset (recompute obs for resampled lanes)
        pos_f, obs_f, goal_f = lane_fresh(step, vel)
        pos = jnp.where(done[None], pos_f, pos)
        vel = jnp.where(done[None], jnp.zeros_like(vel), vel)
        obs = jnp.where(done[None], obs_f, obs)
        t = jnp.where(done, 0, t)
        out = [pos, vel, obs, t, ret_acc, eps]
        if n_goals:
            out.append(jnp.where(done, goal_f, goal))
        return tuple(out)

    final = jax.lax.fori_loop(0, n_steps, body, carry0)
    pos, vel, obs, t, ret_acc, eps = final[:6]
    ret_out[:] = ret_acc
    pos_out[:] = pos
    len_out[:] = eps


def fused_policy_rollout(
    scenario_or_spec,
    params,
    n_envs: int,
    n_steps: int,
    horizon: int = 100,
    block_envs: int = 1024,
    interpret: bool = False,
):
    """Build ``run(seed, params) -> (returns [R, N], pos [E, P, N],
    episodes [1, N])`` — a full policy-evaluation rollout in one kernel.

    ``params`` (only shapes are used at build time) is the
    mpe_tpu.learner.init_policy pytree with ``obs_dim = kscn.obs_w`` and
    ``act_dim = 5 + dim_c`` (comm scenarios) or 5; pass (possibly
    updated) params of the same shapes at call time.
    """
    from mpe_tpu.core.state import ScenarioSpec
    from mpe_tpu.ops.kernel_scenarios import (
        KernelScenario, KernelSpread, kernel_scenario)

    if isinstance(scenario_or_spec, KernelScenario):
        kscn = scenario_or_spec
    elif isinstance(scenario_or_spec, ScenarioSpec):
        # back-compat: a bare spread spec (the original API)
        kscn = KernelSpread(scenario_or_spec)
    else:
        kscn = kernel_scenario(scenario_or_spec)
    spec = kscn.spec
    from mpe_tpu.ops.fused_rollout import pick_block_envs

    block_envs = pick_block_envs(n_envs, block_envs)
    n_blocks = n_envs // block_envs
    e, p = spec.n_entities, spec.dim_p

    kernel = functools.partial(
        _policy_rollout_kernel, kscn=kscn, n_steps=n_steps,
        horizon=horizon, block_envs=block_envs, interpret=interpret)

    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)],
        out_specs=(
            pl.BlockSpec((kscn.reward_rows, block_envs), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e, p, block_envs), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_envs), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((kscn.reward_rows, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((e, p, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((1, n_envs), jnp.float32),
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(seed, params, block_offset=0):
        seeds = jnp.stack([jnp.asarray(seed, jnp.int32),
                           jnp.asarray(block_offset, jnp.int32)])
        return call(seeds, *_kernel_weights(params))

    run.n_blocks = n_blocks
    run.block_envs = block_envs
    return run


def _kernel_weights(params):
    """learner.init_policy pytree -> the kernel's MXU-layout weight
    inputs (w [out, in] f32, b [out, 1] f32)."""
    f32 = jnp.float32
    return (
        params["l1"]["w"].T.astype(f32), params["l1"]["b"].astype(f32)[:, None],
        params["l2"]["w"].T.astype(f32), params["l2"]["b"].astype(f32)[:, None],
        params["out"]["w"].T.astype(f32), params["out"]["b"].astype(f32)[:, None],
    )


def _onehot_index(onehot, f32=jnp.float32):
    """[A, K, N] one-hots -> [A, N] int32 indices (unrolled weighted
    sum; exact for 0/1 values)."""
    k = onehot.shape[1]
    idx = onehot[:, 1]
    for r in range(2, k):
        idx = idx + onehot[:, r] * f32(r)
    return idx.astype(jnp.int32)


def _policy_traj_kernel(
    seed_ref, w1, b1, w2, b2, w3, b3, *refs,
    kscn, t_chunk: int, horizon: int, block_envs: int, interpret: bool,
):
    """Grid (env blocks, time chunks): policy-in-the-loop rollout that
    streams the learner batch — (obs the policy acted on, sampled action
    indices, rewards) — to HBM while world state + current obs persist in
    VMEM scratch across a block's chunks (same pipeline shape as
    ops/fused_trajectory._traj_kernel)."""
    spec = kscn.spec
    a, e, p = spec.n_agents, spec.n_entities, spec.dim_p
    n = block_envs
    f32 = jnp.float32
    chunk_j = pl.program_id(1)
    n_goals = len(tuple(kscn.goal_choices or ()))
    dim_c = spec.dim_c if kscn.uses_comm else 0

    n_outs = 5 if dim_c else 4
    if dim_c:
        obs_out, act_out, cact_out, rew_out, lastobs_out = refs[:n_outs]
    else:
        obs_out, act_out, rew_out, lastobs_out = refs[:n_outs]
        cact_out = None
    scratch = refs[n_outs:]
    pos_s, vel_s, obs_s, t_s = scratch[:4]
    goal_s = scratch[4] if n_goals else None

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
        move, comm = _policy_sample(
            kscn, w1[:], b1[:], w2[:], b2[:], w3[:], b3[:], obs, uniform,
            step)
        pos, vel = kscn.physics(pos, vel, move, prep=prep)
        rew, obs_next = kscn.reward_obs(pos, vel, comm, goal, prep=prep)
        obs_out[pl.ds(step, 1)] = obs[None]
        act_out[pl.ds(step, 1)] = _onehot_index(move)[None]
        if cact_out is not None:
            cact_out[pl.ds(step, 1)] = _onehot_index(comm)[None]
        rew_out[pl.ds(step, 1)] = rew[None]
        # per-lane horizon auto-reset (obs recomputed for fresh lanes)
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
    lastobs_out[:] = obs_s[:]


def fused_policy_trajectory(
    scenario,
    params,
    n_envs: int,
    n_steps: int,
    horizon: int = 100,
    block_envs: int = 1024,
    t_chunk: int = 8,
    interpret: bool = False,
    hash_rng: bool = False,
):
    """Build ``run(seed, params) -> (obs [T, A, OW, N], act [T, A, N]
    int32, [cact [T, A, N] int32 if the scenario has comm,] rew [R, N]
    per step as [T, R, N], last_obs [A, OW, N])`` — the on-policy learner
    batch collected entirely on-chip: obs -> MLP (MXU) -> Gumbel-max
    sample -> physics -> reward, with only the trajectory leaving VMEM.

    ``obs[t]`` is the observation the policy ACTED on at step t (so
    ``(obs[t], act[t], rew[t])`` is the standard transition triple and
    ``last_obs`` bootstraps GAE); action indices are exact (one-hot
    contraction), and because all lanes start at t=0 and auto-reset on
    the shared ``horizon``, done flags are the deterministic
    ``(t + 1) % horizon == 0`` — computed host-side, not emitted.
    ``params`` is a learner.init_policy-format pytree (only shapes used
    at build time)."""
    from mpe_tpu.core.state import ScenarioSpec
    from mpe_tpu.ops.fused_rollout import pick_block_envs
    from mpe_tpu.ops.kernel_scenarios import (
        KernelScenario, KernelSpread, kernel_scenario)

    if isinstance(scenario, KernelScenario):
        kscn = scenario
    elif isinstance(scenario, ScenarioSpec):
        kscn = KernelSpread(scenario)
    else:
        kscn = kernel_scenario(scenario)
    spec = kscn.spec
    block_envs = pick_block_envs(n_envs, block_envs)
    assert n_steps % t_chunk == 0, (n_steps, t_chunk)
    n_blocks = n_envs // block_envs
    n_chunks = n_steps // t_chunk
    a, e, p = spec.n_agents, spec.n_entities, spec.dim_p
    dim_c = spec.dim_c if kscn.uses_comm else 0
    obs_w = kscn.obs_w
    rr = kscn.reward_rows
    n_goals = len(tuple(kscn.goal_choices or ()))

    # ``hash_rng`` compiles the kernel normally (Mosaic) but draws from
    # the deterministic hash PRNG the interpret path uses, so the same
    # builder run twice (interpret=True vs hash_rng=True) is comparable
    # element-for-element on chip (tools/tpu_train_parity.py)
    kernel = functools.partial(
        _policy_traj_kernel, kscn=kscn, t_chunk=t_chunk, horizon=horizon,
        block_envs=block_envs, interpret=interpret or hash_rng)

    scratch = [
        pltpu.VMEM((e, p, block_envs), jnp.float32),        # pos
        pltpu.VMEM((e, p, block_envs), jnp.float32),        # vel
        pltpu.VMEM((a, obs_w, block_envs), jnp.float32),    # current obs
        pltpu.VMEM((1, block_envs), jnp.int32),             # per-lane t
    ]
    if n_goals:
        scratch.append(pltpu.VMEM((n_goals, block_envs), jnp.int32))

    out_specs = [
        pl.BlockSpec((t_chunk, a, obs_w, block_envs),
                     lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((t_chunk, a, block_envs),
                     lambda i, j: (j, 0, i), memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((n_steps, a, obs_w, n_envs), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, a, n_envs), jnp.int32),
    ]
    if dim_c:
        out_specs.append(
            pl.BlockSpec((t_chunk, a, block_envs),
                         lambda i, j: (j, 0, i), memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((n_steps, a, n_envs), jnp.int32))
    out_specs += [
        pl.BlockSpec((t_chunk, rr, block_envs),
                     lambda i, j: (j, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((a, obs_w, block_envs),
                     lambda i, j: (0, 0, i), memory_space=pltpu.VMEM),
    ]
    out_shapes += [
        jax.ShapeDtypeStruct((n_steps, rr, n_envs), jnp.float32),
        jax.ShapeDtypeStruct((a, obs_w, n_envs), jnp.float32),
    ]

    grid_spec = pl.GridSpec(
        grid=(n_blocks, n_chunks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )

    @jax.jit
    def run(seed, params, block_offset=0):
        seeds = jnp.stack([jnp.asarray(seed, jnp.int32),
                           jnp.asarray(block_offset, jnp.int32)])
        return call(seeds, *_kernel_weights(params))

    run.n_blocks = n_blocks
    run.block_envs = block_envs
    run.has_comm = bool(dim_c)
    return run
