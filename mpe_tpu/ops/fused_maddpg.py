"""Fused replay collection for MADDPG: per-agent actor networks, ε-greedy
Gumbel-max exploration, and (s, a, r, s') emission — all inside one
Pallas kernel.

MADDPG (learner/maddpg.py) trains off-policy from a replay buffer of
transitions ``(obs, move one-hots, rewards, true pre-reset next obs)``
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
  - exploration matches learner/maddpg.act: a Gumbel-max categorical
    draw from the actor logits (identical in distribution to the
    straight-through Gumbel-softmax's hard forward sample — argmax of
    (logits+g)/tau is argmax of (logits+g) for any tau), ε-mixed with a
    uniform random one-hot.

``obs2[t]`` is the TRUE next observation before any horizon reset (the
stored s' used for TD bootstrapping through truncation); lanes then
auto-reset. For non-boundary steps ``obs2[t] == obs[t+1]`` exactly —
asserted by tests/test_fused_maddpg.py.

Movement-only scenarios (MADDPG's own action head is movement-only,
maddpg.py act()); comm scenarios are rejected at build time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpe_tpu.ops.fused_policy import _gumbel_onehot
from mpe_tpu.ops.fused_rollout import make_samplers, make_uniform


def _peragent_sample(kscn, w1, b1, w2, b2, w3, b3, obs, uniform, step,
                     eps_greedy):
    """obs [A, OW, N] -> exploratory move one-hots [A, mw, N] via
    per-agent MLPs + Gumbel-max, ε-mixed with uniform one-hots."""
    spec = kscn.spec
    a = spec.n_agents
    mw = 2 * spec.dim_p + 1
    n = obs.shape[-1]
    f32 = jnp.float32

    rows = []
    for i in range(a):
        h = jnp.tanh(jnp.dot(w1[i], obs[i], preferred_element_type=f32)
                     + b1[i])
        h = jnp.tanh(jnp.dot(w2[i], h, preferred_element_type=f32)
                     + b2[i])
        logits = jnp.dot(w3[i], h, preferred_element_type=f32) + b3[i]
        samp = _gumbel_onehot(logits, uniform((mw, n), step, 7 + 8 * i))
        if eps_greedy > 0.0:
            rand = _gumbel_onehot(jnp.zeros_like(logits),
                                  uniform((mw, n), step, 11 + 8 * i))
            take = (uniform((1, n), step, 13 + 8 * i)
                    < eps_greedy).astype(f32)
            samp = take * rand + (1.0 - take) * samp
        rows.append(samp)
    return jnp.stack(rows)                                   # [A, mw, N]


def _maddpg_traj_kernel(
    seed_ref, w1, b1, w2, b2, w3, b3,
    obs_out, act_out, rew_out, obs2_out,
    pos_s, vel_s, obs_s, t_s,
    *, kscn, t_chunk: int, horizon: int, block_envs: int,
    eps_greedy: float, interpret: bool,
):
    spec = kscn.spec
    a, e, p = spec.n_agents, spec.n_entities, spec.dim_p
    n = block_envs
    f32 = jnp.float32
    chunk_j = pl.program_id(1)

    uniform, seed_hw = make_uniform(
        seed_ref, interpret, *((chunk_j,) if interpret else ()))
    sample_state, _, _ = make_samplers(kscn, uniform)
    zero = jnp.zeros((), jnp.int32)
    prep = kscn.prepare(f32)

    @pl.when(chunk_j == 0)
    def _init_block():
        seed_hw()
        pos0 = sample_state(zero, 0, n)
        vel0 = jnp.zeros((e, p, n), f32)
        _, obs0 = kscn.reward_obs(pos0, vel0, None, None, prep=prep)
        pos_s[:] = pos0
        vel_s[:] = vel0
        obs_s[:] = obs0
        t_s[:] = jnp.zeros((1, n), jnp.int32)

    def body(step, _):
        pos, vel, t, obs = pos_s[:], vel_s[:], t_s[:], obs_s[:]
        move = _peragent_sample(kscn, w1, b1, w2, b2, w3, b3, obs,
                                uniform, step, eps_greedy)
        pos, vel = kscn.physics(pos, vel, move, prep=prep)
        rew, obs_next = kscn.reward_obs(pos, vel, None, None, prep=prep)
        obs_out[pl.ds(step, 1)] = obs[None]
        act_out[pl.ds(step, 1)] = move[None]
        rew_out[pl.ds(step, 1)] = rew[None]
        obs2_out[pl.ds(step, 1)] = obs_next[None]   # TRUE s' (pre-reset)
        t = t + 1
        done = t >= horizon
        pos_f = sample_state(step, 3, n)
        _, obs_f = kscn.reward_obs(pos_f, jnp.zeros_like(vel), None,
                                   None, prep=prep)
        pos_s[:] = jnp.where(done[None], pos_f, pos)
        vel_s[:] = jnp.where(done[None], jnp.zeros_like(vel), vel)
        obs_s[:] = jnp.where(done[None], obs_f, obs_next)
        t_s[:] = jnp.where(done, 0, t)
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
):
    """Build ``run(seed, actor_params) -> (obs [T, A, OW, N],
    act [T, A, mw, N] one-hot f32, rew [T, R, N], obs2 [T, A, OW, N])``
    — a chunk of MADDPG replay transitions collected on-chip.
    ``actor_params`` is the ``params['actor']`` pytree of
    learner.init_maddpg (only shapes used at build time). Lanes start at
    t=0 and reset every ``horizon`` steps, so collect in
    horizon-multiples for whole episodes."""
    from mpe_tpu.ops.fused_rollout import pick_block_envs
    from mpe_tpu.ops.kernel_scenarios import KernelScenario, kernel_scenario

    kscn = (scenario if isinstance(scenario, KernelScenario)
            else kernel_scenario(scenario))
    spec = kscn.spec
    assert not kscn.uses_comm, (
        "MADDPG's action head is movement-only (learner/maddpg.act); "
        "comm scenarios are not supported by the fused collector")
    assert not tuple(kscn.goal_choices or ()), (
        "goal-conditioned scenarios need goal streams the MADDPG buffer "
        "does not store")
    block_envs = pick_block_envs(n_envs, block_envs)
    assert n_steps % t_chunk == 0, (n_steps, t_chunk)
    n_blocks = n_envs // block_envs
    n_chunks = n_steps // t_chunk
    a, e, p = spec.n_agents, spec.n_entities, spec.dim_p
    mw = 2 * p + 1
    obs_w = kscn.obs_w
    rr = kscn.reward_rows

    kernel = functools.partial(
        _maddpg_traj_kernel, kscn=kscn, t_chunk=t_chunk, horizon=horizon,
        block_envs=block_envs, eps_greedy=float(eps_greedy),
        interpret=interpret)

    scratch = [
        pltpu.VMEM((e, p, block_envs), jnp.float32),
        pltpu.VMEM((e, p, block_envs), jnp.float32),
        pltpu.VMEM((a, obs_w, block_envs), jnp.float32),
        pltpu.VMEM((1, block_envs), jnp.int32),
    ]
    out_specs = (
        pl.BlockSpec((t_chunk, a, obs_w, block_envs),
                     lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((t_chunk, a, mw, block_envs),
                     lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((t_chunk, rr, block_envs),
                     lambda i, j: (j, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((t_chunk, a, obs_w, block_envs),
                     lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((n_steps, a, obs_w, n_envs), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, a, mw, n_envs), jnp.float32),
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
        return call(seeds, *_kernel_weights(actor_params))

    run.n_blocks = n_blocks
    run.block_envs = block_envs
    return run
