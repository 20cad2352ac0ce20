"""Pallas fused policy-in-the-loop rollout: env + MLP inference in one
kernel.

The serving-shaped hot path: a trained (or candidate) policy is evaluated
by rolling out thousands of envs — obs -> MLP -> sample -> step — with
*everything* on-chip: world state in VMEM, the policy's matmuls on the
MXU, categorical sampling via on-chip PRNG Gumbel-max, per-lane horizon
auto-reset. HBM traffic per call is just the weights in (once) and the
per-env return accumulators out, independent of rollout length. Use
cases: policy evaluation, population-based search, league play.

Policy: the parameter-shared 2-hidden-layer tanh MLP of
mpe_tpu.learner.pg (init_policy format). Weights are kernel *inputs*
(Pallas kernels cannot capture array constants); the builder transposes
them to MXU-friendly [out, in] layout. All A agents' observations are
concatenated along the lane axis so each layer is ONE [H, in] @ [in,
A*N] matmul.

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

from mpe_tpu.core.state import ScenarioSpec
from mpe_tpu.ops.fused_rollout import (
    make_uniform, spread_physics_block, spread_reward_obs_block)


def _policy_onehot(spec, w1, b1, w2, b2, w3, b3, obs, uniform, step):
    """obs [A, OW, N] -> sampled one-hot moves [A, 5, N] via MXU MLP +
    Gumbel-max. Weights: w* [out, in] (transposed), b* [out, 1]."""
    a = spec.n_agents
    mw = 2 * spec.dim_p + 1
    n = obs.shape[-1]
    f32 = jnp.float32
    # concat agents along lanes: [OW, A*N] — one matmul per layer
    x = jnp.concatenate([obs[i] for i in range(a)], axis=1)
    h = jnp.tanh(jnp.dot(w1, x, preferred_element_type=f32) + b1)
    h = jnp.tanh(jnp.dot(w2, h, preferred_element_type=f32) + b2)
    logits = jnp.dot(w3, h, preferred_element_type=f32) + b3  # [mw, A*N]
    # Gumbel-max categorical sample
    u = uniform((mw, a * n), step, 7)
    z = logits - jnp.log(-jnp.log(u + 1e-12) + 1e-12)
    zmax = z[0:1]                                             # stay 2-D
    for k in range(1, mw):
        zmax = jnp.maximum(zmax, z[k : k + 1])
    onehot = (z >= zmax).astype(f32)                          # [mw, A*N]
    # ties are measure-zero under continuous gumbel noise; keep first
    # deterministic anyway via cumulative mask
    taken = jnp.zeros_like(onehot[0:1])
    rows = []
    for k in range(mw):
        r = onehot[k : k + 1] * (1.0 - taken)
        taken = jnp.minimum(taken + r, 1.0)
        rows.append(r)
    onehot = jnp.concatenate(rows, axis=0)
    # split agents back off the lane axis -> [A, mw, N]
    return jnp.stack([onehot[:, i * n:(i + 1) * n] for i in range(a)])


def _policy_rollout_kernel(
    seed_ref, w1, b1, w2, b2, w3, b3,
    ret_out, pos_out, len_out,
    *, spec: ScenarioSpec, n_steps: int, horizon: int, block_envs: int,
    interpret: bool,
):
    a, l, p = spec.n_agents, spec.n_landmarks, spec.dim_p
    n = block_envs
    f32 = jnp.float32
    uniform, seed_hw = make_uniform(seed_ref, interpret)
    seed_hw()

    def sample_pos(rows, step, call_id):
        return uniform((rows, p, n), step, call_id) * 2.0 - 1.0

    zero = jnp.zeros((), jnp.int32)
    apos0 = sample_pos(a, zero, 0)
    avel0 = jnp.zeros((a, p, n), f32)
    lpos0 = sample_pos(l, zero, 1)
    _, obs0 = spread_reward_obs_block(spec, apos0, avel0, lpos0)

    carry0 = (
        apos0, avel0, lpos0, obs0,
        jnp.zeros((1, n), jnp.int32),     # per-lane t
        jnp.zeros((1, n), f32),           # return accumulator
        jnp.zeros((1, n), f32),           # episodes completed per lane
    )

    def body(step, carry):
        apos, avel, lpos, obs, t, ret_acc, eps = carry
        move = _policy_onehot(spec, w1[:], b1[:], w2[:], b2[:], w3[:], b3[:],
                              obs, uniform, step)
        apos, avel = spread_physics_block(spec, apos, avel, move)
        rew, obs = spread_reward_obs_block(spec, apos, avel, lpos)
        ret_acc = ret_acc + rew
        t = t + 1
        done = t >= horizon
        donef = done.astype(f32)
        eps = eps + donef
        # auto-reset (recompute obs for resampled lanes)
        apos_f = sample_pos(a, step, 3)
        lpos_f = sample_pos(l, step, 4)
        _, obs_f = spread_reward_obs_block(
            spec, apos_f, jnp.zeros_like(avel), lpos_f)
        apos = jnp.where(done[None], apos_f, apos)
        lpos = jnp.where(done[None], lpos_f, lpos)
        avel = jnp.where(done[None], jnp.zeros_like(avel), avel)
        obs = jnp.where(done[None], obs_f, obs)
        t = jnp.where(done, 0, t)
        return apos, avel, lpos, obs, t, ret_acc, eps

    apos, avel, lpos, obs, t, ret_acc, eps = jax.lax.fori_loop(
        0, n_steps, body, carry0)
    ret_out[:] = ret_acc
    pos_out[:] = jnp.concatenate([apos, lpos], axis=0)
    len_out[:] = eps


def fused_policy_rollout(
    spec: ScenarioSpec,
    params,
    n_envs: int,
    n_steps: int,
    horizon: int = 100,
    block_envs: int = 1024,
    interpret: bool = False,
):
    """Build ``run(seed, params) -> (returns [1, N], pos [E, P, N],
    episodes [1, N])`` — a full policy-evaluation rollout in one kernel.

    ``params`` (only shapes are used at build time) is the
    mpe_tpu.learner.init_policy pytree; pass (possibly updated) params of
    the same shapes at call time.
    """
    assert n_envs % block_envs == 0
    n_blocks = n_envs // block_envs
    e, p = spec.n_entities, spec.dim_p

    kernel = functools.partial(
        _policy_rollout_kernel, spec=spec, n_steps=n_steps,
        horizon=horizon, block_envs=block_envs, interpret=interpret)

    def wspecs():
        # weights replicated to every block: constant index map
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [wspecs() for _ in range(6)],
        out_specs=(
            pl.BlockSpec((1, block_envs), lambda i: (0, i),
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
            jax.ShapeDtypeStruct((1, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((e, p, n_envs), jnp.float32),
            jax.ShapeDtypeStruct((1, n_envs), jnp.float32),
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(seed, params):
        f32 = jnp.float32
        w1 = params["l1"]["w"].T.astype(f32)     # [H, OW]
        b1 = params["l1"]["b"].astype(f32)[:, None]
        w2 = params["l2"]["w"].T.astype(f32)
        b2 = params["l2"]["b"].astype(f32)[:, None]
        w3 = params["out"]["w"].T.astype(f32)    # [mw, H]
        b3 = params["out"]["b"].astype(f32)[:, None]
        return call(jnp.asarray([seed], jnp.int32), w1, b1, w2, b2, w3, b3)

    return run
