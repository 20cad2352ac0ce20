"""Reference learner: parameter-shared MLP policy + REINFORCE training
step, data-parallel over the env mesh.

The reference repo emits ``(obs, reward, done, info)`` tuples for an
*external* learner (MADDPG lives in a different repo; SURVEY.md §1). This
module is the learner-shaped consumer that closes the loop on-device: it
demonstrates (a) trajectory emission from sharded envs, and (b) a genuine
multi-chip training step — policy params replicated, envs sharded on the
``('env',)`` mesh axis, gradients ``pmean``-reduced across devices via
``shard_map``. Collectives ride the mesh; the env step itself stays
collective-free.

bfloat16-friendly: the MLP matmuls run in the params dtype (use
``jnp.bfloat16`` on TPU for MXU-shaped throughput); reductions stay f32.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mpe_tpu.core.actions import ActionMode
from mpe_tpu.envs.functional import MpeEnv


def init_policy(key, obs_dim: int, act_dim: int, hidden: int = 64,
                dtype=jnp.float32) -> dict[str, Any]:
    """Two-hidden-layer MLP, shared across agents."""
    from mpe_tpu.learner._nets import dense_init

    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "l1": dense_init(k1, obs_dim, hidden, dtype),
        "l2": dense_init(k2, hidden, hidden, dtype),
        "out": dense_init(k3, hidden, act_dim, dtype),
    }


def policy_logits(params, obs: jax.Array) -> jax.Array:
    x = obs.astype(params["l1"]["w"].dtype)
    x = jnp.tanh(x @ params["l1"]["w"] + params["l1"]["b"])
    x = jnp.tanh(x @ params["l2"]["w"] + params["l2"]["b"])
    return (x @ params["out"]["w"] + params["out"]["b"]).astype(jnp.float32)


def _split_logits(env: MpeEnv, logits: jax.Array):
    move_w = 2 * env.spec.dim_p + 1
    return logits[..., :move_w], logits[..., move_w:]


def sample_actions(env: MpeEnv, params, obs: jax.Array, key: jax.Array):
    """Sample canonical one-hot actions; -> (actions [A,W], logp scalar)."""
    assert env.action_mode is ActionMode.DISCRETE
    logits = policy_logits(params, obs)               # [A, W]
    mlog, clog = _split_logits(env, logits)
    km, kc = jax.random.split(key)
    mi = jax.random.categorical(km, mlog)             # [A]
    move = jax.nn.one_hot(mi, mlog.shape[-1], dtype=env.dtype)
    logp = jnp.sum(jax.nn.log_softmax(mlog)[jnp.arange(mlog.shape[0]), mi])
    if env.spec.dim_c:
        ci = jax.random.categorical(kc, clog)
        comm = jax.nn.one_hot(ci, clog.shape[-1], dtype=env.dtype)
        logp += jnp.sum(jax.nn.log_softmax(clog)[jnp.arange(clog.shape[0]), ci])
        actions = jnp.concatenate([move, comm], axis=-1)
    else:
        actions = move
    return actions, logp


def _episode_loss(env: MpeEnv, params, key: jax.Array, n_steps: int,
                  gamma: float = 0.95) -> jax.Array:
    """REINFORCE loss of one on-device episode (scan over steps)."""
    kr, ks = jax.random.split(key)
    state, obs = env.reset(kr)

    def body(carry, k):
        state, obs = carry
        ka, kstep = jax.random.split(k)
        actions, logp = sample_actions(env, params, obs, ka)
        state, obs, rew, done, _ = env.step(state, actions, kstep)
        return (state, obs), (logp, jnp.sum(rew))

    (_, _), (logps, team_rew) = jax.lax.scan(
        body, (state, obs), jax.random.split(ks, n_steps))
    # reverse discounted cumulative return-to-go
    def disc(carry, r):
        g = r + gamma * carry
        return g, g
    _, returns = jax.lax.scan(disc, jnp.zeros(()), team_rew, reverse=True)
    return -jnp.mean(logps * jax.lax.stop_gradient(returns))


def build_train_step(
    env: MpeEnv,
    mesh: Mesh,
    n_envs: int,
    n_steps: int = 25,
    lr: float = 1e-3,
    axis_name: str = "env",
):
    """Jitted data-parallel REINFORCE step:
    ``train_step(params, key) -> (params, loss)``.

    Params replicated, env keys sharded over the mesh; each device rolls
    out its local envs, grads are ``pmean``-ed across the env axis.
    """
    n_dev = mesh.devices.size
    assert n_envs % n_dev == 0
    n_local = n_envs // n_dev

    def local_loss(params, keys):                      # keys [n_local]
        losses = jax.vmap(
            lambda k: _episode_loss(env, params, k, n_steps))(keys)
        return jnp.mean(losses)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis_name)), out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded_step(params, keys):
        loss, grads = jax.value_and_grad(local_loss)(params, keys)
        grads = jax.lax.pmean(grads, axis_name)        # DP gradient reduction
        loss = jax.lax.pmean(loss, axis_name)
        params = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype),
                              params, grads)
        return params, loss

    @jax.jit
    def train_step(params, key):
        keys = jax.random.split(key, n_envs)
        return sharded_step(params, keys)

    return train_step
