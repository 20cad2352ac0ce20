"""PPO learner: actor-critic MLP, GAE, clipped surrogate objective,
data-parallel over the env mesh — entirely on device.

Demonstrates the intended consumption pattern for the engine's
trajectories at production scale (the reference emits (obs, reward, done,
info) for an external learner; here the whole loop is jitted):

  - rollout: one ``lax.scan`` over the vmapped env step, policy sampling
    on device, storing (obs, action, logp, value, reward, done);
  - GAE advantages via a reverse scan;
  - update: ``ppo_epochs`` passes of the clipped objective + value loss +
    entropy bonus over the full batch;
  - data parallelism: envs sharded on the ``('env',)`` mesh axis via
    ``shard_map``, gradients ``pmean``-reduced (same model as
    learner/pg.py).

Parameter-shared across agents: every agent's transitions train the same
network (the standard MPE baseline setup).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mpe_tpu.core.actions import ActionMode
from mpe_tpu.envs.functional import MpeEnv


def init_ac(key, obs_dim: int, act_dim: int, hidden: int = 64,
            dtype=jnp.float32) -> dict[str, Any]:
    """Actor-critic MLP: shared torso, policy + value heads."""
    from mpe_tpu.learner._nets import dense_init

    ks = jax.random.split(key, 4)
    return {
        "l1": dense_init(ks[0], obs_dim, hidden, dtype),
        "l2": dense_init(ks[1], hidden, hidden, dtype),
        "pi": dense_init(ks[2], hidden, act_dim, dtype,
                         scale=jnp.asarray(0.01, dtype)),
        "v": dense_init(ks[3], hidden, 1, dtype),
    }


def _torso(params, obs):
    x = obs.astype(params["l1"]["w"].dtype)
    x = jnp.tanh(x @ params["l1"]["w"] + params["l1"]["b"])
    return jnp.tanh(x @ params["l2"]["w"] + params["l2"]["b"])


def policy_value(params, obs):
    """obs [..., O] -> (move logits [..., K], value [...])."""
    h = _torso(params, obs)
    logits = (h @ params["pi"]["w"] + params["pi"]["b"]).astype(jnp.float32)
    value = (h @ params["v"]["w"] + params["v"]["b"])[..., 0].astype(
        jnp.float32)
    return logits, value


class Transition(NamedTuple):
    obs: jax.Array      # [A, O]
    act: jax.Array      # [A] int32 move index
    logp: jax.Array     # [A]
    value: jax.Array    # [A]
    reward: jax.Array   # [A]
    done: jax.Array     # [A] bool


# ---- shared scaffolding between the PPO and MAPPO builders (identical
# math factored out so fixes land in both) -----------------------------


def _make_opt(lr, anneal_iters, ppo_epochs):
    """Global-norm clip + Adam; linear LR decay over
    anneal_iters*ppo_epochs updates counters the late-training drift
    typical of small-batch PPO."""
    sched = (optax.linear_schedule(lr, 0.0, anneal_iters * ppo_epochs)
             if anneal_iters else lr)
    return optax.chain(optax.clip_by_global_norm(0.5), optax.adam(sched))


def _sample_move(logits, key, mw, pad_c, dtype):
    """Categorical move draw from [A, mw] logits -> (padded action rows
    [A, mw+pad_c], idx [A], logp [A]). The head must be move-only: a
    wider head (e.g. the pg.py act_dim=env.action_width convention)
    would let idx land past the move range and one_hot silently emit
    all-zero no-ops."""
    assert logits.shape[-1] == mw, (
        f"pi head width {logits.shape[-1]} != move width {mw}; "
        "build params with act_dim=5")
    a = logits.shape[0]
    idx = jax.random.categorical(key, logits)
    logp = jnp.take_along_axis(
        jax.nn.log_softmax(logits), idx[:, None], axis=-1)[:, 0]
    onehot = jax.nn.one_hot(idx, mw, dtype=dtype)
    acts = jnp.concatenate([onehot, jnp.zeros((a, pad_c), dtype)], axis=-1)
    return acts, idx, logp


def _gae_scan(values, rewards, dones, last_value, gamma, lam):
    """Reverse-scan GAE over leading-time tensors;
    -> (advantages, returns)."""
    def body(carry, x):
        next_val, next_adv = carry
        value, reward, done = x
        nonterm = 1.0 - done.astype(jnp.float32)
        delta = reward + gamma * next_val * nonterm - value
        adv = delta + gamma * lam * nonterm * next_adv
        return (value, adv), adv

    (_, _), advs = jax.lax.scan(
        body, (last_value, jnp.zeros_like(last_value)),
        (values, rewards, dones), reverse=True)
    return advs, advs + values


def _clipped_objective(logits, act, logp_old, value, value_old, adv_b,
                       ret, clip):
    """Shared clipped-surrogate pieces: (pg, vloss, ent). ``adv_b`` is
    already normalized and broadcast to ``logp``'s shape. The
    PPO-style clipped value loss limits how far the critic moves from
    its rollout-time predictions per iteration (same range as the
    policy clip, per the common PPO2 implementation)."""
    logp = jnp.take_along_axis(
        jax.nn.log_softmax(logits), act[..., None], axis=-1)[..., 0]
    ratio = jnp.exp(logp - logp_old)
    pg = -jnp.minimum(
        ratio * adv_b, jnp.clip(ratio, 1 - clip, 1 + clip) * adv_b).mean()
    v_clip = value_old + jnp.clip(value - value_old, -clip, clip)
    vloss = jnp.maximum(jnp.square(value - ret),
                        jnp.square(v_clip - ret)).mean()
    ent = -jnp.sum(
        jax.nn.softmax(logits) * jax.nn.log_softmax(logits),
        axis=-1).mean()
    return pg, vloss, ent


def _epoch_metrics_step(loss_fn, batch, opt, ppo_epochs, axis_name,
                        mean_rew):
    """-> epochs(params, opt_state) running ``ppo_epochs`` pmean'd
    update epochs and returning the standard metrics dict."""
    def epochs(params, opt_state):
        def epoch(carry, _):
            params, opt_state = carry
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            grads = jax.lax.pmean(grads, axis_name)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, *aux)

        (params, opt_state), (losses, pgs, vls, ents) = jax.lax.scan(
            epoch, (params, opt_state), jnp.arange(ppo_epochs))
        metrics = {
            "loss": jax.lax.pmean(losses[-1], axis_name),
            "pg_loss": jax.lax.pmean(pgs[-1], axis_name),
            "v_loss": jax.lax.pmean(vls[-1], axis_name),
            "entropy": jax.lax.pmean(ents[-1], axis_name),
            "mean_reward": jax.lax.pmean(mean_rew, axis_name),
        }
        return (params, opt_state), metrics

    return epochs


def _wrap_step(local_update, mesh, axis_name, n_dev, opt):
    """shard_map + jit wrapper with per-device key split and the
    init_state attribute — the common outer shell of both builders."""
    @partial(shard_map, mesh=mesh, in_specs=(P(), P(axis_name)),
             out_specs=(P(), P()), check_vma=False)
    def sharded(state, keys):
        return local_update(state, keys[0])

    @jax.jit
    def step(state, key):
        return sharded(state, jax.random.split(key, n_dev))

    step.init_state = lambda params: (params, opt.init(params))
    return step


def build_ppo_step(
    env: MpeEnv,
    mesh: Mesh,
    n_envs: int,
    n_steps: int = 64,
    lr: float = 3e-4,
    gamma: float = 0.95,
    lam: float = 0.95,
    clip: float = 0.2,
    vf_coef: float = 0.5,
    ent_coef: float = 0.01,
    ppo_epochs: int = 4,
    anneal_iters: int | None = None,
    axis_name: str = "env",
):
    """Jitted data-parallel PPO iteration:
    ``ppo_step(train_state, key) -> (train_state, metrics dict)`` where
    ``train_state = (params, opt_state)`` (build with ``init_state``
    below, or pass ``(params, ppo_step.init_opt(params))``).

    Move-only policies (the comm slice stays zero); every agent's
    transitions train the shared network. Adam optimizer — the value and
    policy gradients differ by ~100x in scale through the shared torso,
    which plain SGD cannot balance.
    """
    assert env.action_mode is ActionMode.DISCRETE
    opt = _make_opt(lr, anneal_iters, ppo_epochs)
    n_dev = mesh.devices.size
    assert n_envs % n_dev == 0
    n_local = n_envs // n_dev
    mw = 2 * env.spec.dim_p + 1
    pad_c = env.action_width - mw

    def sample(params, obs, key):
        logits, value = policy_value(params, obs)          # [A, K], [A]
        acts, idx, logp = _sample_move(logits, key, mw, pad_c, env.dtype)
        return acts, idx, logp, value

    def rollout(params, key):
        """-> Transition pytree with leaves [T, n_local, A, ...]."""
        kr, ks = jax.random.split(key)
        states, obs = jax.vmap(env.reset)(jax.random.split(kr, n_local))

        def body(carry, k):
            states, obs = carry
            ka, kstep = jax.random.split(k)
            acts, idx, logp, value = jax.vmap(
                lambda o, kk: sample(params, o, kk))(
                obs, jax.random.split(ka, n_local))
            states, obs2, rew, done, _ = jax.vmap(env.step)(
                states, acts, jax.random.split(kstep, n_local))
            tr = Transition(obs, idx, logp, value, rew, done)
            return (states, obs2), tr

        (_, last_obs), traj = jax.lax.scan(
            body, (states, obs), jax.random.split(ks, n_steps))
        _, last_value = jax.vmap(lambda o: policy_value(params, o))(last_obs)
        return traj, last_value

    def loss_fn(params, batch):
        obs, act, logp_old, value_old, adv, ret = batch
        logits, value = policy_value(params, obs)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg, vloss, ent = _clipped_objective(
            logits, act, logp_old, value, value_old, adv_n, ret, clip)
        return pg + vf_coef * vloss - ent_coef * ent, (pg, vloss, ent)

    def local_update(state, key):
        params, opt_state = state
        kr, _ = jax.random.split(key)
        traj, last_value = rollout(params, kr)
        adv, ret = _gae_scan(traj.value, traj.reward, traj.done,
                             last_value, gamma, lam)
        batch = (traj.obs, traj.act, traj.logp, traj.value, adv, ret)
        epochs = _epoch_metrics_step(loss_fn, batch, opt, ppo_epochs,
                                     axis_name, traj.reward.mean())
        return epochs(params, opt_state)

    return _wrap_step(local_update, mesh, axis_name, n_dev, opt)


# ---------------------------------------------------------------------------
# MAPPO: centralized critic over the joint observation (CTDE — the
# standard cooperative-MPE recipe; actors stay decentralized)
# ---------------------------------------------------------------------------

def init_mappo(key, obs_dim: int, act_dim: int, n_agents: int,
               hidden: int = 64, dtype=jnp.float32) -> dict[str, Any]:
    """Decentralized actor (per-agent obs) + centralized critic (joint
    obs of all agents)."""
    from mpe_tpu.learner._nets import dense_init

    ks = jax.random.split(key, 6)
    return {
        "a1": dense_init(ks[0], obs_dim, hidden, dtype),
        "a2": dense_init(ks[1], hidden, hidden, dtype),
        "pi": dense_init(ks[2], hidden, act_dim, dtype,
                         scale=jnp.asarray(0.01, dtype)),
        "c1": dense_init(ks[3], obs_dim * n_agents, hidden, dtype),
        "c2": dense_init(ks[4], hidden, hidden, dtype),
        "v": dense_init(ks[5], hidden, 1, dtype),
    }


def actor_logits(params, obs):
    x = obs.astype(params["a1"]["w"].dtype)
    x = jnp.tanh(x @ params["a1"]["w"] + params["a1"]["b"])
    x = jnp.tanh(x @ params["a2"]["w"] + params["a2"]["b"])
    return (x @ params["pi"]["w"] + params["pi"]["b"]).astype(jnp.float32)


def central_value(params, obs):
    """obs [..., A, O] -> V of the joint state [...]."""
    joint = obs.reshape(*obs.shape[:-2], -1)
    x = joint.astype(params["c1"]["w"].dtype)
    x = jnp.tanh(x @ params["c1"]["w"] + params["c1"]["b"])
    x = jnp.tanh(x @ params["c2"]["w"] + params["c2"]["b"])
    return (x @ params["v"]["w"] + params["v"]["b"])[..., 0].astype(
        jnp.float32)


def build_mappo_step(
    env: MpeEnv,
    mesh: Mesh,
    n_envs: int,
    n_steps: int = 64,
    lr: float = 3e-4,
    gamma: float = 0.95,
    lam: float = 0.95,
    clip: float = 0.2,
    vf_coef: float = 0.5,
    ent_coef: float = 0.01,
    ppo_epochs: int = 4,
    anneal_iters: int | None = None,
    axis_name: str = "env",
):
    """Jitted data-parallel MAPPO iteration (same train_state contract as
    ``build_ppo_step``). Intended for collaborative scenarios (the shared
    team reward is the critic's target)."""
    assert env.action_mode is ActionMode.DISCRETE
    opt = _make_opt(lr, anneal_iters, ppo_epochs)
    n_dev = mesh.devices.size
    assert n_envs % n_dev == 0
    n_local = n_envs // n_dev
    mw = 2 * env.spec.dim_p + 1
    pad_c = env.action_width - mw

    def sample(params, obs, key):
        logits = actor_logits(params, obs)                 # [A, K]
        return _sample_move(logits, key, mw, pad_c, env.dtype)

    def rollout(params, key):
        kr, ks = jax.random.split(key)
        states, obs = jax.vmap(env.reset)(jax.random.split(kr, n_local))

        def body(carry, k):
            states, obs = carry
            ka, kstep = jax.random.split(k)
            acts, idx, logp = jax.vmap(
                lambda o, kk: sample(params, o, kk))(
                obs, jax.random.split(ka, n_local))
            value = jax.vmap(lambda o: central_value(params, o))(obs)
            states, obs2, rew, done, _ = jax.vmap(env.step)(
                states, acts, jax.random.split(kstep, n_local))
            # team reward: mean over agents (identical per agent in
            # collaborative scenarios)
            team_rew = rew.mean(axis=-1)
            team_done = done.all(axis=-1)
            out = (obs, idx, logp, value, team_rew, team_done)
            return (states, obs2), out

        (_, last_obs), traj = jax.lax.scan(
            body, (states, obs), jax.random.split(ks, n_steps))
        last_value = jax.vmap(lambda o: central_value(params, o))(last_obs)
        return traj, last_value

    def loss_fn(params, batch):
        obs, act, logp_old, value_old, adv, ret = batch
        logits = actor_logits(params, obs)                 # [..., A, K]
        value = central_value(params, obs)                 # [...]
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        adv_b = adv_n[..., None]                           # same adv per agent
        pg, vloss, ent = _clipped_objective(
            logits, act, logp_old, value, value_old, adv_b, ret, clip)
        return pg + vf_coef * vloss - ent_coef * ent, (pg, vloss, ent)

    def local_update(state, key):
        params, opt_state = state
        kr, _ = jax.random.split(key)
        (obs, act, logp, value, rew, done), last_value = rollout(params, kr)
        adv, ret = _gae_scan(value, rew, done, last_value, gamma, lam)
        batch = (obs, act, logp, value, adv, ret)
        epochs = _epoch_metrics_step(loss_fn, batch, opt, ppo_epochs,
                                     axis_name, rew.mean())
        return epochs(params, opt_state)

    return _wrap_step(local_update, mesh, axis_name, n_dev, opt)
