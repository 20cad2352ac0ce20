"""MADDPG — the algorithm the reference was built for (Lowe et al. 2017,
cited in the reference README), TPU-native and fully on device.

Centralized training / decentralized execution with *per-agent* networks
(unlike pg/ppo's parameter sharing, each agent has its own actor and a
centralized critic over the joint observation+action — the paper's
setup for mixed cooperative-competitive scenarios):

  - actors μ_i(o_i) -> move logits; discrete actions via straight-through
    Gumbel-softmax (the paper's treatment of discrete MPE actions);
  - critics Q_i(o_1..A, a_1..A) -> scalar;
  - on-device ring replay buffer (dynamic_update_slice insert, gather
    sample) — no host round-trips in the training loop;
  - soft target networks (polyak averaging);
  - MPE episodes end only by time limit (the reference has no
    termination), so TD targets bootstrap THROUGH the horizon using the
    true pre-reset next observation (stored before auto-reset replaces
    it) — truncation handled the standard way, not as a terminal.

Per-agent heterogeneity is expressed by stacking each agent's parameters
on a leading axis and ``vmap``-ing — one compiled program regardless of
how different the agents' roles are.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mpe_tpu.core.actions import ActionMode
from mpe_tpu.envs.functional import MpeEnv


from mpe_tpu.learner._nets import dense_init as _dense


def _mlp(params, x, out_key):
    x = jnp.tanh(x @ params["l1"]["w"] + params["l1"]["b"])
    x = jnp.tanh(x @ params["l2"]["w"] + params["l2"]["b"])
    return x @ params[out_key]["w"] + params[out_key]["b"]


def init_maddpg(key, obs_dim: int, act_dim: int, n_agents: int,
                hidden: int = 64, local_critic: bool = False):
    """Stacked per-agent actors and critics: every leaf has a leading
    [A] axis (vmapped per-agent networks). ``local_critic=True`` gives
    each critic ONLY its own (obs_i, act_i) — independent DDPG, the
    decentralized baseline the MADDPG paper compares against."""
    cin = (obs_dim + act_dim if local_critic
           else n_agents * (obs_dim + act_dim))

    def one_agent(k):
        ka1, ka2, ka3, kc1, kc2, kc3 = jax.random.split(k, 6)
        return {
            "actor": {
                "l1": _dense(ka1, obs_dim, hidden),
                "l2": _dense(ka2, hidden, hidden),
                "out": _dense(ka3, hidden, act_dim,
                              scale=jnp.asarray(0.01, jnp.float32)),
            },
            "critic": {
                "l1": _dense(kc1, cin, hidden),
                "l2": _dense(kc2, hidden, hidden),
                "out": _dense(kc3, hidden, 1),
            },
        }

    per_agent = [one_agent(k) for k in jax.random.split(key, n_agents)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_agent)


def actor_logits_i(actor_params, obs):
    """One agent's actor: obs [..., O] -> logits [..., K]."""
    return _mlp(actor_params, obs, "out").astype(jnp.float32)


def critic_q_i(critic_params, joint):
    """One agent's critic: joint [..., A*(O+K)] -> Q [...]."""
    return _mlp(critic_params, joint, "out")[..., 0].astype(jnp.float32)


def maddpg_act_dim(env: MpeEnv) -> int:
    """Actor output width for ``env``: the 5-wide move head, plus a
    dim_c-wide comm head when any agent speaks (the decoder zeroes
    silent agents' comm and immobile agents' force, so one uniform
    two-head actor serves heterogeneous roles — core/actions.py:94-95)."""
    mw = 2 * env.spec.dim_p + 1
    cw = 0 if all(env.spec.silent) else env.spec.dim_c
    return mw + cw


def gumbel_softmax_st(logits, key, tau: float = 1.0):
    """Straight-through Gumbel-softmax: one-hot forward, soft gradients."""
    g = -jnp.log(-jnp.log(
        jax.random.uniform(key, logits.shape, minval=1e-10, maxval=1.0)))
    soft = jax.nn.softmax((logits + g) / tau)
    hard = jax.nn.one_hot(jnp.argmax(soft, axis=-1), logits.shape[-1],
                          dtype=soft.dtype)
    return hard + soft - jax.lax.stop_gradient(soft)


@dataclasses.dataclass(frozen=True)
class Buffer:
    """On-device replay ring: ONE fused 2-D row tensor.

    ``data[i] = [obs | act | rew | obs2]`` flattened to
    ``W = A*(2*O + K + 1)`` columns. Storing the ring as a single 2-D
    table instead of per-field ``[cap, A, X]`` tensors is a measured
    ~10x on the sampling path: TPU row-gathers from a 3-D table pay the
    minor-dim (8, 128) tile padding (a [cap, 3, 18] gather moves ~19x
    the bytes), and one fused row makes each update's sample ONE gather
    instead of four. The ``obs/act/rew/obs2`` properties return the
    per-field views for inspection; hot paths gather ``data`` rows
    first and slice the result.
    """
    data: jax.Array   # [cap, W] f32
    ptr: jax.Array    # [] int32
    size: jax.Array   # [] int32
    n_agents: int = 0     # static
    obs_dim: int = 0      # static
    act_dim: int = 0      # static

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    def _check_meta(self):
        assert self.n_agents > 0 and self.obs_dim > 0 and self.act_dim > 0, (
            "Buffer built without its static meta (n_agents/obs_dim/"
            "act_dim) — construct via init_buffer() or Buffer.pack()")

    def _split(self, rows):
        """[R, W] gathered rows -> (obs [R, A, O], act [R, A, K],
        rew [R, A], obs2 [R, A, O])."""
        self._check_meta()
        r = rows.shape[0]
        a, o, k = self.n_agents, self.obs_dim, self.act_dim
        ao, ak = a * o, a * k
        return (rows[:, :ao].reshape(r, a, o),
                rows[:, ao : ao + ak].reshape(r, a, k),
                rows[:, ao + ak : ao + ak + a],
                rows[:, ao + ak + a :].reshape(r, a, o))

    # inspection-only per-field views; each slices just its own columns
    # so eager use on a large ring doesn't materialize the other three
    @property
    def obs(self):
        self._check_meta()
        cap, (a, o) = self.data.shape[0], (self.n_agents, self.obs_dim)
        return self.data[:, : a * o].reshape(cap, a, o)

    @property
    def act(self):
        self._check_meta()
        cap, (a, o, k) = self.data.shape[0], (
            self.n_agents, self.obs_dim, self.act_dim)
        return self.data[:, a * o : a * (o + k)].reshape(cap, a, k)

    @property
    def rew(self):
        self._check_meta()
        a, o, k = self.n_agents, self.obs_dim, self.act_dim
        return self.data[:, a * (o + k) : a * (o + k + 1)]

    @property
    def obs2(self):
        self._check_meta()
        cap, (a, o, k) = self.data.shape[0], (
            self.n_agents, self.obs_dim, self.act_dim)
        return self.data[:, a * (o + k + 1) :].reshape(cap, a, o)

    @classmethod
    def pack(cls, obs, act, rew, obs2, ptr, size):
        """Build a Buffer from per-field [cap, A, X] / [cap, A] tensors."""
        cap, a, o = obs.shape
        k = act.shape[-1]
        data = jnp.concatenate(
            [obs.reshape(cap, -1), act.reshape(cap, -1), rew,
             obs2.reshape(cap, -1)], axis=1).astype(jnp.float32)
        return cls(data=data, ptr=ptr, size=size, n_agents=a, obs_dim=o,
                   act_dim=k)


jax.tree_util.register_dataclass(
    Buffer, data_fields=["data", "ptr", "size"],
    meta_fields=["n_agents", "obs_dim", "act_dim"])


def init_buffer(capacity: int, n_agents: int, obs_dim: int, act_dim: int):
    w = n_agents * (2 * obs_dim + act_dim + 1)
    return Buffer(
        data=jnp.zeros((capacity, w), jnp.float32),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
        n_agents=n_agents, obs_dim=obs_dim, act_dim=act_dim,
    )


def _apply_maddpg_update(params, targets, opt_states, grads, gate, *,
                         actor_opt, critic_opt, tau_polyak,
                         gate_fields=None):
    """Shared tail of every MADDPG update variant (XLA update_fn, fused
    update, chunk, DP): adam on both nets, actor gating (critic warmup /
    actor delay), polyak target averaging. The actor loss never sees the
    post-update critic, so applying both updates here is equivalent to
    the critic-first ordering.

    ``gate`` is either a scalar bool (all actors step or none — the
    classic critic-warmup / actor-delay schedule) or a PER-AGENT bool
    vector [A] (each agent's actor + its adam moments step only where
    its gate is set — the two-timescale schedules of
    tools/crypto_study.py). A uniform [A] vector is bit-identical to
    the scalar (adam's shared ``count`` advances iff ANY agent steps).
    ``gate_fields(gate [A]) -> actor-structured pytree`` expands the
    vector to per-leaf boolean fields; the default reshapes over the
    leading stacked-agent axis of the init_maddpg layout — PACKED
    (block-diagonal) layouts must supply their own expansion."""
    cupd, copt = critic_opt.update(
        grads["critic"], opt_states["critic"], params["critic"])
    new_critic = optax.apply_updates(params["critic"], cupd)
    aupd, aopt = actor_opt.update(
        grads["actor"], opt_states["actor"], params["actor"])
    new_actor = optax.apply_updates(params["actor"], aupd)
    gate = jnp.asarray(gate)
    if gate.ndim == 0:
        new_actor = jax.tree.map(
            lambda n, o: jnp.where(gate, n, o), new_actor,
            params["actor"])
        aopt = jax.tree.map(
            lambda n, o: (jnp.where(gate, n, o) if hasattr(n, "shape")
                          else n),
            aopt, opt_states["actor"])
    else:
        if gate_fields is None:
            fields = jax.tree.map(
                lambda n: gate.reshape(
                    (gate.shape[0],) + (1,) * (n.ndim - 1)),
                params["actor"])
        else:
            fields = gate_fields(gate)
        sel = lambda f, n, o: jnp.where(f, n, o)
        new_actor = jax.tree.map(sel, fields, new_actor,
                                 params["actor"])
        # adam mu/nu mirror the actor-param structure leaf for leaf;
        # the shared scalar count advances iff ANY agent stepped (== the
        # scalar-gate behavior whenever the vector is uniform)
        gate_any = jnp.any(gate)
        gated_opt = []
        for sn, so in zip(aopt, opt_states["actor"]):
            if isinstance(sn, optax.ScaleByAdamState):
                gated_opt.append(optax.ScaleByAdamState(
                    count=jnp.where(gate_any, sn.count, so.count),
                    mu=jax.tree.map(sel, fields, sn.mu, so.mu),
                    nu=jax.tree.map(sel, fields, sn.nu, so.nu)))
            else:
                # any other stateful transform would advance for
                # gated-off agents and silently break the
                # uniform-vector == scalar invariant — reject it
                assert not jax.tree.leaves(sn), (
                    "per-agent gating only supports adam-style actor "
                    f"optimizers; got stateful {type(sn).__name__}")
                gated_opt.append(sn)
        aopt = tuple(gated_opt)
    params = {"actor": new_actor, "critic": new_critic}
    targets = jax.tree.map(
        lambda t, p: (1 - tau_polyak) * t + tau_polyak * p, targets,
        params)
    return params, targets, {"actor": aopt, "critic": copt}


def build_maddpg(
    env: MpeEnv,
    n_envs: int = 32,
    capacity: int = 50_000,
    batch: int = 256,
    gamma: float = 0.95,
    tau_polyak: float = 0.05,
    gumbel_tau: float = 1.0,
    eps_greedy: float = 0.1,
    actor_lr: float = 1e-3,
    critic_lr: float = 1e-3,
    ent_coef: float = 0.01,
):
    """-> (reset_fn, collect_fn, update_fn), all jitted.

    reset_fn(key) -> (env_states, obs)
    collect_fn(params, env_states, obs, buffer, key)
        -> (env_states, obs, buffer, mean_reward)
    update_fn(params, targets, opt_states, buffer, key, do_actor)
        -> (params, targets, opt_states, metrics)

    ``do_actor`` (traced bool) gates the actor/target-actor update so the
    training loop can warm the critic up first and delay actor updates —
    the usual DDPG-family stabilizers.

    Requires ``env`` built with ``max_steps`` + ``auto_reset=True`` so
    collection runs continuously.
    """
    assert env.action_mode is ActionMode.DISCRETE and env.auto_reset
    # plain twin of the env (horizon done flags, no auto-reset) so
    # collect_fn controls resets and keeps the true next obs
    env_plain = MpeEnv(env.scenario, action_mode=env.action_mode,
                       max_steps=env.max_steps, auto_reset=False,
                       dtype=env.dtype)
    a = env.n_agents
    mw = 2 * env.spec.dim_p + 1
    aw = maddpg_act_dim(env)       # mw, or mw + dim_c on comm scenarios
    cw = aw - mw
    pad_c = env.action_width - aw
    obs_dim = env.scenario.obs_width
    assert capacity % n_envs == 0
    actor_opt = optax.adam(actor_lr)
    critic_opt = optax.adam(critic_lr)

    def init_opt(params):
        return {"actor": actor_opt.init(params["actor"]),
                "critic": critic_opt.init(params["critic"])}

    def act(params, obs, key):
        """obs [A, O] -> exploratory one-hot actions [A, aw]: a move
        one-hot, plus an independently sampled comm one-hot when the
        scenario speaks (factorized two-head policy)."""
        logits = jax.vmap(actor_logits_i)(params["actor"], obs)

        def head(lg, k, width):
            kg, ke, ku = jax.random.split(k, 3)
            sampled = gumbel_softmax_st(lg, kg, gumbel_tau)
            # epsilon-greedy uniform mix keeps coverage while the actor
            # is still chasing an immature critic
            rand = jax.nn.one_hot(
                jax.random.randint(ku, (a,), 0, width), width,
                dtype=jnp.float32)
            take_rand = (jax.random.uniform(ke, (a, 1)) < eps_greedy)
            return jnp.where(take_rand, rand, sampled)

        km, kc = jax.random.split(key)
        parts = [head(logits[:, :mw], km, mw)]
        if cw:
            parts.append(head(logits[:, mw:], kc, cw))
        return jnp.concatenate(parts, axis=-1)

    @jax.jit
    def reset_fn(key):
        return jax.vmap(env.reset)(jax.random.split(key, n_envs))

    @jax.jit
    def collect_fn(params, env_states, obs, buffer: Buffer, key):
        ka, kstep = jax.random.split(key)
        moves = jax.vmap(lambda o, k: act(params, o, k))(
            obs, jax.random.split(ka, n_envs))
        acts = jnp.concatenate(
            [moves, jnp.zeros((n_envs, a, pad_c), env.dtype)], axis=-1)
        # step WITHOUT the env's auto-reset so the stored next obs is
        # the true s' (bootstrap through the time limit); reset done
        # lanes manually afterwards
        env_states2, obs2, rew, done, _ = jax.vmap(env_plain.step)(
            env_states, acts, jax.random.split(kstep, n_envs))
        idx = buffer.ptr
        f32 = jnp.float32  # buffer is f32 regardless of env dtype (x64 tests)
        rows = jnp.concatenate(
            [obs.astype(f32).reshape(n_envs, -1),
             moves.astype(f32).reshape(n_envs, -1),
             rew.astype(f32),
             obs2.astype(f32).reshape(n_envs, -1)], axis=1)
        buffer = buffer._replace(
            data=jax.lax.dynamic_update_slice_in_dim(
                buffer.data, rows, idx, 0),
            ptr=(idx + n_envs) % capacity,
            size=jnp.minimum(buffer.size + n_envs, capacity),
        )
        # manual reset of done lanes (env.step without auto_reset keeps
        # running past the horizon otherwise)
        kreset = jax.random.fold_in(key, 7)
        fresh_states, fresh_obs = jax.vmap(env.reset)(
            jax.random.split(kreset, n_envs))
        ep_done = done.all(axis=-1)
        env_states2 = jax.tree.map(
            lambda f, o: jnp.where(
                ep_done.reshape((-1,) + (1,) * (o.ndim - 1)), f, o),
            fresh_states, env_states2)
        obs2_next = jnp.where(ep_done[:, None, None], fresh_obs, obs2)
        return env_states2, obs2_next, buffer, rew.mean()

    @jax.jit
    def update_fn(params, targets, opt_states, buffer: Buffer, key,
                  do_actor=True):
        """Precondition: the buffer holds data (run collect_fn first);
        the max() guard below only prevents randint(0, 0) UB."""
        idx = jax.random.randint(key, (batch,), 0,
                                 jnp.maximum(buffer.size, 1))
        # ONE 2-D row gather, then slice (the fast sampling path —
        # see the Buffer docstring)
        obs_b, act_b, rew_b, obs2_b = buffer._split(buffer.data[idx])
        grads, (closs, aloss, qmean) = maddpg_xla_grads(
            params, targets, obs_b, act_b, rew_b, obs2_b, mw=mw, cw=cw,
            gamma=gamma, ent_coef=ent_coef)
        params, targets, opt_states = _apply_maddpg_update(
            params, targets, opt_states, grads, do_actor,
            actor_opt=actor_opt, critic_opt=critic_opt,
            tau_polyak=tau_polyak)
        metrics = {"critic_loss": closs, "actor_loss": aloss, "q": qmean}
        return params, targets, opt_states, metrics

    return reset_fn, collect_fn, update_fn, init_opt


def _joint(obs_b, act_b):
    """[B, A, O], [B, A, K] -> [B, A*(O+K)]."""
    return jnp.concatenate(
        [obs_b.reshape(obs_b.shape[0], -1),
         act_b.reshape(act_b.shape[0], -1)], axis=-1)


def _candidate_table(mw: int, cw: int, aw: int):
    """Static candidate table: every joint (move[, comm]) one-hot an
    agent can emit — [C, aw], C = mw (* cw on comm scenarios). Shared
    by every expected-Q actor objective (vanilla / §4.2 approx /
    §4.3 ensemble)."""
    n_cand = mw * max(cw, 1)
    cand_np = np.zeros((n_cand, aw), np.float32)
    for k in range(mw):
        for j in range(max(cw, 1)):
            c_idx = k * max(cw, 1) + j
            cand_np[c_idx, k] = 1.0
            if cw:
                cand_np[c_idx, mw + j] = 1.0
    return jnp.asarray(cand_np)


def expected_q_actor_loss(actor_params, critic_params, obs_b, act_b, *,
                          mw: int, cw: int, ent_coef: float,
                          local_critic: bool = False):
    """The exact expected-Q actor objective (shared by the vanilla and
    §4.2-approx gradients; the ops/fused_maddpg_update kernel is pinned
    to ``jax.grad`` of THIS loss): each agent maximizes the exact
    expectation of its critic over its own (small, discrete) action set
    under its softmax policy — the joint (move, comm) grid on comm
    scenarios — with the other agents' buffer actions fixed: a
    deterministic gradient (no Gumbel straight-through noise), plus a
    small entropy bonus against premature collapse. All C candidates
    are scored in ONE batched critic eval per agent ([C*B] rows)
    instead of C separate forward passes. ``local_critic`` scores the
    candidates with the agent's OWN-(obs, act) critic instead of the
    centralized one (independent DDPG)."""
    batch, a, aw = act_b.shape
    cand = _candidate_table(mw, cw, aw)
    n_cand = cand.shape[0]
    logits = jax.vmap(
        lambda o: jax.vmap(actor_logits_i)(actor_params, o))(obs_b)
    probs_m = jax.nn.softmax(logits[..., :mw])      # [B, A, mw]
    probs_c = jax.nn.softmax(logits[..., mw:]) if cw else None
    total = 0.0
    for i in range(a):
        cp = jax.tree.map(lambda x: x[i], critic_params)
        if local_critic:
            joint = jnp.concatenate(
                [jnp.broadcast_to(obs_b[:, i],
                                  (n_cand, batch, obs_b.shape[-1])),
                 jnp.broadcast_to(cand[:, None, :],
                                  (n_cand, batch, aw))], axis=-1)
        else:
            mixed = jnp.broadcast_to(
                act_b.astype(jnp.float32),
                (n_cand,) + act_b.shape)            # [C, B, A, aw]
            mixed = mixed.at[:, :, i, :].set(cand[:, None, :])
            joint = jnp.concatenate(
                [jnp.broadcast_to(obs_b.reshape(1, batch, -1),
                                  (n_cand, batch,
                                   a * obs_b.shape[-1])),
                 mixed.reshape(n_cand, batch, -1)], axis=-1)
        q_all = critic_q_i(cp, joint)               # [C, B]
        w = probs_m[:, i]                           # [B, mw]
        if cw:
            w = (w[..., :, None] * probs_c[:, i][..., None, :]
                 ).reshape(batch, n_cand)
        exp_q = jnp.sum(w * jax.lax.stop_gradient(q_all.T), axis=-1)
        ent = -jnp.sum(probs_m[:, i]
                       * jnp.log(probs_m[:, i] + 1e-10), axis=-1)
        if cw:
            ent = ent - jnp.sum(
                probs_c[:, i] * jnp.log(probs_c[:, i] + 1e-10),
                axis=-1)
        total = total - (exp_q + ent_coef * ent).mean()
    return total / a


def maddpg_xla_grads(params, targets, obs_b, act_b, rew_b, obs2_b, *,
                     mw: int, cw: int, gamma: float, ent_coef: float,
                     local_critic: bool = False):
    """The XLA op-chain MADDPG gradient on a sampled batch: target
    actions -> TD targets -> critic ``value_and_grad`` -> exact
    expected-Q actor objective over the (move x comm) candidate grid.
    Identical math to the single-kernel engine (ops/fused_maddpg_update
    is pinned to ``jax.grad`` of exactly these losses); XLA compiles
    this chain within ~20% of the hand-written kernel at batch-1024
    spread shapes (tools/maddpg_ablate.py), so the chunk/DP trainers
    accept either engine. Returns
    ``(grads, (critic_loss, actor_loss, q_mean))``.

    ``local_critic=True`` is INDEPENDENT DDPG — each critic sees only
    its own (obs_i, act_i), the decentralized baseline of the MADDPG
    paper's central comparison (tools/ddpg_vs_maddpg.py). With ONE
    agent the two are bit-identical (pinned by
    tests/test_ddpg_baseline.py)."""
    batch, a, aw = act_b.shape

    # target actions from target actors (deterministic per-head
    # argmax one-hots)
    tgt_logits = jax.vmap(
        lambda o: jax.vmap(actor_logits_i)(targets["actor"], o))(obs2_b)
    act2 = jax.nn.one_hot(jnp.argmax(tgt_logits[..., :mw], -1), mw,
                          dtype=jnp.float32)
    if cw:
        act2 = jnp.concatenate(
            [act2, jax.nn.one_hot(jnp.argmax(tgt_logits[..., mw:], -1),
                                  cw, dtype=jnp.float32)], axis=-1)
    if local_critic:
        own2 = jnp.concatenate([obs2_b, act2], -1)        # [B, A, O+K]
        q_next = jax.vmap(critic_q_i, in_axes=(0, 1))(
            targets["critic"], own2)                      # [A, B]
    else:
        joint2 = _joint(obs2_b, act2)                     # [B, A*(O+K)]
        q_next = jax.vmap(
            lambda cp: critic_q_i(cp, joint2))(targets["critic"])
    # bootstrap through the time limit (episodes only truncate)
    y = rew_b.T + gamma * q_next                           # [A, B]
    y = jax.lax.stop_gradient(y)

    def critic_loss(critic_params):
        if local_critic:
            own = jnp.concatenate([obs_b, act_b], -1)
            q = jax.vmap(critic_q_i, in_axes=(0, 1))(critic_params,
                                                     own)
        else:
            joint = _joint(obs_b, act_b)
            q = jax.vmap(
                lambda cp: critic_q_i(cp, joint))(critic_params)
        return jnp.mean(jnp.square(q - y)), jnp.mean(q)

    (closs, qmean), cgrads = jax.value_and_grad(
        critic_loss, has_aux=True)(params["critic"])

    aloss, agrads = jax.value_and_grad(
        lambda ap: expected_q_actor_loss(
            ap, params["critic"], obs_b, act_b, mw=mw, cw=cw,
            ent_coef=ent_coef,
            local_critic=local_critic))(params["actor"])
    return ({"actor": agrads, "critic": cgrads}, (closs, aloss, qmean))


def build_fused_update(
    env: MpeEnv,
    batch: int = 256,
    gamma: float = 0.95,
    tau_polyak: float = 0.05,
    actor_lr: float = 1e-3,
    critic_lr: float = 1e-3,
    ent_coef: float = 0.01,
    hidden: int = 64,
    block_b: int = 1024,
    interpret: bool = False,
    compute_dtype=jnp.float32,
):
    """Drop-in fast path for ``build_maddpg``'s ``update_fn``: identical
    signature, batch sampling, adam/polyak/actor-gating — but the whole
    gradient (target actions, TD targets, critic backward, expected-Q
    actor objective) computed by ONE Pallas kernel
    (ops/fused_maddpg_update) instead of the XLA op chain. Grads are
    pinned to ``jax.grad`` of update_fn's losses by
    tests/test_fused_maddpg_update.py; pass the same hyperparameters as
    ``build_maddpg`` (and ``hidden`` matching ``init_maddpg``)."""
    from mpe_tpu.ops.fused_maddpg_update import fused_maddpg_update

    mw = 2 * env.spec.dim_p + 1
    aw = maddpg_act_dim(env)
    obs_dim = env.scenario.obs_width
    actor_opt = optax.adam(actor_lr)
    critic_opt = optax.adam(critic_lr)
    grads_fn = fused_maddpg_update(
        env.n_agents, obs_dim, aw, mw, hidden=hidden, batch=batch,
        gamma=gamma, ent_coef=ent_coef, block_b=block_b,
        interpret=interpret, compute_dtype=compute_dtype)

    @jax.jit
    def update_fn(params, targets, opt_states, buffer: Buffer, key,
                  do_actor=True):
        idx = jax.random.randint(key, (batch,), 0,
                                 jnp.maximum(buffer.size, 1))
        obs_b, act_b, rew_b, obs2_b = buffer._split(buffer.data[idx])
        grads, (closs, aloss, qmean) = grads_fn(
            params, targets, obs_b, act_b, rew_b, obs2_b)
        params, targets, opt_states = _apply_maddpg_update(
            params, targets, opt_states, grads, do_actor,
            actor_opt=actor_opt, critic_opt=critic_opt,
            tau_polyak=tau_polyak)
        metrics = {"critic_loss": closs, "actor_loss": aloss, "q": qmean}
        return params, targets, opt_states, metrics

    update_fn.init_opt = lambda params: {
        "actor": actor_opt.init(params["actor"]),
        "critic": critic_opt.init(params["critic"])}
    return update_fn


def _pack_opt_states(pack, opt_states):
    """Pack the adam moments of {"actor": state, "critic": state} with
    the kernel's params packer (moments are params-shaped; packing is
    leaf-for-leaf, so optimizer steps in packed space are elementwise-
    identical). count/EmptyState fields pass through untouched."""
    sa, sc = opt_states["actor"], opt_states["critic"]
    assert hasattr(sa[0], "mu") and hasattr(sc[0], "mu"), (
        "packed-space chunk scan expects optax.adam-style states")
    mu = pack({"actor": sa[0].mu, "critic": sc[0].mu})
    nu = pack({"actor": sa[0].nu, "critic": sc[0].nu})
    return {
        "actor": (sa[0]._replace(mu=mu["actor"], nu=nu["actor"]),)
        + tuple(sa[1:]),
        "critic": (sc[0]._replace(mu=mu["critic"], nu=nu["critic"]),)
        + tuple(sc[1:]),
    }


def _unpack_opt_states(unpack, opt_states):
    """Inverse of _pack_opt_states."""
    sa, sc = opt_states["actor"], opt_states["critic"]
    mu = unpack({"actor": sa[0].mu, "critic": sc[0].mu})
    nu = unpack({"actor": sa[0].nu, "critic": sc[0].nu})
    return {
        "actor": (sa[0]._replace(mu=mu["actor"], nu=nu["actor"]),)
        + tuple(sa[1:]),
        "critic": (sc[0]._replace(mu=mu["critic"], nu=nu["critic"]),)
        + tuple(sc[1:]),
    }


def _make_grads_fn(env, grad_engine: str, *, batch, gamma, ent_coef,
                   hidden, block_b, interpret, compute_dtype,
                   local_critic: bool = False):
    """grads(params, targets, obs_b, act_b, rew_b, obs2_b) with the
    chosen engine: "xla" = maddpg_xla_grads (op-chain jax.grad),
    "kernel" = the single-Pallas-kernel analytic gradient.
    ``local_critic`` (independent DDPG) is an XLA-engine-only option."""
    mw = 2 * env.spec.dim_p + 1
    aw = maddpg_act_dim(env)
    cw = aw - mw
    if grad_engine == "xla":
        def grads_fn(params, targets, obs_b, act_b, rew_b, obs2_b):
            return maddpg_xla_grads(params, targets, obs_b, act_b,
                                    rew_b, obs2_b, mw=mw, cw=cw,
                                    gamma=gamma, ent_coef=ent_coef,
                                    local_critic=local_critic)
        return grads_fn
    assert not local_critic, (
        "independent-DDPG critics need grad_engine='xla' (the Pallas "
        "update kernel is centralized-critic only)")
    assert grad_engine == "kernel", grad_engine
    from mpe_tpu.ops.fused_maddpg_update import fused_maddpg_update

    return fused_maddpg_update(
        env.n_agents, env.scenario.obs_width, aw, mw, hidden=hidden,
        batch=batch, gamma=gamma, ent_coef=ent_coef, block_b=block_b,
        interpret=interpret, compute_dtype=compute_dtype)


def build_fused_update_chunk(
    env: MpeEnv,
    n_updates: int,
    batch: int = 256,
    gamma: float = 0.95,
    tau_polyak: float = 0.05,
    actor_lr: float = 1e-3,
    critic_lr: float = 1e-3,
    ent_coef: float = 0.01,
    hidden: int = 64,
    block_b: int = 1024,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    grad_engine: str = "kernel",
    local_critic: bool = False,
):
    """``n_updates`` sequential fused updates per call with the replay
    batches PRE-GATHERED in one read: ``update_chunk(params, targets,
    opt_states, buffer, key, gates) -> (params, targets, opt_states,
    metrics)``.

    Sampling a batch per update costs ~12 us of random-row gather on
    chip — comparable to the 23 us gradient kernel — and TPU compute
    ops cannot overlap, so the per-update ``build_fused_update`` pays
    it serially every step. Replay contents don't change between the
    updates of a chunk (collection inserts once per chunk), so all
    ``n_updates`` batches can be gathered in ONE [U*B]-row read and the
    update scan runs gather-free. Update u samples with key
    ``fold_in(key, u)`` exactly like calling ``build_fused_update``'s
    update_fn in a loop would — pinned by tests/test_fused_maddpg_update.

    ``gates`` is a bool [n_updates] vector of per-update ``do_actor``
    flags (the critic-warmup / actor-delay schedule) or a bool
    [n_updates, A] matrix gating each AGENT's actor independently
    (two-timescale schedules — e.g. a slow speaker whose codebook the
    listener can track; see tools/crypto_study.py). A uniform row is
    bit-identical to the scalar flag. ``grad_engine``
    picks the gradient implementation: "kernel" (ops/fused_maddpg_update
    run entirely in PACKED weight space across the chunk — the measured
    default: 22.2 vs 27.9 ns/transition for the XLA op-chain at
    batch-1024 spread shapes, tools/maddpg_ablate.py) or "xla"
    (maddpg_xla_grads); the two are pinned equal at 1e-9 f64."""
    mw = 2 * env.spec.dim_p + 1
    aw = maddpg_act_dim(env)
    obs_dim = env.scenario.obs_width
    actor_opt = optax.adam(actor_lr)
    critic_opt = optax.adam(critic_lr)
    grads_fn = _make_grads_fn(env, grad_engine, batch=batch, gamma=gamma,
                              ent_coef=ent_coef, hidden=hidden,
                              block_b=block_b, interpret=interpret,
                              compute_dtype=compute_dtype,
                              local_critic=local_critic)

    packed = hasattr(grads_fn, "run_packed")

    gate_fields = None
    if packed:
        # Per-agent gate expansion for the PACKED (block-diagonal)
        # layout: pack A indicator param-trees once at build time —
        # agent j's mask is pack_params of a tree that is 1 on agent
        # j's slices and 0 elsewhere, so block-diagonal padding packs
        # to 0 and stays frozen (it is exactly zero and must remain
        # so). gate [A] -> per-leaf bool fields via one tiny tensordot.
        template = init_maddpg(jax.random.PRNGKey(0), obs_dim, aw,
                               env.n_agents, hidden=hidden)
        masks = []
        for j in range(env.n_agents):
            ind = jax.tree.map(
                lambda x, _j=j: jnp.zeros_like(x).at[_j].set(1.0),
                template)
            masks.append(grads_fn.pack_params(ind)["actor"])
        masks = jax.tree.map(lambda *ls: jnp.stack(ls), *masks)

        def gate_fields(gate, _masks=masks):
            g = gate.astype(jnp.float32)
            return jax.tree.map(
                lambda m: jnp.tensordot(g, m, axes=1) != 0, _masks)

    def _chunk_core(params, targets, opt_states, buffer: Buffer, key,
                    gates):
        """The update scan; with the kernel engine, params/targets/
        opt_states are in PACKED weight space throughout. ``gates`` is
        [n_updates] (scalar do_actor per update) or [n_updates, A]
        (per-agent two-timescale schedules)."""
        keys = jax.vmap(lambda u: jax.random.fold_in(key, u))(
            jnp.arange(n_updates, dtype=jnp.uint32))
        idx = jax.vmap(lambda k: jax.random.randint(
            k, (batch,), 0, jnp.maximum(buffer.size, 1)))(keys)
        rows = buffer.data[idx.reshape(-1)].reshape(
            n_updates, batch, buffer.data.shape[1])

        def body(c, xs):
            p, t, o = c
            rows_u, gate = xs
            if packed:
                grads, (closs, aloss, qmean) = grads_fn.run_packed(
                    p, t, rows_u)
            else:
                obs_b, act_b, rew_b, obs2_b = buffer._split(rows_u)
                grads, (closs, aloss, qmean) = grads_fn(
                    p, t, obs_b, act_b, rew_b, obs2_b)
            p, t, o = _apply_maddpg_update(
                p, t, o, grads, gate, actor_opt=actor_opt,
                critic_opt=critic_opt, tau_polyak=tau_polyak,
                gate_fields=gate_fields if packed else None)
            return (p, t, o), (closs, aloss, qmean)

        (params, targets, opt_states), (cl, al, q) = jax.lax.scan(
            body, (params, targets, opt_states),
            (rows, jnp.asarray(gates)))
        metrics = {"critic_loss": cl[-1], "actor_loss": al[-1],
                   "q": q[-1]}
        return params, targets, opt_states, metrics

    @jax.jit
    def update_chunk(params, targets, opt_states, buffer: Buffer, key,
                     gates):
        if packed:
            # kernel engine: the whole scan runs in PACKED weight
            # space (block-diagonal stacked operands). Packing costs
            # ~16 us — as much as the gradient kernel itself — so it
            # happens ONCE per chunk here instead of once per update
            # (or once per RUN via the pack_state/packed_step API);
            # adam/polyak/gating are elementwise, so packed-space
            # updates are bit-identical and the masked grads keep the
            # zero padding exactly zero.
            params = grads_fn.pack_params(params)
            targets = grads_fn.pack_params(targets)
            opt_states = _pack_opt_states(grads_fn.pack_params,
                                          opt_states)
        params, targets, opt_states, metrics = _chunk_core(
            params, targets, opt_states, buffer, key, gates)
        if packed:
            params = grads_fn.unpack_params(params)
            targets = grads_fn.unpack_params(targets)
            opt_states = _unpack_opt_states(grads_fn.unpack_params,
                                            opt_states)
        return params, targets, opt_states, metrics

    # persistent-packed-state API: training loops that keep the state
    # across MANY chunks (run_fused_maddpg, benches) pack once per run
    # instead of once per chunk. No-ops (identity) on the xla engine.
    def pack_state(params, targets, opt_states):
        if not packed:
            return (params, targets, opt_states)
        return (grads_fn.pack_params(params),
                grads_fn.pack_params(targets),
                _pack_opt_states(grads_fn.pack_params, opt_states))

    def unpack_state(pstate):
        if not packed:
            return pstate
        p, t, o = pstate
        return (grads_fn.unpack_params(p), grads_fn.unpack_params(t),
                _unpack_opt_states(grads_fn.unpack_params, o))

    def actor_of(pstate):
        """Collector-layout actor params from a (possibly packed)
        state — what build_fused_collect consumes."""
        if not packed:
            return pstate[0]["actor"]
        return grads_fn.unpack_params(pstate[0])["actor"]

    def packed_step(pstate, buffer: Buffer, key, gates):
        p, t, o = pstate
        p, t, o, metrics = _chunk_core(p, t, o, buffer, key, gates)
        return (p, t, o), metrics

    update_chunk.pack_state = pack_state
    update_chunk.unpack_state = unpack_state
    update_chunk.actor_of = actor_of
    update_chunk.packed_step = packed_step
    update_chunk.n_updates = n_updates
    update_chunk.init_opt = lambda params: {
        "actor": actor_opt.init(params["actor"]),
        "critic": critic_opt.init(params["critic"])}
    return update_chunk


def build_fused_maddpg_dp(
    env: MpeEnv,
    mesh,
    n_envs: int,
    horizon: int | None = None,
    updates_per_chunk: int | None = None,
    cap_chunks: int = 10,
    batch: int = 1024,
    gamma: float = 0.95,
    tau_polyak: float = 0.05,
    eps_greedy: float = 0.1,
    actor_lr: float = 1e-3,
    critic_lr: float = 1e-3,
    ent_coef: float = 0.01,
    hidden: int = 64,
    block_envs: int = 1024,
    t_chunk: int | None = None,
    interpret: bool = False,
    axis_name: str = "env",
    grad_engine: str = "kernel",
):
    """Data-parallel FULLY-fused MADDPG over a device mesh: per device,
    the collection kernel fills a LOCAL replay shard (envs never
    communicate; device d draws global block streams [d*B, (d+1)*B) so
    collection is invariant to the sharding — ops/fused_maddpg), then
    each update samples a local batch, computes the single-kernel
    gradient (ops/fused_maddpg_update), and ``pmean``s it over the mesh
    — the effective update batch is ``n_devices * batch`` and the adam/
    polyak steps stay bit-identical across devices, so params/targets
    remain replicated. This is the standard DP off-policy recipe: only
    the GRADIENT crosses devices; replay stays device-local.

    -> ``step(state, seed) -> (state, metrics)`` with
    ``state = (params, targets, opt_states, local_buffer)`` where the
    buffer pytree's ``data`` is sharded over ``axis_name`` (build the
    initial one with ``step.init_buffer()``; params from
    ``init_maddpg``). One call = one collected chunk (``n_envs *
    horizon`` global transitions) + ``updates_per_chunk`` updates
    (default ``horizon``, the 1-update-per-n_envs-transitions ratio of
    build_maddpg's loop).

    ``seed`` must be UNIQUE per ``step`` call (e.g. the loop index, as
    the tests use): both the collection stream and the replay-sample
    keys derive from it, so repeating a seed silently replays identical
    exploration and identical batch indices."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from mpe_tpu.ops.fused_maddpg import fused_maddpg_trajectory
    from mpe_tpu.ops.fused_rollout import pick_block_envs
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario

    assert env.action_mode is ActionMode.DISCRETE
    horizon = horizon or env.max_steps
    assert horizon, "env needs max_steps (the episode horizon)"
    updates_per_chunk = updates_per_chunk or horizon
    kscn = kernel_scenario(env.scenario)

    n_dev = mesh.devices.size
    assert n_envs % n_dev == 0, (n_envs, n_dev)
    local_envs = n_envs // n_dev
    local_block = pick_block_envs(local_envs, block_envs)
    local_blocks = local_envs // local_block
    if t_chunk is None:
        t_chunk = next(c for c in (8, 5, 4, 2, 1) if horizon % c == 0)
    aw = maddpg_act_dim(env)
    obs_dim = kscn.obs_w
    a = env.n_agents
    rows_per_chunk = horizon * local_envs
    cap_local = cap_chunks * rows_per_chunk

    tmpl = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        init_maddpg(jax.random.PRNGKey(0), obs_dim, aw, a,
                    hidden=hidden)["actor"])
    traj = fused_maddpg_trajectory(
        kscn, tmpl, n_envs=local_envs, n_steps=horizon, horizon=horizon,
        eps_greedy=eps_greedy, block_envs=local_block, t_chunk=t_chunk,
        interpret=interpret, emit_rows=True)
    grads_fn = _make_grads_fn(env, grad_engine, batch=batch, gamma=gamma,
                              ent_coef=ent_coef, hidden=hidden,
                              block_b=min(1024, batch),
                              interpret=interpret,
                              compute_dtype=jnp.float32)
    actor_opt = optax.adam(actor_lr)
    critic_opt = optax.adam(critic_lr)

    def local_iter(params, targets, opt_states, buffer: Buffer, seed,
                   gates):
        my = jax.lax.axis_index(axis_name)
        rows_3d = traj(seed, params["actor"],
                       my * jnp.int32(local_blocks))   # [T, N, W] rows
        rows_all = rows_3d.reshape(rows_per_chunk, -1)
        rew_a = rows_3d[..., a * (obs_dim + aw) : a * (obs_dim + aw) + a]
        # chunk inserts stay ring-aligned -> contiguous fast path
        buffer = buffer._replace(
            data=jax.lax.dynamic_update_slice_in_dim(
                buffer.data, rows_all, buffer.ptr, 0),
            ptr=(buffer.ptr + rows_per_chunk) % cap_local,
            size=jnp.minimum(buffer.size + rows_per_chunk, cap_local))

        # pre-gather every update's LOCAL batch in one replay read;
        # per-device keys diverge (fold axis_name index) so the pmean'd
        # gradient averages n_dev * batch distinct samples
        base = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(11), seed), my)
        keys = jax.vmap(lambda u: jax.random.fold_in(base, u))(
            jnp.arange(updates_per_chunk, dtype=jnp.uint32))
        idx = jax.vmap(lambda k: jax.random.randint(
            k, (batch,), 0, jnp.maximum(buffer.size, 1)))(keys)
        rows = buffer.data[idx.reshape(-1)].reshape(
            updates_per_chunk, batch, buffer.data.shape[1])

        packed = hasattr(grads_fn, "run_packed")
        if packed:   # see build_fused_update_chunk: pack once per chunk
            params = grads_fn.pack_params(params)
            targets = grads_fn.pack_params(targets)
            opt_states = _pack_opt_states(grads_fn.pack_params,
                                          opt_states)

        def upd(c, xs):
            p, t, o = c
            rows_u, gate = xs
            if packed:
                grads, (closs, aloss, qmean) = grads_fn.run_packed(
                    p, t, rows_u)
            else:
                obs_b, act_b, rew_b, obs2_b = buffer._split(rows_u)
                grads, (closs, aloss, qmean) = grads_fn(
                    p, t, obs_b, act_b, rew_b, obs2_b)
            grads = jax.lax.pmean(grads, axis_name)
            p, t, o = _apply_maddpg_update(
                p, t, o, grads, gate, actor_opt=actor_opt,
                critic_opt=critic_opt, tau_polyak=tau_polyak)
            return (p, t, o), closs

        (params, targets, opt_states), cl = jax.lax.scan(
            upd, (params, targets, opt_states),
            (rows, jnp.asarray(gates)))
        if packed:
            params = grads_fn.unpack_params(params)
            targets = grads_fn.unpack_params(targets)
            opt_states = _unpack_opt_states(grads_fn.unpack_params,
                                            opt_states)
        metrics = {
            "mean_reward": jax.lax.pmean(rew_a.mean(), axis_name),
            "critic_loss": jax.lax.pmean(cl[-1], axis_name),
        }
        return params, targets, opt_states, buffer, metrics

    buf_specs = Buffer(data=P(axis_name), ptr=P(), size=P(),
                       n_agents=a, obs_dim=obs_dim, act_dim=aw)

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), buf_specs, P(), P()),
             out_specs=(P(), P(), P(), buf_specs, P()),
             check_vma=False)
    def step_impl(params, targets, opt_states, buffer, seed, gates):
        return local_iter(params, targets, opt_states, buffer, seed,
                          gates)

    def step(state, seed, gates=None):
        params, targets, opt_states, buffer = state
        if gates is None:
            gates = jnp.ones((updates_per_chunk,), bool)
        assert jnp.asarray(gates).ndim == 1, (
            "the DP trainer takes scalar per-update gates; per-agent "
            "[U, A] gates are a build_fused_update_chunk feature")
        params, targets, opt_states, buffer, metrics = step_impl(
            params, targets, opt_states, buffer,
            jnp.asarray(seed, jnp.int32), jnp.asarray(gates))
        return (params, targets, opt_states, buffer), metrics

    step.init_buffer = lambda: init_buffer(n_dev * cap_local, a, obs_dim,
                                           aw)
    step.init_opt = lambda params: {
        "actor": actor_opt.init(params["actor"]),
        "critic": critic_opt.init(params["critic"])}
    step.updates_per_chunk = updates_per_chunk
    step.transitions_per_chunk = n_envs * horizon
    return step


def build_fused_collect(
    env: MpeEnv,
    n_envs: int,
    n_steps: int,
    eps_greedy: float = 0.1,
    block_envs: int = 1024,
    t_chunk: int | None = None,
    interpret: bool = False,
):
    """Fused replay collection: ``collect_chunk(actor_params, buffer,
    seed) -> (buffer, mean_reward)`` inserts ``n_steps × n_envs``
    transitions per call, collected by the per-agent-network Pallas
    kernel (ops/fused_maddpg) — the drop-in fast path for
    ``build_maddpg``'s one-env-step-per-dispatch ``collect_fn``. Same
    stored-transition semantics: per factorized head (move + comm on
    speaking scenarios), hard Gumbel(-max) actions ε-mixed with
    uniform one-hots, per-agent rewards, and the TRUE pre-reset next
    obs (bootstrap through the time limit). Episodes restart each chunk,
    so pass ``n_steps`` as a multiple of the env horizon."""
    from mpe_tpu.ops.fused_maddpg import fused_maddpg_trajectory
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario

    assert env.action_mode is ActionMode.DISCRETE
    horizon = env.max_steps
    assert horizon and n_steps % horizon == 0, (
        f"n_steps ({n_steps}) must be a multiple of the env horizon "
        f"({horizon}) so every stored episode is complete")
    kscn = kernel_scenario(env.scenario)
    if t_chunk is None:
        t_chunk = next(c for c in (8, 5, 4, 2, 1) if n_steps % c == 0)

    params0 = init_maddpg(jax.random.PRNGKey(0), kscn.obs_w,
                          maddpg_act_dim(env), env.n_agents)
    tmpl = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                        params0["actor"])
    traj = fused_maddpg_trajectory(
        kscn, tmpl, n_envs=n_envs, n_steps=n_steps, horizon=horizon,
        eps_greedy=eps_greedy, block_envs=block_envs, t_chunk=t_chunk,
        interpret=interpret, emit_rows=True)
    rows_per_chunk = n_steps * n_envs
    a = env.n_agents

    @jax.jit
    def collect_chunk(actor_params, buffer: Buffer, seed):
        # the kernel emits finished replay rows [T, N, W] (per-agent
        # rewards included), so the old rowize relayout (moveaxis +
        # reshape + concat over the whole chunk — ~2 ns/transition of
        # pure HBM traffic) is gone; reshape is free
        rows_3d = traj(seed, actor_params)
        cap = buffer.data.shape[0]
        rows_all = rows_3d.reshape(rows_per_chunk, -1)
        # mean reward for metrics: the per-agent reward columns
        rew_a = rows_3d[..., a * (buffer.obs_dim + buffer.act_dim)
                        : a * (buffer.obs_dim + buffer.act_dim) + a]

        # Fast path: the chunk fits before the ring edge — ONE contiguous
        # dynamic_update_slice into the fused row table. Fallback (the
        # chunk WRAPS, only possible when interleaved per-step collect_fn
        # inserts left ptr misaligned): modular row scatter, because
        # dynamic_update_slice would CLAMP at the capacity edge instead
        # of wrapping, silently clobbering newer rows. The scatter costs
        # ~70% of collect time on chip (tools/train_bench.py), so it
        # must stay off the common path.
        def _contiguous(b: Buffer) -> Buffer:
            return b._replace(data=jax.lax.dynamic_update_slice_in_dim(
                b.data, rows_all, b.ptr, 0))

        def _wrapping(b: Buffer) -> Buffer:
            rows = (b.ptr + jnp.arange(rows_per_chunk)) % cap
            return b._replace(data=b.data.at[rows].set(rows_all))

        buffer = jax.lax.cond(buffer.ptr + rows_per_chunk <= cap,
                              _contiguous, _wrapping, buffer)
        buffer = buffer._replace(
            ptr=(buffer.ptr + rows_per_chunk) % cap,
            size=jnp.minimum(buffer.size + rows_per_chunk, cap),
        )
        return buffer, rew_a.mean()

    collect_chunk.rows_per_chunk = rows_per_chunk
    return collect_chunk
