"""MADDPG with learned approximations of other agents' policies
(Lowe et al. 2017 §4.2, eq. 6-7) — centralized training WITHOUT
assuming access to the other agents' true policies.

Vanilla MADDPG's TD target uses every agent's true target actor to form
the next joint action. The paper's relaxation: each agent i maintains
an APPROXIMATION \\hat\\mu_i^j of every other agent j's policy, fit
online by maximum likelihood on the (o_j, a_j) pairs it observes in the
replay buffer (eq. 6, with an entropy regularizer), and bootstraps its
critic through the approximations' target copies instead (eq. 7): agent
i's next joint action is its OWN target actor for itself plus
\\hat\\mu'_i^j(o_j) for everyone else. Execution stays fully
decentralized and identical to vanilla.

Exact-reduction pin (tests/test_approx_others.py): with the
approximation nets' weights COPIED from the true actors, the TD targets
— and therefore the actor/critic gradients — equal vanilla
``maddpg_xla_grads`` bit-for-bit; training from scratch, the
approximations' held-out prediction accuracy climbs while the usual
convergence holds (the paper reports the approximations are good
enough not to hurt — reproduced here on simple_spread /
simple_adversary by tools/approx_study.py).

Reference anchors: /root/reference/README.md:71-78 (paper); no learner
code exists in the reference repo — this is net-new TPU machinery on
the XLA gradient path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from mpe_tpu.learner.maddpg import (Buffer, _apply_maddpg_update,
                                    _joint, actor_logits_i, critic_q_i,
                                    expected_q_actor_loss, init_maddpg,
                                    maddpg_act_dim)
from mpe_tpu.learner._nets import dense_init as _dense


def init_approx(key, obs_dim: int, act_dim: int, n_agents: int,
                hidden: int = 64):
    """Approximation nets: leaf axes [A_observer, A_modeled, ...] —
    row i holds agent i's models of every agent j's policy (the (i, i)
    slot exists but is never used: agents know their own policy)."""
    def one(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {"l1": _dense(k1, obs_dim, hidden),
                "l2": _dense(k2, hidden, hidden),
                "out": _dense(k3, hidden, act_dim,
                              scale=jnp.asarray(0.01, jnp.float32))}

    rows = []
    for i in range(n_agents):
        ks = jax.random.split(jax.random.fold_in(key, i), n_agents)
        rows.append(jax.tree.map(lambda *xs: jnp.stack(xs),
                                 *[one(k) for k in ks]))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *rows)


def approx_from_actors(actor_params, n_agents: int):
    """Approximation nets copied from the TRUE actors: slot (i, j) =
    actor j — the configuration under which approx-MADDPG reduces
    exactly to vanilla (the keystone test pin)."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_agents,) + x.shape),
        actor_params)


def _heads_one_hot(logits, mw: int, cw: int):
    """Per-head argmax one-hots: [..., aw] logits -> [..., aw]."""
    act = jax.nn.one_hot(jnp.argmax(logits[..., :mw], -1), mw,
                         dtype=jnp.float32)
    if cw:
        act = jnp.concatenate(
            [act, jax.nn.one_hot(jnp.argmax(logits[..., mw:], -1), cw,
                                 dtype=jnp.float32)], axis=-1)
    return act


def approx_xla_grads(params, targets, obs_b, act_b, rew_b, obs2_b, *,
                     mw: int, cw: int, gamma: float, ent_coef: float,
                     approx_ent: float = 1e-3):
    """The §4.2 MADDPG gradient on a sampled batch. ``params`` /
    ``targets`` carry an extra ``"approx"`` tree ([A, A, ...] nets).
    Differences from ``maddpg_xla_grads``:

      - TD targets per OBSERVER: agent i's next joint action uses its
        own target actor for slot i and its target approximations for
        every other slot (eq. 7), so ``joint2`` is [A, B, W] instead of
        shared.
      - An additional maximum-likelihood gradient for the
        approximations: per-head cross-entropy of \\hat\\mu_i^j(o_j)
        against the logged action a_j, plus ``approx_ent`` entropy
        (eq. 6). Fit on the CURRENT obs (the data every agent observes
        centrally during training).

    Returns ``(grads, (critic_loss, actor_loss, approx_loss))`` with
    ``grads`` keyed ``actor/critic/approx``."""
    batch, a, aw = act_b.shape

    # ---- approximation MLE on (obs, act) ----
    def approx_loss_fn(approx_params):
        # logits[i, j, b] of observer i's model of agent j on o_j
        def observer(p_row):                      # [A, ...] nets
            return jax.vmap(
                lambda p, o: actor_logits_i(p, o),
                in_axes=(0, 1))(p_row, obs_b)     # [A_j, B, aw]
        logits = jax.vmap(observer)(approx_params)  # [A_i, A_j, B, aw]
        lp_m = jax.nn.log_softmax(logits[..., :mw])
        ce = -jnp.einsum("ijbk,bjk->ijb", lp_m, act_b[..., :mw])
        ent = -jnp.sum(jnp.exp(lp_m) * lp_m, -1)
        if cw:
            lp_c = jax.nn.log_softmax(logits[..., mw:])
            ce = ce - jnp.einsum("ijbk,bjk->ijb", lp_c, act_b[..., mw:])
            ent = ent - jnp.sum(jnp.exp(lp_c) * lp_c, -1)
        # (i, i) slots are unused downstream; masking them out keeps
        # the loss honest about what the machinery needs
        off_diag = 1.0 - jnp.eye(a)[:, :, None]
        return ((ce - approx_ent * ent) * off_diag).sum() \
            / (a * max(a - 1, 1) * batch)

    ploss, pgrads = jax.value_and_grad(approx_loss_fn)(params["approx"])

    # ---- per-observer TD targets through the approximations ----
    def tgt_logits_for(i):
        # slot j != i: observer i's TARGET approximation of j
        p_row = jax.tree.map(lambda x: x[i], targets["approx"])
        appr = jax.vmap(lambda p, o: actor_logits_i(p, o),
                        in_axes=(0, 1))(p_row, obs2_b)   # [A_j, B, aw]
        appr = jnp.swapaxes(appr, 0, 1)                   # [B, A, aw]
        # slot i: the observer's own true target actor
        own_p = jax.tree.map(lambda x: x[i], targets["actor"])
        own = actor_logits_i(own_p, obs2_b[:, i])         # [B, aw]
        return appr.at[:, i, :].set(own)

    act2 = jnp.stack([_heads_one_hot(tgt_logits_for(i), mw, cw)
                      for i in range(a)])                 # [A, B, A, aw]
    joint2 = jax.vmap(lambda a2: _joint(obs2_b, a2))(act2)  # [A, B, W]
    q_next = jax.vmap(critic_q_i)(targets["critic"], joint2)  # [A, B]
    y = jax.lax.stop_gradient(rew_b.T + gamma * q_next)

    def critic_loss(critic_params):
        joint = _joint(obs_b, act_b)
        q = jax.vmap(lambda cp: critic_q_i(cp, joint))(critic_params)
        return jnp.mean(jnp.square(q - y)), jnp.mean(q)

    (closs, qmean), cgrads = jax.value_and_grad(
        critic_loss, has_aux=True)(params["critic"])

    # actor loss: IDENTICAL to vanilla (expected-Q over the candidate
    # grid with the others' buffer actions fixed) — the shared helper
    # is what keeps the exact-reduction pin structural
    aloss, agrads = jax.value_and_grad(
        lambda ap: expected_q_actor_loss(
            ap, params["critic"], obs_b, act_b, mw=mw, cw=cw,
            ent_coef=ent_coef))(params["actor"])
    return ({"actor": agrads, "critic": cgrads, "approx": pgrads},
            (closs, aloss, ploss))


def build_approx_runner(
    scenario: str,
    n_envs: int = 64,
    horizon: int = 25,
    batch: int = 1024,
    gamma: float = 0.95,
    tau: float = 0.01,
    lr: float = 1e-3,
    approx_lr: float = 1e-3,
    ent_coef: float = 0.01,
    eps: float = 0.1,
    block: int = 40,
    hidden: int = 64,
):
    """§4.2 MADDPG training, built once; -> ``run(updates, seed,
    init_params=None, actor_start=1000) -> (params, info)`` with
    ``params = {actor, critic, approx}``. Collection (decentralized,
    true actors) runs in the fused Pallas kernel; updates bootstrap
    through the learned approximations only."""
    from mpe_tpu import scenarios
    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner.maddpg import build_fused_collect, init_buffer

    cpu = jax.default_backend() == "cpu"
    scn = scenarios.load(scenario)
    env = MpeEnv(scn, max_steps=horizon, auto_reset=True)
    a = env.n_agents
    assert a >= 2, (
        f"{scenario} has {a} agent(s) — §4.2 models OTHER agents' "
        f"policies; with no other agents the approx loss is vacuous")
    mw = 2 * env.spec.dim_p + 1
    aw = maddpg_act_dim(env)
    cw = aw - mw
    obs_dim = scn.obs_width
    capacity = n_envs * 1600
    collect = build_fused_collect(
        env, n_envs=n_envs, n_steps=horizon,
        block_envs=min(1024, n_envs), eps_greedy=eps, interpret=cpu)
    opts = {"actor": optax.adam(lr), "critic": optax.adam(lr),
            "approx": optax.adam(approx_lr)}

    def update(carry, xs):
        params, targets, opt_states = carry
        rows_u, gate = xs
        buf_meta = Buffer(data=rows_u, ptr=jnp.int32(0),
                          size=jnp.int32(rows_u.shape[0]),
                          n_agents=a, obs_dim=obs_dim, act_dim=aw)
        obs_b, act_b, rew_b, obs2_b = buf_meta._split(rows_u)
        grads, (closs, aloss, ploss) = approx_xla_grads(
            params, targets, obs_b, act_b, rew_b, obs2_b,
            mw=mw, cw=cw, gamma=gamma, ent_coef=ent_coef)
        # actor/critic tail (adam, actor gating, polyak) is the shared
        # helper every MADDPG update variant uses; the approx nets get
        # their own ungated adam step + polyak (they warm up with the
        # critic)
        ac_p, ac_t, ac_o = _apply_maddpg_update(
            {k: params[k] for k in ("actor", "critic")},
            {k: targets[k] for k in ("actor", "critic")},
            {k: opt_states[k] for k in ("actor", "critic")},
            {k: grads[k] for k in ("actor", "critic")}, gate,
            actor_opt=opts["actor"], critic_opt=opts["critic"],
            tau_polyak=tau)
        pupd, p_opt = opts["approx"].update(
            grads["approx"], opt_states["approx"], params["approx"])
        new_approx = optax.apply_updates(params["approx"], pupd)
        new_p = {**ac_p, "approx": new_approx}
        targets = {**ac_t, "approx": jax.tree.map(
            lambda t, p: (1 - tau) * t + tau * p, targets["approx"],
            new_approx)}
        new_o = {**ac_o, "approx": p_opt}
        return (new_p, targets, new_o), closs

    def chunk_body(carry, i):
        params, targets, opt_states, buffer, base_key, astart = carry
        buffer, mr = collect(params["actor"], buffer, 10_000 + i)
        kc = jax.random.fold_in(base_key, i)
        keys = jax.vmap(lambda u: jax.random.fold_in(kc, u))(
            jnp.arange(horizon, dtype=jnp.uint32))
        idx = jax.vmap(lambda k: jax.random.randint(
            k, (batch,), 0, jnp.maximum(buffer.size, 1)))(keys)
        rows = buffer.data[idx.reshape(-1)].reshape(
            horizon, batch, buffer.data.shape[1])
        k_upd = jnp.arange(horizon)
        gates = (i * horizon + k_upd >= astart) & (k_upd % 2 == 0)
        (params, targets, opt_states), cl = jax.lax.scan(
            update, (params, targets, opt_states), (rows, gates))
        return (params, targets, opt_states, buffer, base_key,
                astart), (mr, cl[-1])

    @partial(jax.jit, static_argnums=2)
    def run_block(carry, chunk0, n):
        return jax.lax.scan(chunk_body, carry,
                            chunk0 + jnp.arange(n, dtype=jnp.int32))

    def run(updates: int, seed: int = 0, init_params=None,
            actor_start: int = 1000, progress=None):
        n_chunks = max(1, updates // horizon)
        if init_params is None:
            params = init_maddpg(jax.random.PRNGKey(seed), obs_dim, aw,
                                 a, hidden=hidden)
            params["approx"] = init_approx(
                jax.random.PRNGKey(seed + 31), obs_dim, aw, a,
                hidden=hidden)
        else:
            params = jax.tree.map(
                lambda x: jnp.asarray(x, jnp.float32), init_params)
        targets = jax.tree.map(lambda x: x, params)
        opt_states = {k: opts[k].init(params[k])
                      for k in ("actor", "critic", "approx")}
        buffer = init_buffer(capacity, a, obs_dim, aw)
        base_key = jax.random.PRNGKey(seed + 7)
        for i in range(max(1, 200 // horizon)):
            buffer, _ = collect(params["actor"], buffer, i)

        carry = (params, targets, opt_states, buffer, base_key,
                 jnp.int32(actor_start))
        done = 0
        while done < n_chunks:
            n = min(block, n_chunks - done)
            carry, (mr, cl) = run_block(carry, jnp.int32(done), n)
            done += n
            if progress is not None:
                progress(done, n_chunks, float(mr[-1]), float(cl[-1]))
        params = carry[0]
        info = {"scenario": scenario, "updates": n_chunks * horizon,
                "n_envs": n_envs, "batch": batch, "tau": tau, "lr": lr,
                "approx_lr": approx_lr, "seed": seed}
        return params, info

    run.env = env
    run.scenario = scn
    return run
