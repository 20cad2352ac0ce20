"""Approximate other-agent policies (learner/approx_others.py; paper
§4.2): the exact-reduction pin plus the learning properties the study
tool rests on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

optax = pytest.importorskip("optax")

from mpe_tpu import scenarios
from mpe_tpu.envs import MpeEnv
from mpe_tpu.learner.approx_others import (approx_from_actors,
                                           approx_xla_grads,
                                           build_approx_runner,
                                           init_approx)
from mpe_tpu.learner.maddpg import (init_maddpg, maddpg_act_dim,
                                    maddpg_xla_grads)

GAMMA, ENTC = 0.95, 0.01


def _dims(name):
    scn = scenarios.load(name)
    env = MpeEnv(scn)
    mw = 2 * env.spec.dim_p + 1
    aw = maddpg_act_dim(env)
    return scn.obs_width, env.n_agents, mw, aw - mw


def _random_batch(key, batch, a, obs_dim, mw, cw):
    ks = jax.random.split(key, 5)
    obs = jax.random.normal(ks[0], (batch, a, obs_dim), jnp.float32)
    obs2 = jax.random.normal(ks[1], (batch, a, obs_dim), jnp.float32)
    rew = jax.random.normal(ks[2], (batch, a), jnp.float32)
    act = jax.nn.one_hot(
        jax.random.randint(ks[3], (batch, a), 0, mw), mw)
    if cw:
        act = jnp.concatenate(
            [act, jax.nn.one_hot(
                jax.random.randint(ks[4], (batch, a), 0, cw), cw)], -1)
    return obs, act.astype(jnp.float32), rew, obs2


@pytest.mark.parametrize("scen", ["simple_spread",
                                  "simple_speaker_listener"])
def test_true_actor_approx_reduces_to_vanilla(scen):
    """With the approximations copied from the true actors (slot (i,j)
    = actor j), every TD target equals vanilla's, so actor and critic
    grads must match maddpg_xla_grads exactly."""
    obs_dim, a, mw, cw = _dims(scen)
    aw = mw + cw
    params = init_maddpg(jax.random.PRNGKey(0), obs_dim, aw, a)
    targets = init_maddpg(jax.random.PRNGKey(1), obs_dim, aw, a)
    pa = {**params, "approx": approx_from_actors(params["actor"], a)}
    ta = {**targets, "approx": approx_from_actors(targets["actor"], a)}
    batch = _random_batch(jax.random.PRNGKey(2), 64, a, obs_dim, mw, cw)
    grads_a, (cl_a, al_a, _) = approx_xla_grads(
        pa, ta, *batch, mw=mw, cw=cw, gamma=GAMMA, ent_coef=ENTC)
    grads_v, (cl_v, al_v, _) = maddpg_xla_grads(
        params, targets, *batch, mw=mw, cw=cw, gamma=GAMMA,
        ent_coef=ENTC)
    for key in ("actor", "critic"):
        jax.tree.map(
            lambda g, w: np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-6),
            grads_a[key], grads_v[key])
    np.testing.assert_allclose(float(cl_a), float(cl_v), atol=1e-6)
    np.testing.assert_allclose(float(al_a), float(al_v), atol=1e-6)


def test_mle_gradient_descends_prediction_loss():
    """A few adam steps on the approximation MLE gradient must reduce
    the cross-entropy of predicting the logged actions."""
    obs_dim, a, mw, cw = _dims("simple_spread")
    aw = mw + cw
    params = init_maddpg(jax.random.PRNGKey(0), obs_dim, aw, a)
    params["approx"] = init_approx(jax.random.PRNGKey(5), obs_dim, aw,
                                   a)
    targets = jax.tree.map(lambda x: x, params)
    # actions actually drawn from the true actors (argmax), so there is
    # signal to fit
    obs, _, rew, obs2 = _random_batch(jax.random.PRNGKey(2), 256, a,
                                      obs_dim, mw, cw)
    from mpe_tpu.learner.maddpg import actor_logits_i
    logits = jax.vmap(
        lambda o: jax.vmap(actor_logits_i)(params["actor"], o))(obs)
    act = jax.nn.one_hot(jnp.argmax(logits[..., :mw], -1), mw,
                         dtype=jnp.float32)
    opt = optax.adam(1e-2)
    ost = opt.init(params["approx"])
    losses = []
    for _ in range(25):
        grads, (_, _, ploss) = approx_xla_grads(
            params, targets, obs, act, rew, obs2, mw=mw, cw=cw,
            gamma=GAMMA, ent_coef=ENTC)
        upd, ost = opt.update(grads["approx"], ost, params["approx"])
        params["approx"] = optax.apply_updates(params["approx"], upd)
        losses.append(float(ploss))
    assert losses[-1] < 0.6 * losses[0], losses[::6]


def test_runner_end_to_end_and_approx_predicts():
    """Short end-to-end run: the runner executes through the fused
    collection kernel, and the trained approximations predict the
    other agents' greedy actions far better than chance."""
    runner = build_approx_runner("simple_spread", n_envs=8, batch=64,
                                 block=4)
    params, info = runner(200, seed=0, actor_start=40)
    assert info["updates"] == 200
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(params))

    from mpe_tpu.learner.maddpg import actor_logits_i
    obs_dim, a, mw, cw = _dims("simple_spread")
    # in-distribution eval: observations from rolling the trained
    # greedy policy itself (the data the approximations were fit on)
    env = runner.env
    v_reset = jax.vmap(env.reset)
    v_step = jax.vmap(env.step)
    states, obs_t = v_reset(jax.random.split(jax.random.PRNGKey(9), 64))
    collected = [obs_t]
    for t in range(7):
        logits = jax.vmap(
            lambda o: jax.vmap(actor_logits_i)(params["actor"], o))(
            obs_t)
        move = jax.nn.one_hot(jnp.argmax(logits[..., :mw], -1), mw,
                              dtype=env.dtype)
        pad = jnp.zeros(move.shape[:-1]
                        + (env.action_width - mw,), env.dtype)
        states, obs_t, _, _, _ = v_step(
            states, jnp.concatenate([move, pad], -1),
            jax.random.split(jax.random.fold_in(
                jax.random.PRNGKey(11), t), 64))
        collected.append(obs_t)
    obs = jnp.concatenate(collected).astype(jnp.float32)  # [512, A, O]
    true_logits = jax.vmap(
        lambda o: jax.vmap(actor_logits_i)(params["actor"], o))(obs)
    true_move = jnp.argmax(true_logits[..., :mw], -1)     # [B, A]
    hits = []
    for i in range(a):
        p_row = jax.tree.map(lambda x: x[i], params["approx"])
        appr = jax.vmap(lambda p, o: actor_logits_i(p, o),
                        in_axes=(0, 1))(p_row, obs)       # [A, B, aw]
        pred = jnp.argmax(appr[..., :mw], -1)             # [A, B]
        for j in range(a):
            if j != i:
                hits.append(float((pred[j] == true_move[:, j]).mean()))
    acc = float(np.mean(hits))
    assert acc > 0.5, f"approx nets at {acc:.2f} (chance 0.2)"
