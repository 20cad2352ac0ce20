"""Independent-DDPG baseline (``local_critic=True`` through
init_maddpg / maddpg_xla_grads / the fused-loop runner) — the
decentralized-critic baseline of the MADDPG paper's central comparison
(tools/ddpg_vs_maddpg.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

optax = pytest.importorskip("optax")

from mpe_tpu import scenarios
from mpe_tpu.envs import MpeEnv
from mpe_tpu.learner.fused_loop import build_fused_maddpg_runner
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


def test_single_agent_ddpg_equals_maddpg():
    """With ONE agent, the joint (obs, act) IS the own (obs, act):
    local_critic must equal the centralized gradient. The two paths are
    DIFFERENT XLA programs computing the same arithmetic, so the pin is
    a tight tolerance rather than bit equality (reassociation across
    compiler versions is allowed; the math is not)."""
    obs_dim, a, mw, cw = _dims("simple")
    assert a == 1
    aw = mw + cw
    params = init_maddpg(jax.random.PRNGKey(0), obs_dim, aw, a)
    targets = init_maddpg(jax.random.PRNGKey(1), obs_dim, aw, a)
    batch = _random_batch(jax.random.PRNGKey(2), 64, a, obs_dim, mw, cw)
    g_loc, (cl_l, al_l, q_l) = maddpg_xla_grads(
        params, targets, *batch, mw=mw, cw=cw, gamma=GAMMA,
        ent_coef=ENTC, local_critic=True)
    g_cen, (cl_c, al_c, q_c) = maddpg_xla_grads(
        params, targets, *batch, mw=mw, cw=cw, gamma=GAMMA,
        ent_coef=ENTC, local_critic=False)
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-6, rtol=1e-6),
        g_loc, g_cen)
    for l, c in ((cl_l, cl_c), (al_l, al_c), (q_l, q_c)):
        np.testing.assert_allclose(float(l), float(c), atol=1e-6)


def test_multi_agent_ddpg_ignores_others():
    """The DDPG critic gradient for agent i must be INVARIANT to the
    other agents' observations and actions in the batch — the defining
    property of the independent baseline (and exactly what the
    centralized gradient is not)."""
    obs_dim, a, mw, cw = _dims("simple_spread")
    aw = mw + cw
    params = init_maddpg(jax.random.PRNGKey(0), obs_dim, aw, a,
                         local_critic=True)
    targets = init_maddpg(jax.random.PRNGKey(1), obs_dim, aw, a,
                          local_critic=True)
    obs, act, rew, obs2 = _random_batch(
        jax.random.PRNGKey(2), 64, a, obs_dim, mw, cw)
    g1, _ = maddpg_xla_grads(params, targets, obs, act, rew, obs2,
                             mw=mw, cw=cw, gamma=GAMMA, ent_coef=ENTC,
                             local_critic=True)
    # scramble everything about agents 1 and 2
    k = jax.random.PRNGKey(9)
    obs_s = obs.at[:, 1:].add(
        jax.random.normal(k, obs[:, 1:].shape, jnp.float32))
    obs2_s = obs2.at[:, 1:].add(
        jax.random.normal(jax.random.fold_in(k, 1), obs2[:, 1:].shape,
                          jnp.float32))
    act_s = act.at[:, 1:].set(jnp.roll(act[:, 1:], 1, axis=0))
    g2, _ = maddpg_xla_grads(params, targets, obs_s, act_s, rew, obs2_s,
                             mw=mw, cw=cw, gamma=GAMMA, ent_coef=ENTC,
                             local_critic=True)
    # bit-exact is correct here: SAME program both times, and agent 0's
    # gradient slice has no data dependency on the scrambled inputs
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(
            np.asarray(x[0]), np.asarray(y[0])),
        g1["critic"], g2["critic"])
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(
            np.asarray(x[0]), np.asarray(y[0])),
        g1["actor"], g2["actor"])


def test_ddpg_runner_end_to_end():
    runner = build_fused_maddpg_runner("simple_spread", n_envs=8,
                                       batch=32, block=2,
                                       local_critic=True)
    params, info = runner(50, seed=0, actor_start=4)
    assert info["updates"] == 50
    assert params["critic"]["l1"]["w"].shape[1] == \
        scenarios.load("simple_spread").obs_width + 5
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(params))
