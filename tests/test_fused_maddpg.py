"""ops/fused_maddpg + learner.build_fused_collect: the in-kernel MADDPG
replay collector's stored-transition semantics (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpe_tpu import scenarios
from mpe_tpu.envs.functional import MpeEnv
from mpe_tpu.learner.maddpg import (
    Buffer, build_fused_collect, build_maddpg, init_buffer, init_maddpg)
from mpe_tpu.ops.fused_maddpg import fused_maddpg_trajectory
from mpe_tpu.ops.kernel_scenarios import kernel_scenario

HOR, T, N = 6, 12, 32


def _traj(name="simple_spread", eps=0.1, seed=5):
    kscn = kernel_scenario(name)
    mw = 2 * kscn.spec.dim_p + 1
    params = init_maddpg(jax.random.PRNGKey(0), kscn.obs_w, mw,
                         kscn.spec.n_agents, hidden=16)
    run = fused_maddpg_trajectory(
        kscn, params["actor"], n_envs=N, n_steps=T, horizon=HOR,
        eps_greedy=eps, block_envs=16, t_chunk=4, interpret=True)
    return kscn, jax.tree.map(np.asarray,
                              run(seed, jax.tree.map(
                                  lambda x: x.astype(jnp.float32),
                                  params["actor"])))


def test_fused_maddpg_stored_transitions():
    """obs2[t] is the TRUE pre-reset next obs: equal to obs[t+1] off the
    horizon boundary, and obs[t+1] is a fresh reset at the boundary
    (every lane resets in lockstep since all start at t=0). Actions are
    exact one-hots; everything finite."""
    kscn, (obs, act, rew, obs2) = _traj()
    a, mw = kscn.spec.n_agents, 2 * kscn.spec.dim_p + 1
    assert obs.shape == (T, a, kscn.obs_w, N)
    assert act.shape == (T, a, mw, N)
    assert obs2.shape == (T, a, kscn.obs_w, N)
    for x in (obs, act, rew, obs2):
        assert np.isfinite(x).all()

    # exact one-hot actions
    np.testing.assert_array_equal(act.sum(axis=2), np.ones((T, a, N)))
    assert set(np.unique(act)) <= {0.0, 1.0}

    for t in range(T - 1):
        if (t + 1) % HOR != 0:
            np.testing.assert_array_equal(obs2[t], obs[t + 1])
        else:
            # boundary: next obs is a fresh reset, stored s' is not
            assert not np.allclose(obs2[t], obs[t + 1])


def test_fused_maddpg_epsilon_mixes_actions():
    """eps=1.0 forces uniform actions: per-index frequencies are ~1/mw
    and cannot match the greedy actor's concentration."""
    kscn, (_, act, _, _) = _traj(eps=1.0, seed=9)
    mw = act.shape[2]
    freq = act.mean(axis=(0, 1, 3))              # [mw]
    assert np.all(np.abs(freq - 1.0 / mw) < 0.08), freq


def test_build_fused_collect_fills_ring_and_trains():
    """collect_chunk inserts T*N rows, wraps the ring cleanly, and the
    stored chunk feeds build_maddpg's update_fn (finite losses)."""
    env = MpeEnv(scenarios.load("simple_spread"), max_steps=HOR,
                 auto_reset=True)
    a, ow = env.n_agents, env.scenario.obs_width
    mw = 2 * env.spec.dim_p + 1
    params = init_maddpg(jax.random.PRNGKey(0), ow, mw, a, hidden=16)

    collect = build_fused_collect(env, n_envs=N, n_steps=T,
                                  block_envs=16, t_chunk=4,
                                  interpret=True)
    cap = 2 * collect.rows_per_chunk
    buffer = init_buffer(cap, a, ow, mw)
    buffer, mr = collect(params["actor"], buffer, 0)
    assert int(buffer.ptr) == collect.rows_per_chunk
    assert int(buffer.size) == collect.rows_per_chunk
    assert np.isfinite(float(mr))
    first = np.asarray(buffer.obs[: collect.rows_per_chunk])
    assert np.abs(first).sum() > 0

    buffer, _ = collect(params["actor"], buffer, 1)
    buffer, _ = collect(params["actor"], buffer, 2)   # wraps to ptr 0
    assert int(buffer.ptr) == collect.rows_per_chunk
    assert int(buffer.size) == cap

    _, _, update_fn, init_opt = build_maddpg(
        env, n_envs=N, capacity=cap, batch=64)
    targets = jax.tree.map(lambda x: x, params)
    params2, targets, opt_states, m = update_fn(
        params, targets, init_opt(params), buffer,
        jax.random.PRNGKey(3), True)
    assert all(np.isfinite(float(v)) for v in m.values()), m
    # the actor actually moved
    moved = any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(params["actor"]),
                        jax.tree.leaves(params2["actor"])))
    assert moved
