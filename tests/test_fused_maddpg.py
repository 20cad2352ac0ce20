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
    aw = (2 * kscn.spec.dim_p + 1
          + (kscn.spec.dim_c if kscn.uses_comm else 0))
    params = init_maddpg(jax.random.PRNGKey(0), kscn.obs_w, aw,
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


def test_fused_maddpg_comm_goal_scenario():
    """speaker_listener (speaking speaker + goal stream): rows are a
    move one-hot next to a comm one-hot, obs2 chains off-boundary, and
    the goal stream varies across lanes (reaches the obs encoding)."""
    kscn, (obs, act, rew, obs2) = _traj("simple_speaker_listener")
    a = kscn.spec.n_agents
    mw, cw = 2 * kscn.spec.dim_p + 1, kscn.spec.dim_c
    assert act.shape == (T, a, mw + cw, N)
    for part in (act[:, :, :mw], act[:, :, mw:]):
        np.testing.assert_array_equal(part.sum(axis=2), np.ones((T, a, N)))
    assert set(np.unique(act)) <= {0.0, 1.0}
    for t in range(T - 1):
        if (t + 1) % HOR != 0:
            np.testing.assert_array_equal(obs2[t], obs[t + 1])
    # the listener's goal landmark color differs across lanes at t=0
    # (goal stream sampled per lane, embedded in the observation)
    assert np.ptp(obs[0, 1]) > 0 and np.isfinite(obs).all()


def test_build_fused_collect_comm_trains():
    """End-to-end on speaker_listener: the fused chunk feeds the
    two-head update_fn and both actor heads move."""
    from mpe_tpu.learner.maddpg import maddpg_act_dim

    env = MpeEnv(scenarios.load("simple_speaker_listener"),
                 max_steps=HOR, auto_reset=True)
    a, ow = env.n_agents, env.scenario.obs_width
    aw = maddpg_act_dim(env)
    params = init_maddpg(jax.random.PRNGKey(0), ow, aw, a, hidden=16)
    collect = build_fused_collect(env, n_envs=N, n_steps=T,
                                  block_envs=16, t_chunk=4,
                                  interpret=True)
    buffer = init_buffer(collect.rows_per_chunk, a, ow, aw)
    buffer, mr = collect(params["actor"], buffer, 0)
    assert np.isfinite(float(mr))

    _, _, update_fn, init_opt = build_maddpg(
        env, n_envs=N, capacity=collect.rows_per_chunk, batch=64)
    targets = jax.tree.map(lambda x: x, params)
    params2, *_ = update_fn(params, targets, init_opt(params), buffer,
                            jax.random.PRNGKey(3), True)
    w0 = np.asarray(params["actor"]["out"]["w"])
    w1 = np.asarray(params2["actor"]["out"]["w"])
    mw = 2 * env.spec.dim_p + 1
    assert np.abs(w1[..., :mw] - w0[..., :mw]).max() > 0     # move head
    assert np.abs(w1[..., mw:] - w0[..., mw:]).max() > 0     # comm head


def test_fused_collect_wraps_misaligned_ptr():
    """Interleaving the per-step XLA collector (which advances ptr by
    n_envs) with collect_chunk leaves ptr misaligned; the chunk insert
    must WRAP modularly across the capacity edge, not clamp (the old
    dynamic_update_slice silently clobbered newer rows and desynced
    ptr)."""
    env = MpeEnv(scenarios.load("simple_spread"), max_steps=HOR,
                 auto_reset=True)
    a, ow = env.n_agents, env.scenario.obs_width
    params = init_maddpg(jax.random.PRNGKey(0), ow, 5, a, hidden=16)
    collect = build_fused_collect(env, n_envs=N, n_steps=T,
                                  block_envs=16, t_chunk=4,
                                  interpret=True)
    rpc = collect.rows_per_chunk
    cap = 2 * rpc
    buffer = init_buffer(cap, a, ow, 5)
    off = 37                                   # misaligned start
    buffer = buffer._replace(ptr=jnp.asarray(off, jnp.int32))
    b1, _ = collect(params["actor"], buffer, 0)
    assert int(b1.ptr) == (off + rpc) % cap
    # rows [off, off+rpc) written, wrap region untouched this insert
    head = np.asarray(b1.obs[off : off + rpc])
    assert np.abs(head).sum() > 0
    untouched = np.asarray(b1.obs[(off + rpc) % cap : off])
    np.testing.assert_array_equal(untouched, 0.0)
    # second insert crosses the capacity edge and wraps to the front
    b2, _ = collect(params["actor"], b1, 1)
    assert int(b2.ptr) == (off + 2 * rpc) % cap
    tail = np.asarray(b2.obs[:off])            # wrapped portion
    assert np.abs(tail).sum() > 0


def test_peragent_rng_streams_independent():
    """Regression: the per-agent RNG call-id layout must stay inside the
    64-id-per-step salt window of make_uniform. The old 16-per-agent
    stride overflowed on a>=4 scenarios, making agent 4's interpret-mode
    draws at step s bit-identical to agent 0's at step s+1 (and goal
    resamples identical to eps coins). With independent streams, no two
    (step, agent) action blocks can coincide."""
    kscn, (_, act, _, _) = _traj("simple_world_comm", seed=11)
    a = kscn.spec.n_agents
    blocks = {}
    for t in range(T):
        for i in range(a):
            key = act[t, i].tobytes()
            assert key not in blocks, (t, i, blocks[key])
            blocks[key] = (t, i)


def test_sharded_fused_maddpg_equals_single():
    """8-virtual-device sharded collection reproduces the single-device
    kernel per lane (PRNG folds the global block index, so the streams
    are placement-invariant) — the same contract as
    sharded_fused_rollout."""
    from jax.sharding import Mesh
    from mpe_tpu.ops.fused_maddpg import sharded_fused_maddpg_trajectory

    kscn = kernel_scenario("simple_spread")
    params = init_maddpg(jax.random.PRNGKey(0), kscn.obs_w, 5,
                         kscn.spec.n_agents, hidden=16)
    actor = jax.tree.map(lambda x: x.astype(jnp.float32), params["actor"])
    n_envs, bs = 128, 16
    single = fused_maddpg_trajectory(
        kscn, actor, n_envs=n_envs, n_steps=8, horizon=HOR,
        block_envs=bs, t_chunk=4, interpret=True)(3, actor)
    mesh = Mesh(np.array(jax.devices()[:8]), ("env",))
    sharded = sharded_fused_maddpg_trajectory(
        kscn, actor, n_envs=n_envs, n_steps=8, mesh=mesh, horizon=HOR,
        block_envs=bs, t_chunk=4, interpret=True)(3, actor)
    obs_s, act_s, rew_s, obs2_s = single
    obs_d, act_d, rew_d, obs2_d = sharded
    # streams and state are placement-invariant BITWISE
    for s, d in ((obs_s, obs_d), (act_s, act_d), (obs2_s, obs2_d)):
        np.testing.assert_array_equal(np.asarray(s), np.asarray(d))
    # the reward's cross-entity sum may be reassociated differently by
    # XLA between the two program shapes — last-ulp only
    np.testing.assert_allclose(np.asarray(rew_s), np.asarray(rew_d),
                               rtol=0, atol=1e-5)


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


def test_collectors_critics_descend_comparably():
    """A/B de-risk of the exploration-stream divergence (hash/hardware
    Gumbel eps-mix vs jax.random in learner.collect_fn): fill one replay
    ring with the XLA per-step collector and one with the fused chunk
    collector, run the same update schedule on each, and require the
    critic TD loss to DESCEND in both and land within a factor of each
    other. (The full-scale proof is the committed on-chip run:
    examples/maddpg_run.py -> greedy -6.29 on spread, parity with the
    r2 XLA-collect -6.1.)"""
    env = MpeEnv(scenarios.load("simple_spread"), max_steps=HOR,
                 auto_reset=True)
    a, ow = env.n_agents, env.scenario.obs_width
    mw = 2 * env.spec.dim_p + 1
    n_envs, updates = 16, 200
    cap = n_envs * HOR * 4
    params = init_maddpg(jax.random.PRNGKey(0), ow, mw, a, hidden=16)
    targets = jax.tree.map(lambda x: x, params)
    reset_fn, collect_fn, update_fn, init_opt = build_maddpg(
        env, n_envs=n_envs, capacity=cap, batch=128, tau_polyak=0.01)
    fused = build_fused_collect(env, n_envs=n_envs, n_steps=HOR,
                                block_envs=16, t_chunk=3, interpret=True)

    def fill_xla():
        buf = init_buffer(cap, a, ow, mw)
        states, obs = reset_fn(jax.random.PRNGKey(1))
        for i in range(cap // n_envs):
            states, obs, buf, _ = collect_fn(
                params, states, obs, buf,
                jax.random.fold_in(jax.random.PRNGKey(2), i))
        return buf

    def fill_fused():
        buf = init_buffer(cap, a, ow, mw)
        for i in range(cap // (n_envs * HOR)):
            buf, _ = fused(params["actor"], buf, i)
        return buf

    def closs_curve(buf):
        p, t, o = params, targets, init_opt(params)
        losses = []
        for k in range(updates):
            p, t, o, m = update_fn(p, t, o, buf,
                                   jax.random.fold_in(
                                       jax.random.PRNGKey(9), k), False)
            losses.append(float(m["critic_loss"]))
        return losses

    lx = closs_curve(fill_xla())
    lf = closs_curve(fill_fused())
    # both descend decisively (TD loss tracks a slowly-moving polyak
    # target, so compare the last-50 floor against the start)...
    fx, ff = min(lx[-50:]), min(lf[-50:])
    assert fx < 0.5 * max(lx[:3]), (lx[:3], lx[-3:])
    assert ff < 0.5 * max(lf[:3]), (lf[:3], lf[-3:])
    # ...and comparably (same data distribution up to the exploration
    # stream): last-50 floors within a factor of 3
    hi, lo = max(fx, ff), min(fx, ff)
    assert hi <= 3.0 * lo + 1e-3, (fx, ff)


def test_fused_maddpg_rows_mode_matches_tensor_outputs():
    """emit_rows=True must produce EXACTLY the Buffer row layout the
    XLA-side rowize built from the 4-tensor outputs: row (t, n) =
    [obs | act | rew per agent | obs2] flattened agent-major — same
    draws, same values, one tensor."""
    from mpe_tpu.learner.fused_ppo import _agent_rewards
    from mpe_tpu.ops.fused_maddpg import fused_maddpg_trajectory

    kscn, (obs, act, rew, obs2) = _traj(seed=5)
    aw = 2 * kscn.spec.dim_p + 1      # spread: silent, move head only
    params = init_maddpg(jax.random.PRNGKey(0), kscn.obs_w, aw,
                         kscn.spec.n_agents, hidden=16)   # _traj's net
    run_rows = fused_maddpg_trajectory(
        kscn, params["actor"], n_envs=N, n_steps=T, horizon=HOR,
        eps_greedy=0.1, block_envs=16, t_chunk=4, interpret=True,
        emit_rows=True)
    rows = np.asarray(run_rows(5, jax.tree.map(
        lambda x: x.astype(jnp.float32), params["actor"])))
    a = kscn.spec.n_agents
    assert rows.shape == (T, N, a * (2 * kscn.obs_w + aw + 1))

    rew_a = np.asarray(_agent_rewards(kscn, jnp.asarray(rew)))
    want = np.concatenate([
        np.moveaxis(obs, -1, 1).reshape(T, N, -1),
        np.moveaxis(act, -1, 1).reshape(T, N, -1),
        np.moveaxis(rew_a, -1, 1).reshape(T, N, -1),
        np.moveaxis(obs2, -1, 1).reshape(T, N, -1)], axis=-1)
    np.testing.assert_array_equal(rows, want)
