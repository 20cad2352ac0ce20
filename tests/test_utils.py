"""Checkpoint/resume, registry, and profiling-hook tests (SURVEY.md §5)."""

import numpy as np
import jax
import jax.numpy as jnp

from mpe_tpu import registry, scenarios
from mpe_tpu.envs.functional import MpeEnv
from mpe_tpu.utils import load_checkpoint, save_checkpoint, trace


def test_checkpoint_roundtrip_resumes_bit_identically(tmp_path):
    env = MpeEnv(scenarios.load("simple_tag"), dtype=jnp.float64)
    key = jax.random.PRNGKey(5)
    state, _ = env.reset(key)
    acts = jnp.zeros((env.n_agents, env.action_width), jnp.float64)
    for i in range(3):
        state, *_ = env.step(state, acts, jax.random.fold_in(key, i))

    path = str(tmp_path / "snap.npz")
    save_checkpoint(path, state, key=key, step=3, extra={"scenario": "simple_tag"})
    payload, step, extra = load_checkpoint(
        path, {"state": state, "key": key})
    assert step == 3 and extra["scenario"] == "simple_tag"
    restored = payload["state"]
    np.testing.assert_array_equal(np.asarray(state.pos),
                                  np.asarray(restored.pos))

    # continue both and compare — resume is exact
    s1, s2 = state, jax.tree.map(jnp.asarray, restored)
    for i in range(3, 6):
        k = jax.random.fold_in(key, i)
        s1, *_ = env.step(s1, acts, k)
        s2, *_ = env.step(s2, acts, k)
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))


def test_registry_reference_ids_work():
    # the reference registers these ids but they are broken there
    # (multiagent/__init__.py:9-21); here they construct real envs
    env = registry.make("MultiagentSimple-v0")
    obs_n = env.reset()
    assert len(obs_n) == 1 and obs_n[0].shape == (4,)
    env2 = registry.make("MultiagentSimpleSpeakerListener-v0", seed=3)
    assert env2.n == 2
    assert len(registry.ids()) == 11


def test_registry_horizon_applied():
    env = registry.make("simple-v0")
    env.reset()
    done = [False]
    for _ in range(100):
        _, _, done, _ = env.step([np.array([1, 0, 0, 0, 0.0])])
    assert done == [True]  # max_episode_steps=100 horizon


def test_registry_unknown_id():
    try:
        registry.make("nope-v0")
        assert False
    except KeyError as e:
        assert "registered" in str(e)


def test_profiler_trace_smoke(tmp_path):
    env = MpeEnv(scenarios.load("simple"))
    with trace(str(tmp_path / "tr")):
        state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
        jax.block_until_ready(obs)
    assert any((tmp_path / "tr").rglob("*"))


def test_maddpg_kill_and_resume_bit_identical(tmp_path):
    """Mid-training snapshot of the FULL MADDPG train state — per-agent
    params, polyak targets, both optimizer states, the on-device replay
    ring, env states and obs — then resume from disk and verify the
    continuation produces bit-identical losses and parameters."""
    import jax.numpy as jnp
    from mpe_tpu.learner import build_maddpg, init_buffer, init_maddpg
    from mpe_tpu.utils.checkpoint import load_train_state, save_train_state

    scn = scenarios.load("simple")
    env = MpeEnv(scn, max_steps=5, auto_reset=True)
    mw = 2 * env.spec.dim_p + 1
    params = init_maddpg(jax.random.PRNGKey(0), scn.obs_width, mw,
                         env.n_agents, hidden=16)
    targets = jax.tree.map(lambda x: x, params)
    reset_fn, collect_fn, update_fn, init_opt = build_maddpg(
        env, n_envs=4, capacity=64, batch=8)
    opt_states = init_opt(params)
    buffer = init_buffer(64, env.n_agents, scn.obs_width, mw)
    key = jax.random.PRNGKey(7)
    states, obs = reset_fn(key)

    def iterate(params, targets, opt_states, buffer, states, obs, it):
        states, obs, buffer, _ = collect_fn(
            params, states, obs, buffer, jax.random.fold_in(key, it))
        params, targets, opt_states, m = update_fn(
            params, targets, opt_states, buffer,
            jax.random.fold_in(key, 1000 + it))
        return params, targets, opt_states, buffer, states, obs, m

    # run 4 iters, snapshot, run 3 more recording metrics
    for it in range(4):
        params, targets, opt_states, buffer, states, obs, _ = iterate(
            params, targets, opt_states, buffer, states, obs, it)
    train_state = {"params": params, "targets": targets,
                   "opt_states": opt_states, "buffer": buffer,
                   "env_states": states, "obs": obs}
    path = str(tmp_path / "maddpg_state.npz")
    save_train_state(path, train_state, step=4)

    metrics_a = []
    for it in range(4, 7):
        params, targets, opt_states, buffer, states, obs, m = iterate(
            params, targets, opt_states, buffer, states, obs, it)
        metrics_a.append({k: float(v) for k, v in m.items()})

    # resume from disk into a template built from scratch
    params_t = init_maddpg(jax.random.PRNGKey(99), scn.obs_width, mw,
                           env.n_agents, hidden=16)
    template = {"params": params_t,
                "targets": jax.tree.map(lambda x: x, params_t),
                "opt_states": init_opt(params_t),
                "buffer": init_buffer(64, env.n_agents, scn.obs_width, mw),
                "env_states": states, "obs": obs}
    restored, step, _ = load_train_state(path, template)
    assert step == 4
    p2, t2, o2, b2 = (restored["params"], restored["targets"],
                      restored["opt_states"], restored["buffer"])
    s2, ob2 = restored["env_states"], restored["obs"]
    metrics_b = []
    for it in range(4, 7):
        p2, t2, o2, b2, s2, ob2, m = iterate(p2, t2, o2, b2, s2, ob2, it)
        metrics_b.append({k: float(v) for k, v in m.items()})

    assert metrics_a == metrics_b  # bit-identical continuation
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, p2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), buffer, b2)


def test_ppo_train_state_resume(tmp_path):
    """PPO (params, opt_state) snapshot/restore continues identically."""
    from mpe_tpu.learner import build_ppo_step, init_ac
    from mpe_tpu.parallel import env_mesh
    from mpe_tpu.utils.checkpoint import load_train_state, save_train_state

    scn = scenarios.load("simple")
    env = MpeEnv(scn)
    mesh = env_mesh()
    step = build_ppo_step(env, mesh, n_envs=8, n_steps=4, ppo_epochs=1)
    params = init_ac(jax.random.PRNGKey(0), scn.obs_width, 5, hidden=16)
    state = step.init_state(params)
    key = jax.random.PRNGKey(3)
    state, _ = step(state, jax.random.fold_in(key, 0))
    path = str(tmp_path / "ppo_state.npz")
    save_train_state(path, state, step=1)
    state_a, ma = step(state, jax.random.fold_in(key, 1))

    template = step.init_state(
        init_ac(jax.random.PRNGKey(42), scn.obs_width, 5, hidden=16))
    restored, n_iter, _ = load_train_state(path, template)
    assert n_iter == 1
    state_b, mb = step(restored, jax.random.fold_in(key, 1))
    assert float(ma["loss"]) == float(mb["loss"])
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), state_a[0], state_b[0])


def test_fused_maddpg_train_state_resume(tmp_path):
    """The FULLY-fused loop's train state (params, targets, opts, the
    fused 2-D replay ring) snapshots and resumes bit-identically: the
    collect kernel is deterministic given its integer seed and the
    chunk update given its key, so the continuation after restore must
    reproduce the uninterrupted run exactly."""
    import jax.numpy as jnp

    from mpe_tpu.learner import (build_fused_collect,
                                 build_fused_update_chunk, build_maddpg,
                                 init_buffer, init_maddpg)
    from mpe_tpu.utils.checkpoint import load_train_state, save_train_state

    scn = scenarios.load("simple_spread")
    env = MpeEnv(scn, max_steps=4, auto_reset=True)
    mw = 2 * env.spec.dim_p + 1
    params = init_maddpg(jax.random.PRNGKey(0), scn.obs_width, mw,
                         env.n_agents, hidden=16)
    targets = jax.tree.map(lambda x: x, params)
    _, _, _, init_opt = build_maddpg(env, n_envs=8, capacity=128, batch=16)
    opt_states = init_opt(params)
    buffer = init_buffer(128, env.n_agents, scn.obs_width, mw)
    collect = build_fused_collect(env, n_envs=8, n_steps=4, block_envs=8,
                                  t_chunk=2, interpret=True)
    chunk = build_fused_update_chunk(env, 3, batch=16, hidden=16,
                                     block_b=16, interpret=True)
    key = jax.random.PRNGKey(5)
    gates = jnp.ones((3,), bool)

    def iterate(p, t, o, b, it):
        b, _ = collect(p["actor"], b, it)
        return (*chunk(p, t, o, b, jax.random.fold_in(key, it), gates),
                b)

    for it in range(3):
        params, targets, opt_states, m, buffer = iterate(
            params, targets, opt_states, buffer, it)
    state = {"params": params, "targets": targets,
             "opt_states": opt_states, "buffer": buffer}
    path = str(tmp_path / "fused_state.npz")
    save_train_state(path, state, step=3)

    ms_a, p_a = [], params
    t_a, o_a, b_a = targets, opt_states, buffer
    for it in range(3, 6):
        p_a, t_a, o_a, m, b_a = iterate(p_a, t_a, o_a, b_a, it)
        ms_a.append({k: float(v) for k, v in m.items()})

    params_t = init_maddpg(jax.random.PRNGKey(9), scn.obs_width, mw,
                           env.n_agents, hidden=16)
    template = {"params": params_t,
                "targets": jax.tree.map(lambda x: x, params_t),
                "opt_states": init_opt(params_t),
                "buffer": init_buffer(128, env.n_agents, scn.obs_width,
                                      mw)}
    restored, step, _ = load_train_state(path, template)
    assert step == 3
    p_b, t_b = restored["params"], restored["targets"]
    o_b, b_b = restored["opt_states"], restored["buffer"]
    ms_b = []
    for it in range(3, 6):
        p_b, t_b, o_b, m, b_b = iterate(p_b, t_b, o_b, b_b, it)
        ms_b.append({k: float(v) for k, v in m.items()})

    assert ms_a == ms_b
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p_a, p_b)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), b_a, b_b)
