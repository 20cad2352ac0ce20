"""Fused policy-trajectory kernel + fused PPO/MAPPO learner tests
(CPU, Pallas interpret mode). The hardware leg is tools/tpu_smoke.py +
tools/train_bench.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mpe_tpu import scenarios
from mpe_tpu.learner import init_policy
from mpe_tpu.ops.fused_policy import fused_policy_trajectory


def _mesh(n=1):
    return Mesh(np.array(jax.devices()[:n]), ("env",))


def test_fused_policy_trajectory_interpret_spread():
    """Shapes/finiteness + the emitted transitions obey the step
    function: stepping the state reconstructed from obs[t] with the
    emitted action index reproduces obs[t+1] and rew[t]."""
    spec = scenarios.load("simple_spread").spec
    params = init_policy(jax.random.PRNGKey(0), 18, 5, hidden=32)
    run = fused_policy_trajectory(
        "simple_spread", params, n_envs=256, n_steps=16, horizon=100,
        block_envs=128, t_chunk=4, interpret=True)
    obs, act, rew, last_obs = run(3, params)
    obs, act = np.asarray(obs), np.asarray(act)
    assert obs.shape == (16, 3, 18, 256) and np.isfinite(obs).all()
    assert act.shape == (16, 3, 256) and act.dtype == np.int32
    assert ((act >= 0) & (act < 5)).all()
    assert np.asarray(rew).shape == (16, 1, 256)
    assert np.asarray(last_obs).shape == (3, 18, 256)

    from mpe_tpu.ops.fused_rollout import spread_step_block

    t = 5
    avel = jnp.asarray(obs[t, :, 0:2, :])
    apos = jnp.asarray(obs[t, :, 2:4, :])
    lpos = jnp.asarray(obs[t, 0, 4:10, :]).reshape(3, 2, 256) + apos[0]
    move = jax.nn.one_hot(jnp.asarray(act[t]), 5, dtype=jnp.float32,
                          axis=1)
    _, _, rew2, obs2 = spread_step_block(spec, apos, avel, lpos, move)
    np.testing.assert_allclose(np.asarray(obs2), obs[t + 1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(rew2)[0],
                               np.asarray(rew)[t, 0], atol=1e-3)
    # last_obs continues the trajectory: stepping obs[T-1] gives it
    avel = jnp.asarray(obs[15, :, 0:2, :])
    apos = jnp.asarray(obs[15, :, 2:4, :])
    lpos = jnp.asarray(obs[15, 0, 4:10, :]).reshape(3, 2, 256) + apos[0]
    move = jax.nn.one_hot(jnp.asarray(act[15]), 5, dtype=jnp.float32,
                          axis=1)
    _, _, _, obs2 = spread_step_block(spec, apos, avel, lpos, move)
    np.testing.assert_allclose(np.asarray(obs2), np.asarray(last_obs),
                               atol=1e-4)


def test_fused_policy_trajectory_samples_from_policy():
    """A policy whose output head is hard-biased toward one action must
    emit (almost) only that action — pins MLP -> Gumbel-max -> index
    emission end to end."""
    params = init_policy(jax.random.PRNGKey(0), 18, 5, hidden=32)
    params = jax.tree.map(jnp.zeros_like, params)
    params["out"]["b"] = jnp.asarray([-30.0, -30.0, 30.0, -30.0, -30.0])
    run = fused_policy_trajectory(
        "simple_spread", params, n_envs=64, n_steps=8, horizon=100,
        block_envs=64, t_chunk=4, interpret=True)
    _, act, _, _ = run(0, params)
    assert (np.asarray(act) == 2).all()


def test_fused_policy_trajectory_comm_scenario():
    """Comm scenario (speaker_listener): comm indices emitted, in range,
    and the silent listener's comm index is forced to 0."""
    kscn_name = "simple_speaker_listener"
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario

    kscn = kernel_scenario(kscn_name)
    assert kscn.uses_comm
    dim_c = kscn.spec.dim_c
    params = init_policy(jax.random.PRNGKey(1), kscn.obs_w, 5 + dim_c,
                         hidden=32)
    run = fused_policy_trajectory(
        kscn_name, params, n_envs=64, n_steps=8, horizon=100,
        block_envs=64, t_chunk=4, interpret=True)
    assert run.has_comm
    obs, act, cact, rew, last_obs = run(2, params)
    cact = np.asarray(cact)
    assert cact.shape == (8, 2, 64)
    assert ((cact >= 0) & (cact < dim_c)).all()
    silent = [bool(s) for s in kscn.spec.silent[:2]]
    for i, s in enumerate(silent):
        if s:
            assert (cact[:, i] == 0).all()
    # the speaker (non-silent) actually varies its utterance
    for i, s in enumerate(silent):
        if not s:
            assert (cact[:, i] != 0).any()


def test_fused_policy_trajectory_horizon_reset():
    """With horizon < n_steps all lanes reset in lockstep: the obs right
    after the boundary is a fresh state (zero velocities for agents)."""
    params = init_policy(jax.random.PRNGKey(0), 18, 5, hidden=32)
    run = fused_policy_trajectory(
        "simple_spread", params, n_envs=64, n_steps=12, horizon=4,
        block_envs=64, t_chunk=4, interpret=True)
    obs, _, _, _ = run(5, params)
    obs = np.asarray(obs)
    # obs[4] is the first obs after the t=4 reset: vel rows are zero
    assert np.abs(obs[4, :, 0:2, :]).max() == 0.0
    assert np.abs(obs[3, :, 0:2, :]).max() > 0.0


@pytest.mark.parametrize("builder_name",
                         ["build_fused_ppo_step", "build_fused_mappo_step"])
def test_fused_ppo_step_runs_and_learns_shape(builder_name):
    """One fused PPO/MAPPO iteration in interpret mode: metrics finite,
    params actually move, repeated calls keep working."""
    import mpe_tpu.learner as L

    builder = getattr(L, builder_name)
    step = builder("simple_spread", _mesh(1), n_envs=64, n_steps=8,
                   horizon=8, hidden=32, block_envs=32, t_chunk=4,
                   interpret=True)
    params = step.init_params(jax.random.PRNGKey(0))
    state = step.init_state(params)
    state2, metrics = step(state, 0)
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), k
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state[0], state2[0])
    assert max(jax.tree.leaves(moved)) > 0.0
    state3, metrics2 = step(state2, 1)
    assert np.isfinite(np.asarray(metrics2["loss"])).all()


def test_fused_ppo_step_comm_scenario_interpret():
    """Fused PPO on a comm scenario: factored move x comm objective
    runs and stays finite."""
    from mpe_tpu.learner import build_fused_ppo_step

    step = build_fused_ppo_step(
        "simple_speaker_listener", _mesh(1), n_envs=32, n_steps=8,
        horizon=8, hidden=32, block_envs=32, t_chunk=4, interpret=True)
    state = step.init_state(step.init_params(jax.random.PRNGKey(3)))
    _, metrics = step(state, 0)
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_fused_policy_trajectory_sharded_equals_single():
    """Per-lane stream equality of the policy-trajectory engine under
    sharding: running each device's local slice with its block offset
    (exactly what the fused learners do under shard_map) reproduces the
    single-device full run element-for-element."""
    params = init_policy(jax.random.PRNGKey(0), 18, 5, hidden=32)
    full = fused_policy_trajectory(
        "simple_spread", params, n_envs=64, n_steps=8, horizon=8,
        block_envs=8, t_chunk=4, interpret=True)
    local = fused_policy_trajectory(
        "simple_spread", params, n_envs=8, n_steps=8, horizon=8,
        block_envs=8, t_chunk=4, interpret=True)
    want = full(7, params)
    got = [local(7, params, d * local.n_blocks) for d in range(8)]
    for i, lbl in enumerate(("obs", "act", "rew", "last_obs")):
        cat = np.concatenate([np.asarray(g[i]) for g in got], axis=-1)
        np.testing.assert_array_equal(cat, np.asarray(want[i]),
                                      err_msg=lbl)


def test_fused_ppo_sharded_8dev():
    """Fused PPO over an 8-virtual-device mesh: runs, metrics finite and
    equal to the single-device run's (the rollout streams are identical
    by block-offset folding — asserted exactly above; params themselves
    are NOT compared because Adam normalizes gradient scale, amplifying
    sub-ulp pmean reduction-order differences to O(lr))."""
    from mpe_tpu.learner import build_fused_ppo_step

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    step8 = build_fused_ppo_step(
        "simple_spread", Mesh(np.array(devs[:8]), ("env",)), n_envs=64,
        n_steps=8, horizon=8, hidden=32, block_envs=8, t_chunk=4,
        interpret=True)
    step1 = build_fused_ppo_step(
        "simple_spread", _mesh(1), n_envs=64, n_steps=8, horizon=8,
        hidden=32, block_envs=8, t_chunk=4, interpret=True)
    params = step8.init_params(jax.random.PRNGKey(0))
    s8, m8 = step8(step8.init_state(params), 7)
    s1, m1 = step1(step1.init_state(params), 7)
    np.testing.assert_allclose(float(m8["mean_reward"]),
                               float(m1["mean_reward"]), rtol=1e-5)
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               atol=5e-3)
    assert all(np.isfinite(np.asarray(v)).all() for v in m8.values())
    assert all(np.isfinite(x).all() for x in
               map(np.asarray, jax.tree.leaves(s8[0])))


def test_fused_mappo_update_path_matches_xla_path():
    """build_fused_mappo_step(fused_update=True) matches the XLA
    value_and_grad path: identical rollouts, same loss, same first
    update (to f32 reduction-order noise)."""
    from mpe_tpu.learner import build_fused_mappo_step

    kw = dict(n_envs=64, n_steps=8, horizon=8, hidden=32, block_envs=32,
              t_chunk=4, interpret=True)
    step_k = build_fused_mappo_step("simple_spread", _mesh(1),
                                    fused_update=True, **kw)
    step_x = build_fused_mappo_step("simple_spread", _mesh(1),
                                    fused_update=False, **kw)
    params = step_k.init_params(jax.random.PRNGKey(0))
    sk, mk = step_k(step_k.init_state(params), 11)
    sx, mx = step_x(step_x.init_state(params), 11)
    for key in ("loss", "pg_loss", "v_loss", "entropy", "mean_reward"):
        np.testing.assert_allclose(float(mk[key]), float(mx[key]),
                                   rtol=2e-4, atol=1e-5, err_msg=key)
    for (pa, a), (pb, b) in zip(
            jax.tree.flatten_with_path(sk[0])[0],
            jax.tree.flatten_with_path(sx[0])[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, err_msg=str(pa))


def test_fused_update_path_matches_xla_path():
    """build_fused_ppo_step(fused_update=True) produces the same metrics
    and (to f32 reduction-order noise) the same first-iteration update
    as the XLA value_and_grad path — identical rollout streams, same
    loss; only the gradient implementation differs."""
    from mpe_tpu.learner import build_fused_ppo_step

    kw = dict(n_envs=64, n_steps=8, horizon=8, hidden=32, block_envs=32,
              t_chunk=4, interpret=True)
    step_k = build_fused_ppo_step("simple_spread", _mesh(1),
                                  fused_update=True, **kw)
    step_x = build_fused_ppo_step("simple_spread", _mesh(1),
                                  fused_update=False, **kw)
    params = step_k.init_params(jax.random.PRNGKey(0))
    sk, mk = step_k(step_k.init_state(params), 11)
    sx, mx = step_x(step_x.init_state(params), 11)
    for key in ("loss", "pg_loss", "v_loss", "entropy", "mean_reward"):
        np.testing.assert_allclose(float(mk[key]), float(mx[key]),
                                   rtol=2e-4, atol=1e-5, err_msg=key)
    # params move identically up to grad-noise x Adam normalization
    for (pa, a), (pb, b) in zip(
            jax.tree.flatten_with_path(sk[0])[0],
            jax.tree.flatten_with_path(sx[0])[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, err_msg=str(pa))
