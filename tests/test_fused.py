"""Fused-rollout kernel tests (mpe_tpu/ops).

The Pallas kernel itself needs a real TPU; these tests verify the parts
that run anywhere: the env-minor step math (both the generic batched form
and the scalar-specialized kernel form) against the vmapped reference
path, and the kernel end-to-end in Pallas interpreter mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpe_tpu import scenarios
from mpe_tpu.envs.functional import MpeEnv
from mpe_tpu.ops.batched import batched_spread_step
from mpe_tpu.ops.fused_rollout import fused_spread_rollout, spread_step_block

N = 16


def _vmapped_reference(states, moves):
    scn = scenarios.load("simple_spread")
    env = MpeEnv(scn, dtype=jnp.float64)
    acts = jnp.concatenate(
        [moves, jnp.zeros((3, 2, N), jnp.float64)], axis=1)
    keys = jax.random.split(jax.random.PRNGKey(9), N)
    v_step = jax.vmap(env.step, in_axes=(-1, -1, 0), out_axes=-1)
    return v_step(states, acts, keys)


@pytest.fixture()
def block():
    scn = scenarios.load("simple_spread")
    env = MpeEnv(scn, dtype=jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    states, _ = jax.vmap(env.reset, out_axes=-1)(keys)
    moves = jax.random.uniform(jax.random.PRNGKey(1), (3, 5, N), jnp.float64)
    return scn.spec, states, moves


def test_batched_step_matches_vmapped_path(block):
    spec, states, moves = block
    s2, o2, r2, _, _ = _vmapped_reference(states, moves)
    pos, vel, rew, obs = batched_spread_step(
        spec, states.pos, states.vel, moves)
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(pos), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s2.vel), np.asarray(vel), atol=1e-12)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(rew), atol=1e-12)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(obs), atol=1e-12)


def test_kernel_step_math_matches_vmapped_path(block):
    spec, states, moves = block
    a = spec.n_agents
    s2, o2, r2, _, _ = _vmapped_reference(states, moves)
    apos, avel, rew, obs = spread_step_block(
        spec, states.pos[:a], states.vel[:a], states.pos[a:], moves)
    np.testing.assert_allclose(np.asarray(s2.pos[:a]), np.asarray(apos),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(s2.vel[:a]), np.asarray(avel),
                               atol=1e-12)
    # kernel returns the shared reward once; reference broadcasts it
    np.testing.assert_allclose(np.asarray(r2), np.asarray(
        jnp.broadcast_to(rew, (a, N))), atol=1e-12)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(obs), atol=1e-12)


def test_fused_rollout_interpret_mode():
    spec = scenarios.load("simple_spread").spec
    run = fused_spread_rollout(spec, n_envs=256, n_steps=12, horizon=5,
                               block_envs=128, interpret=True)
    pos, vel, rew, obs_sum = run(3)
    pos, rew = np.asarray(pos), np.asarray(rew)
    assert pos.shape == (6, 2, 256) and np.isfinite(pos).all()
    assert np.isfinite(np.asarray(vel)).all()
    # rewards accumulate something negative (dist penalties) every step
    assert (rew < 0).all()
    # two blocks were seeded differently -> lanes differ across blocks
    assert (pos[..., :128] != pos[..., 128:]).any()


def test_fused_trajectory_interpret_mode():
    from mpe_tpu.ops.fused_trajectory import fused_spread_trajectory

    spec = scenarios.load("simple_spread").spec
    run = fused_spread_trajectory(spec, n_envs=256, n_steps=16, horizon=100,
                                  block_envs=128, t_chunk=4, interpret=True)
    obs, act, rew, pos, vel = run(7)
    obs, act = np.asarray(obs), np.asarray(act)
    assert obs.shape == (16, 3, 18, 256) and np.isfinite(obs).all()
    assert act.shape == (16, 3, 5, 256)
    assert np.asarray(rew).shape == (16, 1, 256)

    # emitted transitions obey the step function: reconstruct state at
    # step t from obs (vel rows 0:2, pos rows 2:4, landmark rel rows
    # 4:10) and verify stepping it with the emitted action reproduces
    # obs at t+1 (horizon=100 > 16, so no reset interferes)
    t = 5
    avel = jnp.asarray(obs[t, :, 0:2, :])
    apos = jnp.asarray(obs[t, :, 2:4, :])
    lpos = jnp.asarray(obs[t, 0, 4:10, :]).reshape(3, 2, 256) + apos[0]
    from mpe_tpu.ops.fused_rollout import spread_step_block

    apos2, avel2, rew2, obs2 = spread_step_block(
        spec, apos, avel, lpos, jnp.asarray(act[t + 1]))
    np.testing.assert_allclose(np.asarray(obs2), obs[t + 1], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(rew2)[0], np.asarray(rew)[t + 1, 0], atol=1e-3)


def test_fused_policy_rollout_interpret_mode():
    from mpe_tpu.learner import init_policy
    from mpe_tpu.ops.fused_policy import fused_policy_rollout

    spec = scenarios.load("simple_spread").spec
    params = init_policy(jax.random.PRNGKey(0), 18, 5, hidden=32)
    run = fused_policy_rollout(spec, params, n_envs=256, n_steps=24,
                               horizon=8, block_envs=128, interpret=True)
    ret, pos, eps = run(0, params)
    ret, eps = np.asarray(ret), np.asarray(eps)
    assert np.isfinite(ret).all()
    # horizon bookkeeping: exactly 24/8 = 3 completed episodes per lane
    np.testing.assert_array_equal(eps, np.full((1, 256), 3.0, np.float32))
    # policy params actually matter: different weights -> different returns
    params2 = init_policy(jax.random.PRNGKey(42), 18, 5, hidden=32)
    ret2 = np.asarray(run(0, params2)[0])
    assert (ret != ret2).any()


def test_generic_kernel_physics_and_tag_blocks_match_vmapped():
    """generic_physics_block + KernelTag vs the vmapped scenario path
    (heterogeneous accel/max_speed, collide obstacle landmarks, bound
    penalty, per-agent rewards)."""
    from mpe_tpu.ops.kernel_scenarios import (
        generic_physics_block, kernel_scenario)

    scn = scenarios.load("simple_tag")
    env = MpeEnv(scn, dtype=jnp.float64)
    n = 16
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    states, _ = jax.vmap(env.reset, out_axes=-1)(keys)
    moves = jax.random.uniform(jax.random.PRNGKey(1), (4, 5, n), jnp.float64)
    acts = jnp.concatenate([moves, jnp.zeros((4, 2, n), jnp.float64)], axis=1)
    s2, o2, r2, _, _ = jax.vmap(
        env.step, in_axes=(-1, -1, 0), out_axes=-1)(states, acts, keys)

    pos, vel = generic_physics_block(scn.spec, states.pos, states.vel, moves)
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(pos), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s2.vel), np.asarray(vel), atol=1e-12)
    rew, obs = kernel_scenario(scn).reward_obs(pos, vel)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(rew), atol=1e-12)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(obs), atol=1e-12)


def test_generic_fused_rollout_interpret_all_kernel_scenarios():
    from mpe_tpu.ops.fused_rollout import fused_rollout

    for name in ("simple", "simple_tag", "simple_spread"):
        run = fused_rollout(name, n_envs=256, n_steps=10, horizon=4,
                            block_envs=128, interpret=True)
        pos, vel, rew, ocs = run(1)
        assert np.isfinite(np.asarray(pos)).all(), name
        assert np.isfinite(np.asarray(rew)).all(), name


def test_generic_fused_rollout_unknown_scenario():
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario

    class Fake:
        class spec:
            name = "not_a_scenario"

    try:
        kernel_scenario(Fake())
        assert False
    except KeyError as e:
        assert "vmapped XLA path" in str(e)


def test_generic_fused_rollout_interpret_world_comm():
    from mpe_tpu.ops.fused_rollout import fused_rollout

    run = fused_rollout("simple_world_comm", n_envs=256, n_steps=8,
                        horizon=4, block_envs=128, interpret=True)
    pos, vel, rew, ocs = run(2)
    assert np.isfinite(np.asarray(pos)).all()
    assert np.asarray(rew).shape == (6, 256)
    assert np.isfinite(np.asarray(rew)).all()


@pytest.mark.parametrize("name", [
    "simple", "simple_adversary", "simple_push", "simple_reference",
    "simple_speaker_listener", "simple_crypto", "simple_world_comm"])
def test_kernel_reward_obs_blocks_match_vmapped(name):
    """Every kernel scenario's reward_obs block reproduces the vmapped
    scenario (itself reference-parity-tested) on identical states,
    including goal- and comm-dependent content."""
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario

    scn = scenarios.load(name)
    spec = scn.spec
    env = MpeEnv(scn, dtype=jnp.float64)
    n, a = 16, spec.n_agents
    keys = jax.random.split(jax.random.PRNGKey(3), n)
    states, _ = jax.vmap(env.reset, out_axes=-1)(keys)
    # one step with random full-width actions so comm state is non-zero
    acts = jax.random.uniform(
        jax.random.PRNGKey(4), (a, env.action_width, n), jnp.float64)
    s2, o2, r2, _, _ = jax.vmap(
        env.step, in_axes=(-1, -1, 0), out_axes=-1)(states, acts, keys)

    k = kernel_scenario(scn)
    comm = s2.comm if k.uses_comm else None
    goal = s2.goal if len(k.goal_choices) else None
    rew, obs = k.reward_obs(s2.pos, s2.vel, comm, goal)
    if k.reward_rows == 1 and a > 1:
        # kernel returns the shared post-broadcast reward once
        rew = jnp.broadcast_to(rew, (a, n))
    np.testing.assert_allclose(np.asarray(r2), np.asarray(rew), atol=1e-10,
                               err_msg=name)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(obs), atol=1e-10,
                               err_msg=name)


def test_sharded_fused_rollout_8dev_mesh():
    """The fused Pallas engine sharded over the env mesh: per-device
    kernels under shard_map, seed folded by mesh position, outputs
    sharded env-minor."""
    from mpe_tpu.ops.fused_rollout import sharded_fused_rollout

    run = sharded_fused_rollout("simple_spread", n_envs=1024, n_steps=6,
                                horizon=4, block_envs=128, interpret=True)
    pos, vel, rew, ocs = run(0)
    assert pos.shape == (6, 2, 1024)
    assert pos.sharding.spec[-1] == "env"
    p = np.asarray(pos)
    assert np.isfinite(p).all()
    # per-device seed folding: shards are decorrelated
    assert (p[..., :128] != p[..., 128:256]).any()


def test_sharded_fused_equals_single_fused():
    """Per-lane equality: the sharded fused engine (8 virtual devices,
    block offset folded per device) reproduces the single-device fused
    engine exactly for the same total envs, seed and block size —
    results are invariant to how the env axis is sharded."""
    from mpe_tpu.ops.fused_rollout import fused_rollout, sharded_fused_rollout

    for name in ("simple_spread", "simple_adversary"):
        single = fused_rollout(name, n_envs=1024, n_steps=6, horizon=4,
                               block_envs=128, interpret=True)
        sharded = sharded_fused_rollout(name, n_envs=1024, n_steps=6,
                                        horizon=4, block_envs=128,
                                        interpret=True)
        assert sharded.block_envs == single.block_envs == 128
        for lbl, a, b in zip(("pos", "vel", "rew", "ocs"),
                             single(5), sharded(5)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{name}:{lbl}")


def test_seed_block_stream_mixing_no_aliasing():
    """(seed, global block) -> mixed stream id is collision-free over a
    practical grid: the multiplicative mixing (7919, 104729 coprime)
    admits its first collision only at a seed delta of 104729."""
    seen = {}
    for s in range(256):
        for gb in range(256):
            mixed = (s * 7919 + gb * 104729) & 0xFFFFFFFF  # int32 wrap
            assert mixed not in seen, (s, gb, seen[mixed])
            seen[mixed] = (s, gb)


def test_generic_fused_trajectory_interpret():
    from mpe_tpu.ops.fused_trajectory import fused_trajectory

    for name, (a, ow, aw, rr) in {
        "simple_tag": (4, 16, 5, 4),
        "simple_reference": (2, 21, 15, 1),
        "simple_crypto": (3, 8, 9, 3),
    }.items():
        run = fused_trajectory(name, n_envs=256, n_steps=8, horizon=5,
                               block_envs=128, t_chunk=4, interpret=True)
        obs, act, rew, pos, vel = run(0)
        assert obs.shape == (8, a, ow, 256), name
        assert act.shape == (8, a, aw, 256), name
        assert rew.shape == (8, rr, 256), name
        assert np.isfinite(np.asarray(obs)).all(), name
        assert np.isfinite(np.asarray(rew)).all(), name


def test_generic_fused_policy_rollout_interpret():
    from mpe_tpu.learner import init_policy
    from mpe_tpu.ops.fused_policy import fused_policy_rollout
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario

    for name in ("simple_tag", "simple_speaker_listener"):
        k = kernel_scenario(name)
        dim_c = k.spec.dim_c if k.uses_comm else 0
        params = init_policy(jax.random.PRNGKey(0), k.obs_w, 5 + dim_c,
                             hidden=16)
        run = fused_policy_rollout(k, params, n_envs=256, n_steps=16,
                                   horizon=8, block_envs=128, interpret=True)
        ret, pos, eps = run(0, params)
        assert ret.shape == (k.reward_rows, 256), name
        assert np.isfinite(np.asarray(ret)).all(), name
        np.testing.assert_array_equal(
            np.asarray(eps), np.full((1, 256), 2.0, np.float32))


def test_fused_rollout_horizon_none_never_resets():
    """horizon=None reproduces the reference's never-terminating
    semantics in the fused engine (incl. the goal-scenario branch)."""
    from mpe_tpu.ops.fused_rollout import fused_rollout

    for name in ("simple_spread", "simple_adversary"):
        run = fused_rollout(name, n_envs=128, n_steps=12, horizon=None,
                            block_envs=128, interpret=True)
        pos, vel, rew, ocs = run(0)
        assert np.isfinite(np.asarray(pos)).all(), name
        assert np.isfinite(np.asarray(rew)).all(), name
    # with no resets, positions drift beyond the reset box under random
    # forces given enough steps — distinguishes from horizon=1
    run_long = fused_rollout("simple", n_envs=128, n_steps=200,
                             horizon=None, block_envs=128, interpret=True)
    pos, *_ = run_long(0)
    assert np.abs(np.asarray(pos)[0]).max() > 1.2


def test_kernel_physics_exact_overlap_finite():
    """Two distinct colliders at the exact same position: the kernel pair
    math (rsqrt with a floor) must produce finite forces, matching the
    vmapped path's guard (the raw reference NaNs here, core.py:193)."""
    from mpe_tpu.ops.kernel_scenarios import generic_physics_block

    spec = scenarios.load("simple_spread").spec
    e = spec.n_entities
    pos = jnp.zeros((e, 2, 8), jnp.float64)           # everyone stacked
    vel = jnp.zeros((e, 2, 8), jnp.float64)
    move = jnp.zeros((3, 5, 8), jnp.float64)
    p2, v2 = generic_physics_block(spec, pos, vel, move)
    assert np.isfinite(np.asarray(p2)).all()
    assert np.isfinite(np.asarray(v2)).all()
    # overlapped pair: delta is zero so the collision force is exactly 0
    np.testing.assert_array_equal(np.asarray(v2[:3]), 0.0)


def test_es_learns_simple():
    """learner.es.build_es_step CONVERGES on ``simple``: 30 antithetic
    generations on the fused policy-eval kernel must improve the mean
    episode return decisively (measured: ~-12 -> ~-6; assert >=25%
    improvement of the last-5 mean over the first-5 mean)."""
    from mpe_tpu.learner import init_policy
    from mpe_tpu.learner.es import build_es_step
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario

    k = kernel_scenario("simple")
    params = init_policy(jax.random.PRNGKey(0), k.obs_w, 5, hidden=16)
    step = build_es_step(k, params, n_envs=64, n_steps=20, horizon=10,
                         pop=8, sigma=0.1, lr=0.1, interpret=True)
    scores = []
    for g in range(30):
        params, s = step(params, g)
        scores.append(float(s))
    assert all(np.isfinite(s) for s in scores)
    first = np.mean(scores[:5])
    last = np.mean(scores[-5:])
    assert last > first and abs(last) < 0.75 * abs(first), (first, last)


def test_kernel_physics_exact_overlap_finite_f32():
    """f32 regression: the rsqrt floor must be representable in the
    kernel dtype. The old 1e-60 literal underflows to 0.0 in f32, so
    exact overlap gave inv=rsqrt(0)=inf and f = inf*0 = NaN on the chip
    while the f64 test suite stayed green."""
    from mpe_tpu.ops.kernel_scenarios import generic_physics_block
    from mpe_tpu.ops.mxu_physics import mxu_physics_block

    for name, block in (("simple_spread", generic_physics_block),
                        ("simple_tag", mxu_physics_block)):
        spec = scenarios.load(name).spec
        e, a = spec.n_entities, spec.n_agents
        pos = jnp.zeros((e, 2, 8), jnp.float32)       # everyone stacked
        vel = jnp.zeros((e, 2, 8), jnp.float32)
        move = jnp.zeros((a, 5, 8), jnp.float32)
        p2, v2 = block(spec, pos, vel, move)
        assert np.isfinite(np.asarray(p2)).all(), name
        assert np.isfinite(np.asarray(v2)).all(), name
        # overlapped pairs: delta 0 -> exactly zero collision force
        np.testing.assert_array_equal(np.asarray(v2), 0.0)


def test_mxu_physics_preserves_nonmovable_rows():
    """mxu_physics_block is a drop-in for generic_physics_block even
    when a caller hands non-movable entities nonzero velocity: their
    pos/vel rows pass through untouched (per-row damp/dt/mass columns),
    exactly like the unrolled path."""
    from mpe_tpu.ops.kernel_scenarios import generic_physics_block
    from mpe_tpu.ops.mxu_physics import mxu_physics_block

    spec = scenarios.load("simple_tag").spec          # obstacles: 4 pairs+
    e, a = spec.n_entities, spec.n_agents
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (e, 2, 16), jnp.float64)
    vel = jax.random.normal(jax.random.fold_in(key, 1), (e, 2, 16),
                            jnp.float64) * 0.3        # incl. landmarks!
    move = jax.nn.one_hot(
        jax.random.randint(jax.random.fold_in(key, 2), (a, 16), 0, 5),
        5, dtype=jnp.float64, axis=1)
    pg, vg = generic_physics_block(spec, pos, vel, move)
    pm, vm = mxu_physics_block(spec, pos, vel, move)
    movable = np.asarray(spec.movable[:e])
    for i in range(e):
        if not movable[i]:
            np.testing.assert_array_equal(np.asarray(pm[i]),
                                          np.asarray(pos[i]))
            np.testing.assert_array_equal(np.asarray(vm[i]),
                                          np.asarray(vel[i]))
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pg),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(vg),
                               rtol=0, atol=1e-12)


def test_fused_rejects_noisy_and_scripted_specs():
    """Spec features the kernels do not implement must RAISE at build
    time (kernel_scenario is every fused builder's chokepoint), not be
    silently dropped; the same spec runs on the vmapped XLA engine
    (reference noise semantics: core.py:132-140, pinned by
    tests/test_noise_parity.py)."""
    import copy
    import dataclasses

    from mpe_tpu.ops.kernel_scenarios import kernel_scenario

    base = scenarios.load("simple_spread")
    noisy_spec = dataclasses.replace(
        base.spec, u_noise=np.asarray([0.3, 0.0, 0.3]),
        c_noise=np.asarray([0.0, 0.0, 0.0]))
    noisy = copy.copy(base)
    noisy.spec = noisy_spec
    with pytest.raises(NotImplementedError, match="u_noise"):
        kernel_scenario(noisy)

    # ...and the fused builders go through the same chokepoint
    from mpe_tpu.ops.fused_rollout import fused_rollout
    with pytest.raises(NotImplementedError, match="vmapped XLA"):
        fused_rollout(noisy, n_envs=16, n_steps=2, block_envs=16)

    # the vmapped engine accepts it (noise applied, finite dynamics)
    env = MpeEnv(noisy)
    st, obs = env.reset(jax.random.PRNGKey(0))
    act = jnp.zeros((env.n_agents, env.action_width), env.dtype)
    st2, obs2, rew, done, _ = env.step(st, act, jax.random.PRNGKey(1))
    assert bool(jnp.isfinite(obs2).all()) and bool(jnp.isfinite(rew).all())
    # noise actually perturbs the zero-action dynamics
    assert float(jnp.abs(st2.vel[0]).max()) > 0.0

    class _Scripted:
        spec = base.spec

        def scripted_action(self, state):
            return None

    with pytest.raises(NotImplementedError, match="scripted_action"):
        kernel_scenario(_Scripted())
