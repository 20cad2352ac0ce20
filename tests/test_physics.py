"""Unit tests for the physics core semantics (reference core.py:117-196)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpe_tpu.core.physics import collision_forces, step_world
from mpe_tpu.core.state import make_spec


def _spec(**kw):
    base = dict(
        n_agents=2, n_landmarks=1, agent_collide=True, agent_silent=True,
        agent_size=0.15, landmark_collide=False, dim_c=0,
    )
    base.update(kw)
    return make_spec("unit", **base)


def _state(spec, pos, vel=None, dtype=jnp.float64):
    s = spec.zeros_state(dtype)
    s = s.replace(pos=jnp.asarray(pos, dtype))
    if vel is not None:
        s = s.replace(vel=jnp.asarray(vel, dtype))
    return s


def test_damping_before_force_order():
    # v' = v*(1-damping) + F/m*dt ; x' = x + v'*dt (core.py:158-169)
    spec = _spec(agent_collide=False)
    st = _state(spec, [[0.0, 0.0], [1.0, 1.0], [5.0, 5.0]],
                [[1.0, 0.0], [0.0, 2.0], [0.0, 0.0]])
    u = jnp.asarray([[2.0, 0.0], [0.0, 0.0]], jnp.float64)
    nxt = step_world(spec, st, u, jnp.zeros((2, 0), jnp.float64))
    v0 = 1.0 * 0.75 + 2.0 * 0.1
    np.testing.assert_allclose(np.asarray(nxt.vel[0]), [v0, 0.0])
    np.testing.assert_allclose(np.asarray(nxt.vel[1]), [0.0, 1.5])
    np.testing.assert_allclose(np.asarray(nxt.pos[0]), [v0 * 0.1, 0.0])
    # landmark is frozen
    np.testing.assert_allclose(np.asarray(nxt.pos[2]), [5.0, 5.0])


def test_speed_clamp():
    spec = _spec(agent_collide=False, agent_max_speed=1.0)
    st = _state(spec, np.zeros((3, 2)), [[4.0, 3.0], [0.0, 0.0], [0.0, 0.0]])
    nxt = step_world(spec, st, jnp.zeros((2, 2)), jnp.zeros((2, 0)))
    speed = float(jnp.linalg.norm(nxt.vel[0]))
    np.testing.assert_allclose(speed, 1.0, rtol=1e-12)
    # direction preserved
    np.testing.assert_allclose(np.asarray(nxt.vel[0]), [0.8, 0.6], rtol=1e-12)


def test_collision_force_value():
    # two colliding agents, exact logaddexp soft-core value (core.py:180-196)
    spec = _spec()
    d = 0.2  # dist_min = 0.3 => penetrating
    st = _state(spec, [[0.0, 0.0], [d, 0.0], [9.0, 9.0]])
    f = np.asarray(collision_forces(spec, st.pos))
    k = spec.contact_margin
    pen = np.logaddexp(0, -(d - 0.3) / k) * k
    expected = 100.0 * (-d) / d * pen
    np.testing.assert_allclose(f[0], [expected, 0.0], rtol=1e-12)
    np.testing.assert_allclose(f[1], [-expected, 0.0], rtol=1e-12)
    np.testing.assert_allclose(f[2], [0.0, 0.0], atol=1e-300)


def test_collision_immovable_entity_pushes_but_stays():
    # agent vs colliding immovable landmark (e.g. simple_tag obstacles):
    # the agent receives force, the landmark does not move.
    spec = _spec(landmark_collide=True, landmark_size=0.2)
    st = _state(spec, [[0.0, 0.0], [5.0, 5.0], [0.1, 0.0]])
    nxt = step_world(spec, st, jnp.zeros((2, 2)), jnp.zeros((2, 0)))
    assert float(nxt.vel[0, 0]) < 0  # pushed away (-x)
    np.testing.assert_allclose(np.asarray(nxt.pos[2]), [0.1, 0.0])


def test_noncolliders_ignore_each_other():
    spec = _spec(agent_collide=False)
    st = _state(spec, [[0.0, 0.0], [0.01, 0.0], [9.0, 9.0]])
    f = np.asarray(collision_forces(spec, st.pos))
    np.testing.assert_array_equal(f, 0.0)


def test_exact_overlap_no_nan():
    # the reference divides by dist=0 -> NaN (core.py:193); we guard it.
    spec = _spec()
    st = _state(spec, [[0.5, 0.5], [0.5, 0.5], [9.0, 9.0]])
    f = np.asarray(collision_forces(spec, st.pos))
    assert np.isfinite(f).all()


def test_action_noise_gated_and_applied():
    spec = _spec(agent_collide=False, agent_u_noise=[1.0, None])
    st = _state(spec, np.zeros((3, 2)))
    key = jax.random.PRNGKey(0)
    nxt = step_world(spec, st, jnp.zeros((2, 2)), jnp.zeros((2, 0)), key)
    assert np.abs(np.asarray(nxt.vel[0])).sum() > 0  # noisy agent moved
    np.testing.assert_array_equal(np.asarray(nxt.vel[1]), 0.0)  # gated off


def test_comm_noise_and_silence():
    spec = _spec(agent_collide=False, agent_silent=[False, True], dim_c=3,
                 agent_c_noise=[0.5, None])
    st = _state(spec, np.zeros((3, 2)))
    c = jnp.ones((2, 3), jnp.float64)
    nxt = step_world(spec, st, jnp.zeros((2, 2)), c, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(nxt.comm[0]), 1.0)  # noise added
    np.testing.assert_array_equal(np.asarray(nxt.comm[1]), 0.0)  # silent


def test_step_is_jit_vmap_consistent():
    spec = _spec()
    key = jax.random.PRNGKey(42)
    pos = jax.random.uniform(key, (8, 3, 2), jnp.float64, -1, 1)
    sts = [_state(spec, pos[i]) for i in range(8)]
    u = jax.random.uniform(key, (8, 2, 2), jnp.float64, -1, 1)
    c = jnp.zeros((8, 2, 0), jnp.float64)

    single = [step_world(spec, sts[i], u[i], c[i]) for i in range(8)]
    batched_state = jax.tree.map(lambda *xs: jnp.stack(xs), *sts)
    vstep = jax.jit(jax.vmap(lambda s, uu, cc: step_world(spec, s, uu, cc)))
    batched = vstep(batched_state, u, c)
    for i in range(8):
        np.testing.assert_allclose(
            np.asarray(batched.pos[i]), np.asarray(single[i].pos), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(batched.vel[i]), np.asarray(single[i].vel), rtol=1e-12)


def test_f32_drift_vs_f64_bounded():
    """Production runs use float32; quantify its divergence from the
    float64 oracle over a 100-step horizon (chaotic collision dynamics
    amplify rounding, so exact bounds matter: positions must stay within
    1e-3 of the f64 trajectory for a full episode in a colliding world)."""
    import jax
    from mpe_tpu import scenarios
    from mpe_tpu.envs.functional import MpeEnv

    scn = scenarios.load("simple_spread")
    env64 = MpeEnv(scn, dtype=jnp.float64)
    env32 = MpeEnv(scn, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    s64, _ = env64.reset(key)
    s32 = jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x, s64)
    acts64 = jax.random.uniform(jax.random.PRNGKey(1), (100, 3, 7),
                                jnp.float64)
    max_drift = 0.0
    for t in range(100):
        s64, *_ = env64.step(s64, acts64[t])
        s32, *_ = env32.step(s32, acts64[t].astype(jnp.float32))
        max_drift = max(max_drift, float(
            jnp.max(jnp.abs(s64.pos - s32.pos.astype(jnp.float64)))))
    assert max_drift < 1e-3, max_drift
