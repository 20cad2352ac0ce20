"""Functional + wrapper env API tests (step contract, horizon, auto-reset,
shared reward, vmap batching)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpe_tpu import make_env, scenarios
from mpe_tpu.envs.functional import MpeEnv
from mpe_tpu.envs.wrappers import VecMultiAgentEnv


def test_make_env_step_contract():
    env = make_env("simple_spread", seed=3)
    obs_n = env.reset()
    assert len(obs_n) == env.n == 3
    assert all(o.shape == (18,) for o in obs_n)
    acts = [np.eye(5)[1] for _ in range(3)]
    obs_n, rew_n, done_n, info_n = env.step(acts)
    assert len(rew_n) == 3 and len(done_n) == 3 and len(info_n["n"]) == 3
    # collaborative: every agent same reward (environment.py:99-102)
    assert rew_n[0] == rew_n[1] == rew_n[2]
    assert not any(done_n)


def test_benchmark_info_channel():
    env = make_env("simple_spread", benchmark=True, seed=0)
    env.reset()
    _, _, _, info_n = env.step([np.zeros(5)] * 3)
    assert set(info_n["n"][0]) == {"rew", "collisions", "min_dists",
                                   "occupied_landmarks"}


def test_info_attribution_is_declared_not_heuristic():
    """Info leaves split per-agent iff the scenario declares them in
    ``per_agent_info`` — a GLOBAL leaf whose leading dim happens to equal
    n_agents must reach every agent whole (a shape heuristic would
    silently split it)."""
    import jax.numpy as jnp
    from mpe_tpu.envs.wrappers import MultiAgentEnv

    base_cls = type(scenarios.load("simple_spread"))

    class SpreadWithGlobalLeaf(base_cls):
        # n_landmarks == n_agents == 3: the trap case for the heuristic
        def benchmark_data(self, state):
            info = super().benchmark_data(state)
            info["landmark_x"] = state.pos[self.spec.n_agents:, 0]  # [3]
            return info

    env = MultiAgentEnv(SpreadWithGlobalLeaf(), benchmark=True, seed=0)
    env.reset()
    _, _, _, info_n = env.step([np.zeros(5)] * 3)
    for i in range(3):
        # declared per-agent leaves: split to scalars
        assert np.asarray(info_n["n"][i]["rew"]).shape == ()
        assert np.asarray(info_n["n"][i]["collisions"]).shape == ()
        # undeclared [3] leaf: global, delivered whole to every agent
        assert info_n["n"][i]["landmark_x"].shape == (3,)
        np.testing.assert_array_equal(info_n["n"][i]["landmark_x"],
                                      info_n["n"][0]["landmark_x"])


def test_horizon_and_autoreset():
    scn = scenarios.load("simple")
    env = MpeEnv(scn, max_steps=5, auto_reset=True)
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    act = jnp.zeros((1, 5))
    for i in range(4):
        key, k = jax.random.split(key)
        state, obs, rew, done, _ = env.step(state, act, k)
        assert not bool(done[0])
        assert int(state.t) == i + 1
    key, k = jax.random.split(key)
    state, obs, rew, done, _ = env.step(state, act, k)
    assert bool(done[0])          # horizon reached
    assert int(state.t) == 0      # auto-reset back to fresh state
    assert float(jnp.abs(state.vel).sum()) == 0.0


def test_never_done_without_horizon():
    # reference never terminates (environment.py:132-135)
    env = MpeEnv(scenarios.load("simple"))
    state, _ = env.reset(jax.random.PRNGKey(0))
    for _ in range(3):
        state, _, _, done, _ = env.step(state, jnp.zeros((1, 5)))
        assert not bool(done.any())


def test_vec_env_lockstep_matches_single():
    scn = scenarios.load("simple_spread")
    env = MpeEnv(scn, dtype=jnp.float64)
    vec = VecMultiAgentEnv(env, n_envs=4, seed=9)
    obs = vec.reset()
    assert obs.shape == (4, 3, 18)
    states0 = vec.states
    acts = jax.random.uniform(jax.random.PRNGKey(1), (4, 3, 7), jnp.float64)
    obs_b, rew_b, done_b, _ = vec.step(acts)
    # compare env 2 against a single-env step from the same state
    s2 = jax.tree.map(lambda x: x[2], states0)
    _, obs_s, rew_s, done_s, _ = env.step(s2, acts[2])
    np.testing.assert_allclose(np.asarray(obs_b[2]), np.asarray(obs_s),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(rew_b[2]), np.asarray(rew_s),
                               rtol=1e-12)


def test_reset_ranges_and_determinism():
    scn = scenarios.load("simple_spread")
    s1 = scn.reset(jax.random.PRNGKey(5))
    s2 = scn.reset(jax.random.PRNGKey(5))
    s3 = scn.reset(jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))
    assert not np.array_equal(np.asarray(s1.pos), np.asarray(s3.pos))
    assert np.abs(np.asarray(s1.pos)).max() <= 1.0
    np.testing.assert_array_equal(np.asarray(s1.vel), 0.0)
    np.testing.assert_array_equal(np.asarray(s1.comm), 0.0)


def test_eval_shape_obs_probe():
    # space dims derived by probing the obs fn, the jax.eval_shape analogue
    # of environment.py:68
    for name in ("simple", "simple_spread"):
        scn = scenarios.load(name)
        shapes = scn.observation_shapes()
        assert shapes == tuple((d,) for d in scn.obs_dims)


def test_scripted_agent_hook():
    """The reference's action_callback path (core.py:79, 117-120): a
    scripted agent's action comes from the scenario, not the policy."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mpe_tpu import scenarios
    from mpe_tpu.envs.functional import MpeEnv
    from mpe_tpu.scenarios import _base as B

    class ScriptedSpread(type(scenarios.load("simple_spread"))):
        def scripted_action(self, state):
            # agent 0 always accelerates toward landmark 0
            spec = self.spec
            d = state.pos[spec.n_agents] - state.pos[0]
            u = jnp.zeros((spec.n_agents, spec.dim_p), state.dtype)
            u = u.at[0].set(5.0 * d / jnp.linalg.norm(d))
            mask = np.array([True, False, False])
            return mask, u, jnp.zeros((spec.n_agents, spec.dim_c), state.dtype)

    scripted = MpeEnv(ScriptedSpread())
    plain = MpeEnv(scenarios.load("simple_spread"))
    key = jax.random.PRNGKey(0)
    s1, _ = scripted.reset(key)
    s2, _ = plain.reset(key)
    acts = jnp.zeros((3, 7))
    for i in range(20):
        s1, *_ = scripted.step(s1, acts)
        s2, *_ = plain.step(s2, acts)
    lm = np.asarray(s1.pos[3])
    # scripted agent 0 chased landmark 0; in the plain env it never moved
    d_scripted = np.linalg.norm(np.asarray(s1.pos[0]) - lm)
    d_plain = np.linalg.norm(np.asarray(s2.pos[0]) - lm)
    assert d_scripted < d_plain - 0.1


def test_parallel_api_pettingzoo_style():
    """PettingZoo Parallel API adapter: dict-keyed obs/rewards,
    terminations/truncations split, agent naming conventions."""
    import jax
    import numpy as np
    from mpe_tpu.envs.parallel_api import parallel_env

    env = parallel_env("simple_tag", max_cycles=3, seed=1)
    assert env.possible_agents == [
        "adversary_0", "adversary_1", "adversary_2", "agent_0"]
    obs, infos = env.reset(seed=7)
    assert set(obs) == set(env.possible_agents)
    assert obs["adversary_0"].shape == (16,) and obs["agent_0"].shape == (14,)
    key = jax.random.PRNGKey(0)
    t = 0
    while env.agents:
        key, sub = jax.random.split(key)
        # the documented PettingZoo loop: native space samples (plain
        # ints for Discrete), converted by the adapter
        acts = {a: env.action_space(a).sample(jax.random.fold_in(sub, i))
                for i, a in enumerate(env.agents)}
        obs, rewards, terminations, truncations, infos = env.step(acts)
        t += 1
        assert not any(terminations.values())  # reference never terminates
    assert t == 3 and all(truncations.values())
    # one-hot format still accepted
    env.reset(seed=1)
    env.step({a: np.asarray(jax.nn.one_hot(1, 5))
              for a in env.possible_agents})
    assert np.isfinite(list(rewards.values())).all()

    # role-named scenarios
    env2 = parallel_env("simple_speaker_listener")
    assert env2.possible_agents == ["speaker_0", "listener_0"]
    env3 = parallel_env("simple_world_comm")
    assert env3.possible_agents[0] == "leadadversary_0"
    assert env3.possible_agents[-1] == "agent_1"

    # deterministic reset with the same seed
    o1, _ = env.reset(seed=3)
    o2, _ = env.reset(seed=3)
    for a in env.possible_agents:
        np.testing.assert_array_equal(o1[a], o2[a])


def test_aec_api_pettingzoo_style():
    """AEC (sequential) adapter: agent_iter/last/step cycle, buffered
    actions advancing the world once per full cycle."""
    import jax
    import numpy as np
    from mpe_tpu.envs.aec_api import aec_env

    env = aec_env("simple_spread", max_cycles=2, seed=0)
    env.reset(seed=5)
    key = jax.random.PRNGKey(0)
    seen = []
    for agent in env.agent_iter(max_iter=100):
        obs, reward, term, trunc, info = env.last()
        if term or trunc:
            env.step(None)
            continue
        assert obs.shape == (18,)
        key, sub = jax.random.split(key)
        env.step(int(jax.random.randint(sub, (), 0, 5)))
        seen.append(agent)
    # 3 agents x 2 cycles acted, then 3 removals after truncation
    assert seen == ["agent_0", "agent_1", "agent_2"] * 2
    assert env.agents == []
    assert all(env.truncations.values())
    assert np.isfinite(list(env.rewards.values())).all()


def test_continuous_mode_end_to_end():
    """CONTINUOUS action mode through the stateful wrapper: Box spaces
    for movement, Tuple(Box, Box) for movable+speaking agents
    (environment.py:47-66), reference ragged format accepted."""
    import numpy as np
    from mpe_tpu import make_env
    from mpe_tpu.core.actions import ActionMode
    from mpe_tpu.envs import spaces

    env = make_env("simple_reference", action_mode=ActionMode.CONTINUOUS,
                   seed=0)
    sp = env.action_space[0]
    assert isinstance(sp, spaces.Tuple)
    move_sp, comm_sp = sp.spaces
    assert isinstance(move_sp, spaces.Box) and move_sp.shape == (2,)
    assert isinstance(comm_sp, spaces.Box) and comm_sp.shape == (10,)

    env.reset()
    # reference format: concatenated [move(2), comm(10)] per agent
    acts = [np.concatenate([np.array([0.5, -0.5]), np.zeros(10)])
            for _ in range(2)]
    obs_n, rew_n, done_n, _ = env.step(acts)
    assert np.isfinite(rew_n).all()
    assert obs_n[0].shape == (21,)

    # continuous movement-only scenario -> plain Box
    env2 = make_env("simple_tag", action_mode=ActionMode.CONTINUOUS, seed=0)
    assert isinstance(env2.action_space[0], spaces.Box)
    env2.reset()
    obs_n, rew_n, _, _ = env2.step([np.array([1.0, 0.0])] * 4)
    assert np.isfinite(rew_n).all()


def test_discrete_index_mode_end_to_end():
    """discrete_action_input=True equivalent: integer actions through the
    wrapper, with the reference's own index convention
    (environment.py:161-167: 1=-x, 2=+x, 3=-y, 4=+y)."""
    import numpy as np
    from mpe_tpu import make_env
    from mpe_tpu.core.actions import ActionMode

    env = make_env("simple", action_mode=ActionMode.DISCRETE_INDEX, seed=0)
    assert env.discrete_action_input
    env.reset()
    x0 = float(np.asarray(env.state.pos[0, 0]))
    for _ in range(3):
        env.step([2])  # +x
    assert float(np.asarray(env.state.pos[0, 0])) > x0

    # comm index becomes one-hot (environment.py:185-187)
    env2 = make_env("simple_reference",
                    action_mode=ActionMode.DISCRETE_INDEX, seed=0)
    env2.reset()
    env2.step([[1, 4], [2, 7]])
    comm = np.asarray(env2.state.comm)
    assert comm[0, 4] == 1.0 and comm[0].sum() == 1.0
    assert comm[1, 7] == 1.0


def test_spaces_sample_and_contains():
    import jax
    import numpy as np
    from mpe_tpu.envs import spaces

    key = jax.random.PRNGKey(0)
    d = spaces.Discrete(5)
    s = d.sample(key)
    assert d.contains(s) and not d.contains(7)

    b = spaces.Box(-1.0, 1.0, (3,))
    x = b.sample(key)
    assert b.contains(np.asarray(x)) and not b.contains(np.full(3, 2.0))

    md = spaces.MultiDiscrete.of([(0, 4), (0, 9)])
    v = np.asarray(md.sample(key))
    assert v.shape == (2,) and md.contains(v)
    assert not md.contains(np.array([5, 0]))
    assert md.sizes == (5, 10)

    t = spaces.Tuple((d, b))
    sv = t.sample(key)
    assert t.contains(sv)


def test_noise_config_requires_key():
    """Envs with noise (or auto-reset) assert on a missing per-step key
    instead of silently skipping randomness."""
    import jax.numpy as jnp
    from mpe_tpu.core.state import make_spec
    from mpe_tpu.scenarios import _base as B
    from mpe_tpu.envs.functional import MpeEnv

    class Noisy(B.Scenario):
        def __init__(self):
            self.spec = make_spec("noisy", n_agents=1, n_landmarks=1,
                                  agent_u_noise=0.5, dim_c=0)
            self.obs_dims = (4,)

        def reset(self, key, dtype=jnp.float32):
            return B.uniform_reset(self.spec, key, dtype)

        def reward(self, state):
            return jnp.zeros((1,), state.dtype)

        def observation(self, state):
            rel = B.landmark_rel(self.spec, state).reshape(1, -1)
            return jnp.concatenate([state.vel[:1], rel], axis=-1)

    env = MpeEnv(Noisy())
    state, _ = env.reset(jax.random.PRNGKey(0))
    acts = jnp.zeros((1, 5))
    try:
        env.step(state, acts)   # no key
        assert False
    except AssertionError as e:
        assert "key" in str(e)
    # with a key: noise actually perturbs the trajectory
    s1, *_ = env.step(state, acts, jax.random.PRNGKey(1))
    s2, *_ = env.step(state, acts, jax.random.PRNGKey(2))
    assert (np.asarray(s1.pos[0]) != np.asarray(s2.pos[0])).any()


def _first_dies_scenario():
    """simple_spread variant whose agent 0 terminates after 2 steps —
    exercises the PettingZoo partial-termination contract."""
    import jax.numpy as jnp

    from mpe_tpu import scenarios as registry

    scn = registry.load("simple_spread")

    class FirstDies(type(scn)):
        def done(self, state):
            base = jnp.zeros((self.spec.n_agents,), bool)
            return base.at[0].set(state.t >= 2)

    out = FirstDies()
    return out


def test_parallel_api_partial_termination():
    """An agent whose done hook fires leaves env.agents after the step
    reporting termination; later steps neither require nor accept its
    action, and outputs are keyed by the live set."""
    from mpe_tpu.envs.parallel_api import ParallelEnv

    env = ParallelEnv(_first_dies_scenario(), max_cycles=10, seed=0)
    obs, _ = env.reset(seed=1)
    a0 = env.possible_agents[0]
    for t in range(1, 5):
        acts = {a: np.zeros(env.action_space(a).n) for a in env.agents}
        obs, rew, term, trunc, info = env.step(acts)
        if t < 2:
            assert a0 in env.agents and term[a0] is False
        elif t == 2:
            assert term[a0] is True and a0 in obs     # reported once
            assert a0 not in env.agents
        else:
            assert a0 not in obs and a0 not in term   # gone afterwards
            assert set(obs) == set(env.possible_agents[1:])
    assert len(env.agents) == 2


def test_aec_api_partial_termination():
    """The dead agent steps None once, then the cycle continues with the
    remaining agents in order — earlier agents are never asked twice in
    one cycle and episodes complete."""
    from mpe_tpu.envs.aec_api import aec_env

    env = aec_env(_first_dies_scenario(), max_cycles=6, seed=0)
    env.reset(seed=1)
    acted = []
    for agent in env.agent_iter(max_iter=40):
        _, _, term, trunc, _ = env.last()
        if term or trunc:
            env.step(None)
            continue
        acted.append(agent)
        env.step(np.zeros(env.action_space(agent).n))
    # every completed world step consumed exactly one action per live
    # agent: 3+3 for the first two cycles, 2 per cycle after agent_0 died
    assert not env.agents                       # episode fully drained
    from collections import Counter

    c = Counter(acted)
    a0 = env.possible_agents[0]
    assert c[a0] == 2                           # died after step 2
    others = [a for a in env.possible_agents if a != a0]
    assert all(c[a] == c[others[0]] for a in others)
    assert c[others[0]] > c[a0]                 # kept playing to max_cycles
