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
