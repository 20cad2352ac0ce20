"""Named env registry — working replacement for the reference's gym
registration (reference multiagent/__init__.py:9-21 registers
``MultiagentSimple-v0`` / ``MultiagentSimpleSpeakerListener-v0`` pointing
at a ``multiagent.envs`` module that does not exist — broken entry
points; documented divergence: here the same ids actually construct
envs, with the registration's ``max_episode_steps=100`` applied as the
env horizon).

    env = mpe_tpu.registry.make("MultiagentSimpleSpeakerListener-v0")
    env = mpe_tpu.registry.make("simple_tag-v0", seed=7)
"""

from __future__ import annotations

from mpe_tpu import scenarios as _scenarios
from mpe_tpu.envs.wrappers import MultiAgentEnv

_REGISTRY: dict[str, dict] = {}


def register(env_id: str, scenario: str, max_episode_steps: int | None = 100,
             **defaults) -> None:
    if env_id in _REGISTRY:
        raise ValueError(f"{env_id!r} already registered")
    _REGISTRY[env_id] = dict(scenario=scenario,
                             max_steps=max_episode_steps, **defaults)


def make(env_id: str, **overrides) -> MultiAgentEnv:
    if env_id not in _REGISTRY:
        raise KeyError(
            f"unknown env id {env_id!r}; registered: {sorted(_REGISTRY)}")
    cfg = dict(_REGISTRY[env_id])
    scenario = cfg.pop("scenario")
    cfg.update(overrides)
    return MultiAgentEnv(_scenarios.load(scenario), **cfg)


def ids() -> list[str]:
    return sorted(_REGISTRY)


# the reference's two ids (multiagent/__init__.py:9-21), now functional
register("MultiagentSimple-v0", "simple")
register("MultiagentSimpleSpeakerListener-v0", "simple_speaker_listener")
# one id per scenario
for _name in _scenarios.names():
    register(f"{_name}-v0", _name)
