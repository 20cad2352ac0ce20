"""Scenario registry.

Replaces the reference's filename-keyed dynamic loader
(``imp.load_source`` over ./scenarios/*.py, reference
multiagent/scenarios/__init__.py:5-7) with an explicit registry. ``load``
accepts names with or without the legacy ``.py`` suffix for drop-in
ergonomics with reference callers (make_env.py:36, bin/interactive.py:17).
"""

from __future__ import annotations

import importlib

from mpe_tpu.scenarios._base import Scenario

# name -> (module, class); modules imported lazily
_REGISTRY: dict[str, tuple[str, str]] = {
    "simple": ("mpe_tpu.scenarios.simple", "SimpleScenario"),
    "simple_spread": ("mpe_tpu.scenarios.simple_spread", "SimpleSpreadScenario"),
    "simple_reference": ("mpe_tpu.scenarios.simple_reference", "SimpleReferenceScenario"),
    "simple_speaker_listener": (
        "mpe_tpu.scenarios.simple_speaker_listener", "SimpleSpeakerListenerScenario"),
    "simple_adversary": ("mpe_tpu.scenarios.simple_adversary", "SimpleAdversaryScenario"),
    "simple_push": ("mpe_tpu.scenarios.simple_push", "SimplePushScenario"),
    "simple_tag": ("mpe_tpu.scenarios.simple_tag", "SimpleTagScenario"),
    "simple_crypto": ("mpe_tpu.scenarios.simple_crypto", "SimpleCryptoScenario"),
    "simple_world_comm": ("mpe_tpu.scenarios.simple_world_comm", "SimpleWorldCommScenario"),
}


def names() -> list[str]:
    return sorted(_REGISTRY)


def load(name: str) -> Scenario:
    """Instantiate a scenario by name (``'simple_spread'`` or the legacy
    ``'simple_spread.py'``)."""
    key = name[:-3] if name.endswith(".py") else name
    if key not in _REGISTRY:
        raise KeyError(f"unknown scenario {name!r}; available: {names()}")
    module, cls = _REGISTRY[key]
    return getattr(importlib.import_module(module), cls)()


__all__ = ["Scenario", "load", "names"]
