"""Minimal ``gym`` (and py3.12 ``imp``) stand-ins so the GENUINE reference
``environment.py`` / ``multi_discrete.py`` / ``make_env.py`` can be imported
and driven end-to-end in the parity suite.

The reference imports (grep-verified):
  - ``gym`` / ``gym.Env`` / ``gym.Space``      (environment.py:1, multi_discrete.py:9)
  - ``gym.spaces`` Box/Discrete/Tuple          (environment.py:2, :44-66)
  - ``gym.envs.registration.EnvSpec``          (environment.py:3 — imported, never used)
  - ``gym.spaces.prng``                        (multi_discrete.py:7 — only in .sample())
  - ``imp.load_source``                        (scenarios/__init__.py:1,7; removed in py3.12)

Nothing here re-implements reference behavior — these are inert containers
that let the genuine code run; all environment logic under test is the
reference's own.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np


def _imp_load_source(name: str, pathname: str):
    spec = importlib.util.spec_from_file_location(name or "_imp_anon", pathname)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def install() -> None:
    """Install stub ``gym`` + ``imp`` modules into sys.modules (idempotent)."""
    if "gym" in sys.modules and getattr(sys.modules["gym"], "__mpe_stub__", False):
        return
    assert "gym" not in sys.modules, "a real gym is present; stub not needed"

    gym = types.ModuleType("gym")
    gym.__mpe_stub__ = True

    class Space:
        pass

    class Env:
        metadata: dict = {}

        def close(self):
            pass

    class Discrete(Space):
        def __init__(self, n):
            self.n = int(n)

        def __repr__(self):
            return f"Discrete({self.n})"

    class Box(Space):
        def __init__(self, low, high, shape=None, dtype=np.float32):
            self.low, self.high = low, high
            self.shape = tuple(shape) if shape is not None else None
            self.dtype = dtype

        def __repr__(self):
            return f"Box{self.shape}"

    class Tuple(Space):
        def __init__(self, spaces_):
            self.spaces = tuple(spaces_)

    spaces_mod = types.ModuleType("gym.spaces")
    spaces_mod.Box, spaces_mod.Discrete, spaces_mod.Tuple = Box, Discrete, Tuple
    prng_mod = types.ModuleType("gym.spaces.prng")
    prng_mod.np_random = np.random
    spaces_mod.prng = prng_mod

    envs_mod = types.ModuleType("gym.envs")
    reg_mod = types.ModuleType("gym.envs.registration")

    class EnvSpec:
        def __init__(self, id, **kwargs):
            self.id = id

    reg_mod.EnvSpec = EnvSpec
    envs_mod.registration = reg_mod

    gym.Env, gym.Space, gym.spaces, gym.envs = Env, Space, spaces_mod, envs_mod

    sys.modules.update({
        "gym": gym,
        "gym.spaces": spaces_mod,
        "gym.spaces.prng": prng_mod,
        "gym.envs": envs_mod,
        "gym.envs.registration": reg_mod,
    })

    if "imp" not in sys.modules:
        imp_mod = types.ModuleType("imp")
        imp_mod.load_source = _imp_load_source
        sys.modules["imp"] = imp_mod
