"""Gym-free action/observation space descriptors.

The reference depends on gym spaces plus a vendored old-gym
``MultiDiscrete`` (reference multiagent/multi_discrete.py:9-44,
environment.py:38-70). This module provides the same four space kinds with
no gym dependency, with JAX-key-based sampling (the reference samples via
the long-removed ``gym.spaces.prng`` global RNG).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


class Space:
    def sample(self, key: jax.Array):
        raise NotImplementedError

    def contains(self, x) -> bool:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Discrete(Space):
    """{0, ..., n-1} (gym.spaces.Discrete equivalent)."""

    n: int

    def sample(self, key):
        return jax.random.randint(key, (), 0, self.n, jnp.int32)

    def contains(self, x):
        x = int(np.asarray(x))
        return 0 <= x < self.n

    def __repr__(self):
        return f"Discrete({self.n})"


@dataclasses.dataclass(frozen=True)
class Box(Space):
    """Bounded continuous box (gym.spaces.Box equivalent)."""

    low: float
    high: float
    shape: tuple[int, ...]
    dtype: np.dtype = np.float32

    def sample(self, key):
        return jax.random.uniform(key, self.shape, self.dtype, self.low, self.high)

    def contains(self, x):
        x = np.asarray(x)
        return x.shape == self.shape and bool(
            (x >= self.low).all() and (x <= self.high).all()
        )

    def __repr__(self):
        return f"Box({self.low}, {self.high}, {self.shape})"


@dataclasses.dataclass(frozen=True)
class MultiDiscrete(Space):
    """Series of discrete sub-spaces given as (min, max) inclusive ranges —
    the vendored old-gym space (multi_discrete.py:9-44). Like the
    reference, a sample is a vector with one integer per sub-space; the
    env additionally accepts the concatenated one-hot format that
    ``_set_action`` splits by sub-space size (environment.py:148-155)."""

    low: tuple[int, ...]
    high: tuple[int, ...]

    @classmethod
    def of(cls, ranges):
        return cls(tuple(int(r[0]) for r in ranges), tuple(int(r[1]) for r in ranges))

    @property
    def num_discrete_space(self) -> int:
        return len(self.low)

    @property
    def sizes(self) -> tuple[int, ...]:
        """Per-sub-space one-hot segment widths (high - low + 1)."""
        return tuple(h - l + 1 for l, h in zip(self.low, self.high))

    def sample(self, key):
        lo = jnp.asarray(self.low)
        hi = jnp.asarray(self.high)
        return jax.random.randint(key, (len(self.low),), lo, hi + 1, jnp.int32)

    def contains(self, x):
        x = np.asarray(x)
        return (
            x.shape == (len(self.low),)
            and bool((x >= np.asarray(self.low)).all())
            and bool((x <= np.asarray(self.high)).all())
        )

    def __repr__(self):
        return f"MultiDiscrete{self.num_discrete_space}"


@dataclasses.dataclass(frozen=True)
class Tuple(Space):
    """Product of sub-spaces (gym.spaces.Tuple equivalent;
    environment.py:63)."""

    spaces: tuple[Space, ...]

    def sample(self, key):
        keys = jax.random.split(key, len(self.spaces))
        return tuple(s.sample(k) for s, k in zip(self.spaces, keys))

    def contains(self, x):
        return len(x) == len(self.spaces) and all(
            s.contains(v) for s, v in zip(self.spaces, x)
        )
