"""Tracing / profiling hooks.

The reference has zero profiling (SURVEY.md §5 — its only diagnostics are
the render-mode comm transcript print, environment.py:201-213). Here:

  - ``step_phase(name)``: ``jax.named_scope`` wrapper used around the
    step phases (decode / physics / obs / reward / reset) so XLA traces
    and ``jax.profiler`` timelines show semantically-named regions;
  - ``trace(dir)``: context manager around ``jax.profiler.trace`` for
    capturing a TensorBoard-loadable device trace of a rollout.
"""

from __future__ import annotations

import contextlib

import jax


def step_phase(name: str):
    """Named scope for one phase of the env step (shows up in profiles)."""
    return jax.named_scope(f"mpe/{name}")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/mpe-trace'): run()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
