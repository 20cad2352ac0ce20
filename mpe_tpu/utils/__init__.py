"""Auxiliary subsystems (SURVEY.md §5): checkpoint/resume, profiling."""

from mpe_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from mpe_tpu.utils.profiling import step_phase, trace

__all__ = ["save_checkpoint", "load_checkpoint", "step_phase", "trace"]
