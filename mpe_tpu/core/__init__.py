from mpe_tpu.core.state import WorldState, ScenarioSpec
from mpe_tpu.core.physics import step_world
from mpe_tpu.core.actions import ActionMode, decode_actions

__all__ = ["WorldState", "ScenarioSpec", "step_world", "ActionMode", "decode_actions"]
