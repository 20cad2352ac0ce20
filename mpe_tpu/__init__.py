"""mpe_tpu — a TPU-native multi-agent particle-environment engine.

A from-scratch JAX/XLA re-design of the capability surface of
openai/multiagent-particle-envs (reference: /root/reference): the 2-D
point-mass physics world, the nine scenarios, discrete/multi-discrete/
continuous action decoding, per-agent observation/reward assembly, a
gym-style wrapper, rendering, and an interactive keyboard policy —
re-expressed as pure-functional struct-of-arrays state stepped under
``jit``, ``vmap``-ed over thousands of env instances, and sharded over a
``jax.sharding.Mesh`` for multi-chip scale-out.

Reference layer map (see SURVEY.md §1):
  - physics core       -> mpe_tpu.core        (state.py, physics.py, actions.py)
  - scenario layer     -> mpe_tpu.scenarios   (9 scenarios + registry)
  - env API layer      -> mpe_tpu.envs        (functional core + gym-style wrapper)
  - rendering layer    -> mpe_tpu.render      (headless numpy rasterizer)
  - entry/tooling      -> mpe_tpu.make_env, mpe_tpu.interactive, bin/
  - (new) parallelism  -> mpe_tpu.parallel    (mesh/sharding; absent in reference)
"""

__version__ = "0.1.0"

from mpe_tpu.core.state import WorldState, ScenarioSpec
from mpe_tpu.core.actions import ActionMode
from mpe_tpu.envs.functional import MpeEnv
from mpe_tpu.factory import make_env

__all__ = [
    "WorldState",
    "ScenarioSpec",
    "ActionMode",
    "MpeEnv",
    "make_env",
    "__version__",
]
