"""TPU kernel ops: env-minor batched step primitives + Pallas fused
rollout kernels (the hot path of SURVEY.md §2.4's "optional Pallas kernel
for the fused pairwise-force + observation-gather step")."""

from mpe_tpu.ops.batched import batched_spread_step
from mpe_tpu.ops.fused_rollout import (
    fused_rollout, fused_spread_rollout, sharded_fused_rollout,
    spread_step_block)
from mpe_tpu.ops.kernel_scenarios import kernel_scenario
from mpe_tpu.ops.fused_trajectory import (
    fused_spread_trajectory, fused_trajectory)
from mpe_tpu.ops.fused_policy import (
    fused_policy_rollout, fused_policy_trajectory)

__all__ = [
    "batched_spread_step",
    "fused_rollout",
    "sharded_fused_rollout",
    "fused_spread_rollout",
    "kernel_scenario",
    "fused_spread_trajectory",
    "fused_trajectory",
    "fused_policy_rollout",
    "fused_policy_trajectory",
    "spread_step_block",
]
