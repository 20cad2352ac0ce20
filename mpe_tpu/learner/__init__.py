from mpe_tpu.learner.maddpg import (
    build_maddpg, init_buffer, init_maddpg)
from mpe_tpu.learner.ppo import (
    actor_logits, build_mappo_step, build_ppo_step, central_value, init_ac,
    init_mappo, policy_value)
from mpe_tpu.learner.pg import (
    init_policy,
    policy_logits,
    sample_actions,
    build_train_step,
)

__all__ = ["init_policy", "policy_logits", "sample_actions", "build_train_step",
           "build_ppo_step", "init_ac", "policy_value",
           "build_mappo_step", "init_mappo", "actor_logits", "central_value",
           "build_maddpg", "init_maddpg", "init_buffer"]
