from mpe_tpu.learner.ppo import build_ppo_step, init_ac, policy_value
from mpe_tpu.learner.pg import (
    init_policy,
    policy_logits,
    sample_actions,
    build_train_step,
)

__all__ = ["init_policy", "policy_logits", "sample_actions", "build_train_step",
           "build_ppo_step", "init_ac", "policy_value"]
