"""Learners (REINFORCE / PPO / MAPPO / MADDPG).

PPO-family learners and MADDPG need ``optax`` (the ``learn`` extra in
pyproject.toml). The package degrades gracefully without it: the pure-JAX
REINFORCE learner (pg.py) always imports, and the optax-backed symbols
raise a clear ImportError only when actually used.
"""

from mpe_tpu.learner.pg import (
    init_policy,
    policy_logits,
    sample_actions,
    build_train_step,
)
from mpe_tpu.learner.es import build_es_step

try:
    from mpe_tpu.learner.approx_others import (
        build_approx_runner, init_approx)
    from mpe_tpu.learner.ensemble import (
        build_ensemble_runner, init_ensemble)
    from mpe_tpu.learner.fused_loop import (
        build_fused_maddpg_runner, run_fused_maddpg)
    from mpe_tpu.learner.fused_ppo import (
        build_fused_mappo_step, build_fused_ppo_step)
    from mpe_tpu.learner.maddpg import (
        build_fused_collect, build_fused_maddpg_dp, build_fused_update,
        build_fused_update_chunk, build_maddpg, init_buffer, init_maddpg)
    from mpe_tpu.learner.ppo import (
        actor_logits, build_mappo_step, build_ppo_step, central_value,
        init_ac, init_mappo, policy_value)
    HAS_OPTAX = True
except ModuleNotFoundError as _e:  # pragma: no cover - optax is in the image
    if _e.name != "optax":
        raise
    HAS_OPTAX = False
    _msg = ("mpe_tpu.learner.{name} requires optax; install the 'learn' "
            "extra: pip install mpe-tpu[learn]")

    def _missing(name):
        def _raiser(*a, **k):
            raise ImportError(_msg.format(name=name))
        _raiser.__name__ = name
        return _raiser

    for _n in ("build_maddpg", "build_fused_collect", "build_fused_update",
               "build_fused_update_chunk", "build_fused_maddpg_dp",
               "build_fused_maddpg_runner", "run_fused_maddpg",
               "build_ensemble_runner", "init_ensemble",
               "build_approx_runner", "init_approx",
               "init_buffer",
               "init_maddpg", "actor_logits",
               "build_mappo_step", "build_ppo_step", "central_value",
               "init_ac", "init_mappo", "policy_value",
               "build_fused_ppo_step", "build_fused_mappo_step"):
        globals()[_n] = _missing(_n)
    del _n

__all__ = ["init_policy", "policy_logits", "sample_actions", "build_train_step",
           "build_es_step",
           "build_ppo_step", "init_ac", "policy_value",
           "build_mappo_step", "init_mappo", "actor_logits", "central_value",
           "build_maddpg", "build_fused_collect", "build_fused_update",
           "build_fused_update_chunk", "build_fused_maddpg_dp",
           "build_fused_maddpg_runner", "run_fused_maddpg",
           "build_ensemble_runner", "init_ensemble",
           "build_approx_runner", "init_approx",
           "init_maddpg", "init_buffer",
           "build_fused_ppo_step", "build_fused_mappo_step", "HAS_OPTAX"]
