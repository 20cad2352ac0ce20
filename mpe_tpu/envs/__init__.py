from mpe_tpu.envs.functional import MpeEnv
from mpe_tpu.envs.wrappers import MultiAgentEnv, VecMultiAgentEnv, pack_actions
from mpe_tpu.envs import spaces
from mpe_tpu.envs.parallel_api import ParallelEnv, parallel_env
from mpe_tpu.envs.aec_api import AECEnv, aec_env

# legacy alias for reference users (environment.py:288 BatchMultiAgentEnv)
BatchMultiAgentEnv = VecMultiAgentEnv

__all__ = [
    "MpeEnv",
    "MultiAgentEnv",
    "VecMultiAgentEnv",
    "BatchMultiAgentEnv",
    "pack_actions",
    "spaces",
    "ParallelEnv",
    "parallel_env",
    "AECEnv",
    "aec_env",
]
