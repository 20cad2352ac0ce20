from mpe_tpu.parallel.mesh import (
    env_mesh,
    env_sharding,
    build_rollout,
    sharded_rollout,
    fold_host_key,
    init_multihost,
)

__all__ = [
    "env_mesh",
    "env_sharding",
    "build_rollout",
    "sharded_rollout",
    "fold_host_key",
    "init_multihost",
]
