"""Subprocess worker for tests/test_multiprocess.py: one JAX *process*
of a 2-process CPU cluster exercising ``parallel.mesh.init_multihost``.

Run as:  python _multihost_worker.py <process_id> <port> <n_local_devices>
                                     [<params_out.npz>]

Prints one line ``RESULT <process_id> <pmean> <key0> <key1>`` where
pmean is the cross-host mean of per-process contributions (process i
contributes ``i + 1.0``) and key0/key1 are the first words of this
process's folded host key (must differ across processes).

With a 4th argument, additionally runs TWO chunks of the data-parallel
fused-MADDPG trainer (``learner.build_fused_maddpg_dp``) across the
process boundary — collection into a process-local replay shard,
gradients ``pmean``'d over gloo — and saves the resulting (replicated)
params to ``<params_out.npz>.<pid>`` for the test to compare across
ranks and against a single-process run.
"""

import os
import sys

pid, port, n_local = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
    + f" --xla_force_host_platform_device_count={n_local}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# match tests/conftest.py (the in-process twin this worker's training
# output is compared against runs under x64 weak-type promotion)
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from mpe_tpu.parallel.mesh import fold_host_key, init_multihost  # noqa: E402

mesh = init_multihost(coordinator_address=f"localhost:{port}",
                      num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert mesh.devices.size == 2 * n_local, mesh.devices

# every device on this process contributes (process_id + 1); the global
# pmean must see BOTH processes' values -> 1.5
local = jnp.full((n_local,), float(pid + 1), jnp.float32)
arr = jax.make_array_from_process_local_data(
    jax.NamedSharding(mesh, P("env")), np.asarray(local))


@jax.jit
def global_mean(x):
    return jax.shard_map(lambda v: jax.lax.pmean(v, "env"), mesh=mesh,
                         in_specs=P("env"), out_specs=P())(x)


pm = float(global_mean(arr)[0])
key = np.asarray(fold_host_key(jax.random.PRNGKey(0)))
print(f"RESULT {pid} {pm} {key[0]} {key[1]}", flush=True)


if len(sys.argv) > 4:
    # ---- phase 2: DP fused-MADDPG TRAINING across the process
    # boundary (same config as tests/test_multiprocess.py's in-process
    # twin; see dp_train_config there) ----
    from jax.sharding import NamedSharding

    from mpe_tpu import scenarios
    from mpe_tpu.envs.functional import MpeEnv
    from mpe_tpu.learner import build_fused_maddpg_dp
    from mpe_tpu.learner.maddpg import init_maddpg, maddpg_act_dim

    scn = scenarios.load("simple_spread")
    env = MpeEnv(scn, max_steps=4, auto_reset=True)
    n_dev = mesh.devices.size
    dp = build_fused_maddpg_dp(
        env, mesh, n_envs=2 * n_dev, horizon=4, updates_per_chunk=2,
        cap_chunks=2, batch=16, block_envs=2, t_chunk=2, hidden=8,
        interpret=True)
    # host (numpy) pytrees are valid replicated inputs on every process
    md = jax.tree.map(np.asarray, init_maddpg(
        jax.random.PRNGKey(4), scn.obs_width, maddpg_act_dim(env),
        env.n_agents, hidden=8))
    opt = jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x,
        dp.init_opt(md))
    # the replay ring is env-sharded: build it as a GLOBAL array from
    # per-process zero shards
    tmpl = dp.init_buffer()
    gshape = tmpl.data.shape
    local_rows = gshape[0] // jax.process_count()
    data = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("env")),
        np.zeros((local_rows, gshape[1]), np.float32), gshape)
    buf = tmpl._replace(data=data, ptr=np.int32(0), size=np.int32(0))

    state = (md, jax.tree.map(lambda x: x, md), opt, buf)
    for seed in (0, 1):
        state, metrics = dp(state, seed)
    cl = float(np.asarray(
        jax.device_get(metrics["critic_loss"])))
    assert np.isfinite(cl), cl
    out = {}
    for net in ("actor", "critic"):
        for lyr, wb in state[0][net].items():
            for nm, leaf in wb.items():
                out[f"{net}.{lyr}.{nm}"] = np.asarray(jax.device_get(
                    leaf.addressable_shards[0].data))
    np.savez(f"{sys.argv[4]}.{pid}.npz", **out)
    print(f"TRAINOK {pid} {cl}", flush=True)
