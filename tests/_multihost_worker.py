"""Subprocess worker for tests/test_multiprocess.py: one JAX *process*
of a 2-process CPU cluster exercising ``parallel.mesh.init_multihost``.

Run as:  python _multihost_worker.py <process_id> <port> <n_local_devices>

Prints one line ``RESULT <process_id> <pmean> <key0> <key1>`` where
pmean is the cross-host mean of per-process contributions (process i
contributes ``i + 1.0``) and key0/key1 are the first words of this
process's folded host key (must differ across processes).
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
