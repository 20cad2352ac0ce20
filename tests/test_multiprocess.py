"""True multi-PROCESS distributed smoke: two OS processes under
``jax.distributed.initialize`` (via ``parallel.mesh.init_multihost``),
gloo CPU collectives between them — the same entry point a multi-host
TPU pod uses (ICI/DCN instead of gloo), exercised end-to-end instead of
merely shipped. The in-process sharding tests (test_sharding.py) cover
the 8-virtual-device single-process mesh; this covers the process
boundary: cluster bring-up, cross-process ``pmean``, and per-host key
folding (``fold_host_key``).

The reference has no multi-process machinery of any kind
(SURVEY.md §2.4).
"""

import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_pmean_and_host_keys():
    port, n_local = _free_port(), 2
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), str(n_local)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    results = {}
    for out in outs:
        line = next(l for l in out.splitlines() if l.startswith("RESULT"))
        _, pid, pm, k0, k1 = line.split()
        results[int(pid)] = (float(pm), (k0, k1))
    assert set(results) == {0, 1}
    # cross-process pmean of contributions {1.0, 2.0} -> 1.5 on BOTH
    # processes (a single process would see only its own value)
    assert results[0][0] == results[1][0] == 1.5
    # fold_host_key must give distinct per-process streams
    assert results[0][1] != results[1][1]
