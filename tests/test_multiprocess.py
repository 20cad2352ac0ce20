"""True multi-PROCESS distributed smoke: two OS processes under
``jax.distributed.initialize`` (via ``parallel.mesh.init_multihost``),
gloo CPU collectives between them — the same entry point a multi-host
TPU pod uses (ICI/DCN instead of gloo), exercised end-to-end instead of
merely shipped. The in-process sharding tests (test_sharding.py) cover
the 8-virtual-device single-process mesh; this covers the process
boundary: cluster bring-up, cross-process ``pmean``, per-host key
folding (``fold_host_key``) — and an actual TRAINING collective: two
chunks of the data-parallel fused-MADDPG trainer run across the
2-process mesh (collection into process-local replay shards, gradients
``pmean``'d over gloo), with the resulting params asserted identical
across ranks and equal to a single-process 4-device run of the same
program.

The reference has no multi-process machinery of any kind
(SURVEY.md §2.4).
"""

import os
import socket
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _dp_train_inprocess():
    """The single-process twin of the worker's phase 2: same config,
    same seeds, a 4-device mesh inside THIS process (conftest's 8
    virtual CPU devices) -> {leaf_name: np.ndarray} params."""
    import jax

    from mpe_tpu import scenarios
    from mpe_tpu.envs.functional import MpeEnv
    from mpe_tpu.learner import build_fused_maddpg_dp
    from mpe_tpu.learner.maddpg import init_maddpg, maddpg_act_dim
    from mpe_tpu.parallel.mesh import env_mesh

    mesh = env_mesh(np.asarray(jax.devices()[:4]))
    scn = scenarios.load("simple_spread")
    env = MpeEnv(scn, max_steps=4, auto_reset=True)
    dp = build_fused_maddpg_dp(
        env, mesh, n_envs=2 * 4, horizon=4, updates_per_chunk=2,
        cap_chunks=2, batch=16, block_envs=2, t_chunk=2, hidden=8,
        interpret=True)
    md = init_maddpg(jax.random.PRNGKey(4), scn.obs_width,
                     maddpg_act_dim(env), env.n_agents, hidden=8)
    state = (md, jax.tree.map(lambda x: x, md), dp.init_opt(md),
             dp.init_buffer())
    for seed in (0, 1):
        state, _ = dp(state, seed)
    out = {}
    for net in ("actor", "critic"):
        for lyr, wb in state[0][net].items():
            for nm, leaf in wb.items():
                out[f"{net}.{lyr}.{nm}"] = np.asarray(leaf)
    return out


def test_two_process_pmean_host_keys_and_dp_training(tmp_path):
    port, n_local = _free_port(), 2
    env = dict(os.environ)
    params_out = str(tmp_path / "dp_params.npz")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), str(n_local),
             params_out],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    results, train = {}, {}
    for out in outs:
        line = next(l for l in out.splitlines() if l.startswith("RESULT"))
        _, pid, pm, k0, k1 = line.split()
        results[int(pid)] = (float(pm), (k0, k1))
        tline = next(l for l in out.splitlines()
                     if l.startswith("TRAINOK"))
        _, tpid, cl = tline.split()
        train[int(tpid)] = float(cl)
    assert set(results) == {0, 1}
    # cross-process pmean of contributions {1.0, 2.0} -> 1.5 on BOTH
    # processes (a single process would see only its own value)
    assert results[0][0] == results[1][0] == 1.5
    # fold_host_key must give distinct per-process streams
    assert results[0][1] != results[1][1]

    # ---- the DP training collective crossed the process boundary ----
    assert set(train) == {0, 1}
    assert np.isfinite(train[0]) and train[0] == train[1]
    rank0 = dict(np.load(f"{params_out}.0.npz"))
    rank1 = dict(np.load(f"{params_out}.1.npz"))
    assert rank0.keys() == rank1.keys() and len(rank0) == 12
    for k in rank0:
        # both ranks hold the SAME replicated post-training params
        np.testing.assert_array_equal(rank0[k], rank1[k], err_msg=k)
    # and they match the single-process 4-device run of the identical
    # program (reduction orders may differ across topologies -> atol)
    single = _dp_train_inprocess()
    for k in rank0:
        np.testing.assert_allclose(rank0[k], single[k], atol=1e-5,
                                   err_msg=k)
